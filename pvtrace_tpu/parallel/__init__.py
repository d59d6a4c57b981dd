from pvtrace_tpu.parallel.distributed import (
    global_photon_mesh,
    init_distributed,
    is_multiprocess,
    shutdown_distributed,
)
from pvtrace_tpu.parallel.shard import (
    make_photon_mesh,
    shard_simulate,
    shard_trace,
    shard_trace_device_emit,
)

__all__ = [
    "global_photon_mesh",
    "init_distributed",
    "is_multiprocess",
    "make_photon_mesh",
    "shard_simulate",
    "shard_trace",
    "shard_trace_device_emit",
    "shutdown_distributed",
]
