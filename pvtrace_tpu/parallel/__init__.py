from pvtrace_tpu.parallel.shard import (
    make_photon_mesh,
    shard_trace,
    shard_trace_device_emit,
)

__all__ = ["make_photon_mesh", "shard_trace", "shard_trace_device_emit"]
