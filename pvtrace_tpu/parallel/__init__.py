from pvtrace_tpu.parallel.shard import (
    make_photon_mesh,
    shard_trace,
)

__all__ = ["make_photon_mesh", "shard_trace"]
