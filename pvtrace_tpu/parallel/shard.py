"""Multi-chip photon-batch sharding.

The reference parallelises with one OS process per CPU worker and a
per-worker reseed (``scene/scene.py:256-313``). The TPU-native design
shards the *photon axis* over every chip of a mesh with ``shard_map``:

* scene tables are tiny (<100 kB) and replicated to every device;
* each device traces its photon slice with the same wavefront kernel;
* recorder histograms / counters / moment sums are reduced with
  ``psum`` over ICI — the analogue of the reference's per-thread
  accumulator merge (``_kernel.pyx:1019-1032``);
* per-photon RNG keys are folded from the *global* photon index, so
  results are bitwise independent of the sharding layout — the same
  guarantee as the reference's seed-per-ray streams.

Multi-host: initialise ``jax.distributed`` and build the mesh over all
processes; `shard_trace` only uses collectives so it runs unchanged.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pvtrace_tpu.engine import tracer as tracer_module


def make_photon_mesh(devices=None, axis_name="photons"):
    """A 1D device mesh over the photon batch axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_trace(compiled, cfg, mesh, axis_name="photons"):
    """Build a jitted multi-chip trace function.

    Returns fn(tables, positions, directions, wavelengths, base_key) ->
    (tallies, steps) where tallies are already psum-reduced across the
    mesh. Event histories are not recorded on the sharded path (use
    single-device tracing for debugging histories).
    """
    if cfg.n_slots != 0:
        raise ValueError(
            "shard_trace requires record_every=0 (tallies only); "
            "use engine.simulate for histories."
        )
    n_dev = mesh.devices.size

    def per_shard(tables, pos, direction, wav, base_key):
        # Global photon index = shard offset + local index, so keys are
        # identical to the single-device run.
        shard = jax.lax.axis_index(axis_name)
        local_b = pos.shape[0]
        offset = (shard * local_b).astype(jnp.uint32)
        tallies, _log, _counts, steps = tracer_module.trace_bundle(
            compiled, cfg, tables, pos, direction, wav, base_key,
            index_offset=offset,
        )
        reduced = {
            "distinct": jax.lax.psum(tallies["distinct"], axis_name),
            "cross": jax.lax.psum(tallies["cross"], axis_name),
            "sums": jax.lax.psum(tallies["sums"], axis_name),
            "bins": jax.lax.psum(tallies["bins"], axis_name),
            "fates": jax.lax.psum(tallies["fates"], axis_name),
        }
        return reduced, jax.lax.pmax(steps, axis_name)

    fn = jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P()),
            out_specs=(P(), P()),
            # The tracer builds fresh (unvarying) carries inside the
            # shard; skip the varying-manual-axes analysis.
            check_vma=False,
        )
    )

    def traced(tables, positions, directions, wavelengths, base_key):
        B = positions.shape[0]
        if B % n_dev != 0:
            raise ValueError(
                f"Photon batch ({B}) must divide the mesh size ({n_dev})."
            )
        return fn(tables, positions, directions, wavelengths, base_key)

    return traced
