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

Multi-host: call ``parallel.init_distributed()`` on every host, build
the mesh with ``parallel.global_photon_mesh()`` and use these same
entry points — the compiled program is identical (collectives only);
the wrappers lift each process's host-local inputs to global arrays
and localise the replicated outputs. ``tests/test_multihost.py``
asserts 2-process tallies are bitwise equal to the single-process run.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pvtrace_tpu.engine import tracer as tracer_module
from pvtrace_tpu.parallel import distributed


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
        # Multi-process: each process passes ITS slice of the photon
        # batch; the global batch is the concatenation over processes.
        B = positions.shape[0] * jax.process_count()
        if B % n_dev != 0:
            raise ValueError(
                f"Photon batch ({B}) must divide the mesh size ({n_dev})."
            )
        args = distributed.globalize(
            mesh,
            (tables, positions, directions, wavelengths, base_key),
            (P(), P(axis_name), P(axis_name), P(axis_name), P()),
        )
        out = fn(*args)
        return distributed.localize(mesh, out, (P(), P()))

    return traced


def shard_trace_device_emit(compiled, cfg, mesh, lanes=None,
                            axis_name="photons"):
    """Multi-chip tracing with device-side emission and regeneration.

    Returns fn(tables, n_rays, base_key) -> (tallies, steps). The
    photon budget is split evenly over the mesh; each shard emits its
    photons on device from its own global-id range (no host bundle, no
    transfer) and, when ``lanes`` is set, refills dead lanes until its
    budget is spent. Keys fold the global photon index, so the union of
    shard results equals a single-device run over the same ids.

    `n_rays` is traced (one compile serves any budget); it must be a
    multiple of the mesh size, and each shard's share must exceed
    `lanes` for regeneration to engage.
    """
    if cfg.n_slots != 0:
        raise ValueError(
            "shard_trace_device_emit requires record_every=0 "
            "(tallies only)."
        )
    if not compiled.lights_supported:
        raise ValueError(
            "Scene lights are not supported for device-side emission."
        )
    n_dev = mesh.devices.size

    def per_shard(tables, n_per_shard, base_key):
        shard = jax.lax.axis_index(axis_name)
        n_local = n_per_shard[0]
        offset = shard.astype(jnp.uint32) * n_local.astype(jnp.uint32)
        tallies, _log, _counts, steps = tracer_module.trace_bundle_device_emit(
            compiled, cfg, tables, base_key, n_local,
            index_offset=offset, lanes=lanes,
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
            in_specs=(P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )

    def traced(tables, n_rays, base_key):
        # `n_rays` is the GLOBAL photon budget on every process.
        if int(n_rays) % n_dev != 0:
            raise ValueError(
                f"n_rays ({n_rays}) must divide the mesh size ({n_dev})."
            )
        n_per = np.full((1,), int(n_rays) // n_dev, np.uint32)
        args = distributed.globalize(
            mesh, (tables, n_per, base_key), (P(), P(), P())
        )
        out = fn(*args)
        return distributed.localize(mesh, out, (P(), P()))

    return traced
