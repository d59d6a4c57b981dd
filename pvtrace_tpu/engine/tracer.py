"""The device wavefront tracer — the heart of the framework.

TPU-native re-design of the reference's per-ray native kernel
(``engine/_kernel.pyx:603-897``): instead of one ray per OpenMP thread,
the whole photon bundle is stepped in lockstep as structure-of-arrays
state inside a ``lax.while_loop``. Every branch of the per-ray event
loop becomes a masked ``where``; recorder tallies become masked
scatter-adds; per-ray xoshiro streams become per-photon
``jax.random.fold_in`` keys (bitwise reproducible regardless of batch
sharding — the same scheduling-independence guarantee as the
reference's seed-per-ray design, ``_kernel.pyx:71-96``).

Event semantics replicate ``photon_tracer.step_forward`` event-for-event:
container = unique-forward-hit node nearest the origin, EXIT on hitting
the root, exponential free path vs boundary distance, component roulette
proportional to attenuation, quantum-yield coin flip, emission-CDF
inverse sampling with kT/redshift truncation, Fresnel/null surface
branch, KILL on step/budget caps.

The loop terminates as soon as every photon in the bundle is dead, so
the common case costs ~(longest-lived photon) steps, not ``maxsteps``.
"""
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pvtrace_tpu.engine import compiler as comp
from pvtrace_tpu.ops.intersect import (
    intersect_box,
    intersect_cylinder,
    intersect_sphere,
    local_normal_box,
    local_normal_cylinder,
    local_normal_sphere,
)
from pvtrace_tpu.ops.linalg import dot3, transform_point, transform_vector
from pvtrace_tpu.ops.optics import (
    fresnel_reflectivity,
    fresnel_refract,
    rotate_from_z,
    sample_lambertian,
    sample_phase,
    specular_reflect,
)
from pvtrace_tpu.ops.spectra import uniform_lookup

# Matches the reference kernel's constants (_kernel.pyx:29-34)
ALPHA_ZERO = 1e-8
C_CM_PER_S = 2.99792458e10
KB_EV = 1.380649e-23 / 1.60217662e-19

# Event ids (light.event.Event values)
EV_GENERATE, EV_REFLECT, EV_TRANSMIT, EV_ABSORB = 0, 1, 2, 3
EV_NONRADIATIVE, EV_SCATTER, EV_EMIT, EV_EXIT, EV_REACT, EV_KILL = 4, 5, 6, 7, 8, 9

# Recorder selector ids (engine.recorder.EVENTS values)
REC_ENTERING, REC_ESCAPING, REC_REFLECTED = 0, 1, 2
REC_LOST, REC_REACTED, REC_KILLED, REC_EXIT = 3, 4, 5, 6
SEL_NONE = -1

OVR_MIRROR, OVR_ABSORB, OVR_LAMBERTIAN = 0, 1, 2


class TraceConfig(NamedTuple):
    """Static (hashable) compile-time configuration."""

    n_nodes: int
    root_id: int
    max_components: int
    max_overrides: int
    n_recorders: int
    hist_specs: tuple  # ((rec, prop_a, prop_b, na, nb, lo_a, hi_a, lo_b, hi_b, offset), ...)
    total_bins: int
    grid_x0: float
    grid_dx: float
    icdf_n: int
    eps: float
    maxsteps: int
    max_events: int
    n_slots: int       # number of recorded-history slots (0 = none)
    record_every: int
    emit_method: int
    dtype: type


def make_config(compiled, n_rays, dtype=np.float32, maxsteps=1000,
                max_events=128, record_every=1, emit_method="kT"):
    if record_every > 0:
        n_slots = (n_rays + record_every - 1) // record_every
    else:
        n_slots = 0
    return TraceConfig(
        n_nodes=len(compiled.nodes),
        root_id=compiled.root_id,
        max_components=compiled.max_components,
        max_overrides=compiled.max_overrides,
        n_recorders=compiled.n_recorders,
        hist_specs=tuple(tuple(h) for h in compiled.hist_specs),
        total_bins=compiled.total_bins,
        grid_x0=compiled.grid_x0,
        grid_dx=compiled.grid_dx,
        icdf_n=compiled.icdf_n,
        eps=compiled.resolved_eps(dtype),
        maxsteps=int(maxsteps),
        max_events=int(max_events),
        n_slots=n_slots,
        record_every=int(record_every),
        emit_method=comp.EMIT_METHODS[emit_method]
        if isinstance(emit_method, str)
        else int(emit_method),
        dtype=np.dtype(dtype).type,
    )


# ----------------------------------------------------------------------
# Event log


def _empty_log(cfg, B):
    """Loop-carried event-log arrays. Slot cfg.n_slots is a dump slot for
    unrecorded photons so every write is unconditional."""
    S = cfg.n_slots + 1
    E = cfg.max_events
    f = cfg.dtype
    return {
        "kind": jnp.full((S, E), -1, dtype=jnp.int32),
        "hit": jnp.full((S, E), -1, dtype=jnp.int32),
        "container": jnp.full((S, E), -1, dtype=jnp.int32),
        "adjacent": jnp.full((S, E), -1, dtype=jnp.int32),
        "component": jnp.full((S, E), -1, dtype=jnp.int32),
        "source": jnp.full((S, E), -1, dtype=jnp.int32),
        "position": jnp.zeros((S, E, 3), dtype=f),
        "direction": jnp.zeros((S, E, 3), dtype=f),
        "normal": jnp.zeros((S, E, 3), dtype=f),
        "wavelength": jnp.zeros((S, E), dtype=f),
        "travelled": jnp.zeros((S, E), dtype=f),
        "duration": jnp.zeros((S, E), dtype=f),
    }


def _record(log, nevents, slot, mask, cfg, *, kind, hit, container, adjacent,
            component, source, pos, direction, normal, wavelength, travelled,
            duration):
    """Masked append of one event per photon into the log.

    A no-op when history recording is disabled (record_every=0), so the
    benchmark path carries no event-log traffic at all.
    """
    if cfg.n_slots == 0:
        return log, nevents
    S = cfg.n_slots
    E = cfg.max_events
    write = mask & (slot < S) & (nevents < E)
    row = jnp.where(write, slot, S)
    col = jnp.clip(nevents, 0, E - 1)

    def put_scalar(name, values):
        cur = log[name][row, col]
        log[name] = log[name].at[row, col].set(jnp.where(write, values, cur))

    def put_vec(name, values):
        cur = log[name][row, col]
        log[name] = log[name].at[row, col].set(
            jnp.where(write[..., None], values, cur)
        )

    B = mask.shape[0]
    as_i = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.int32), (B,))
    as_f = lambda v: jnp.broadcast_to(jnp.asarray(v, cfg.dtype), (B,))
    put_scalar("kind", as_i(kind))
    put_scalar("hit", as_i(hit))
    put_scalar("container", as_i(container))
    put_scalar("adjacent", as_i(adjacent))
    put_scalar("component", as_i(component))
    put_scalar("source", as_i(source))
    put_vec("position", pos.astype(cfg.dtype))
    put_vec("direction", direction.astype(cfg.dtype))
    zero3 = jnp.zeros_like(pos)
    put_vec("normal", (normal if normal is not None else zero3).astype(cfg.dtype))
    put_scalar("wavelength", as_f(wavelength))
    put_scalar("travelled", as_f(travelled))
    put_scalar("duration", as_f(duration))
    return log, nevents + write.astype(jnp.int32)


# ----------------------------------------------------------------------
# Tallies


def _empty_tallies(cfg, B):
    R = max(cfg.n_recorders, 1)
    return {
        "distinct": jnp.zeros(R, dtype=jnp.int32),
        "cross": jnp.zeros(R, dtype=jnp.int32),
        "sums": jnp.zeros((R, 8), dtype=cfg.dtype),
        "bins": jnp.zeros(cfg.total_bins + 1, dtype=jnp.int32),
        "seen": jnp.zeros((B, R), dtype=bool),
    }


def _tally(tallies, tables, cfg, sel, tnode, have_normal, wnormal, lpos,
           angle, wavelength, travelled, duration):
    """Accumulate one (optional) interaction per photon into matching
    recorders (kernel ``tally``, _kernel.pyx:501-556): crossings on every
    match, moments/bins per distinct ray only."""
    if cfg.n_recorders == 0:
        return tallies
    seen = tallies["seen"]
    distinct, cross = tallies["distinct"], tallies["cross"]
    sums, bins = tallies["sums"], tallies["bins"]
    props = {
        0: wavelength, 1: angle, 2: duration, 3: travelled,
        4: lpos[:, 0], 5: lpos[:, 1], 6: lpos[:, 2],
    }
    for r in range(cfg.n_recorders):
        m = (tnode == tables["rec_node"][r]) & (sel == tables["rec_event"][r])
        has_facet = tables["rec_has_facet"][r] > 0
        facet_ok = have_normal & jnp.all(
            jnp.abs(tables["rec_facet"][r] - wnormal) <= tables["rec_atol"][r],
            axis=-1,
        )
        m = m & jnp.where(has_facet, facet_ok, True)
        cross = cross.at[r].add(jnp.sum(m, dtype=jnp.int32))
        new = m & ~seen[:, r]
        seen = seen.at[:, r].set(seen[:, r] | m)
        distinct = distinct.at[r].add(jnp.sum(new, dtype=jnp.int32))
        newf = new.astype(cfg.dtype)
        vals = jnp.stack(
            [
                wavelength, wavelength * wavelength,
                angle, angle * angle,
                duration, duration * duration,
                travelled, travelled * travelled,
            ],
            axis=-1,
        )
        sums = sums.at[r].add(jnp.sum(vals * newf[:, None], axis=0))
    for (r, prop_a, prop_b, na, nb, lo_a, hi_a, lo_b, hi_b, offset) in cfg.hist_specs:
        m = (tnode == tables["rec_node"][r]) & (sel == tables["rec_event"][r])
        has_facet = tables["rec_has_facet"][r] > 0
        facet_ok = have_normal & jnp.all(
            jnp.abs(tables["rec_facet"][r] - wnormal) <= tables["rec_atol"][r],
            axis=-1,
        )
        m = m & jnp.where(has_facet, facet_ok, True)
        new = m & ~tallies["seen"][:, r]  # pre-update seen: first match only
        va = props[prop_a]
        ia = jnp.floor((va - lo_a) / (hi_a - lo_a) * na).astype(jnp.int32)
        ok = new & (ia >= 0) & (ia < na)
        if prop_b < 0:
            flat = offset + ia
        else:
            vb = props[prop_b]
            ib = jnp.floor((vb - lo_b) / (hi_b - lo_b) * nb).astype(jnp.int32)
            ok = ok & (ib >= 0) & (ib < nb)
            flat = offset + ia * nb + ib
        idx = jnp.where(ok, flat, cfg.total_bins)
        bins = bins.at[idx].add(1)
    tallies = dict(tallies)
    tallies["seen"] = seen
    tallies["distinct"] = distinct
    tallies["cross"] = cross
    tallies["sums"] = sums
    tallies["bins"] = bins
    return tallies


# ----------------------------------------------------------------------
# Geometry helpers over all nodes


def _intersect_all(tables, cfg, pos, direction):
    """[B, N, 4] forward distances of every photon with every node."""
    w2l = tables["w2l"]  # [N, 4, 4]
    local_o = (
        jnp.einsum("nij,bj->bni", w2l[:, :3, :3], pos) + w2l[None, :, :3, 3]
    )
    local_d = jnp.einsum("nij,bj->bni", w2l[:, :3, :3], direction)
    params = tables["geom_params"]  # [N, 4]
    eps = cfg.eps
    t_box = intersect_box(params[None, :, :3], local_o, local_d, eps)
    t_sph = intersect_sphere(params[None, :, 0], local_o, local_d, eps)
    t_cyl = intersect_cylinder(
        params[None, :, 0], params[None, :, 1], local_o, local_d, eps
    )
    gt = tables["geom_type"][None, :, None]
    return jnp.where(
        gt == comp.GEOM_BOX,
        t_box,
        jnp.where(gt == comp.GEOM_SPHERE, t_sph, t_cyl),
    )


def _local_normal(tables, cfg, node, local_p):
    """Outward local-frame normal on `node`'s geometry at `local_p`."""
    params = tables["geom_params"][node]  # [B, 4]
    n_box = local_normal_box(params[:, :3], local_p)
    n_sph = local_normal_sphere(local_p)
    n_cyl = local_normal_cylinder(params[:, 0], local_p)
    gt = tables["geom_type"][node][:, None]
    return jnp.where(
        gt == comp.GEOM_BOX,
        n_box,
        jnp.where(gt == comp.GEOM_SPHERE, n_sph, n_cyl),
    )


# ----------------------------------------------------------------------
# The trace loop


def trace_bundle(tables, cfg: TraceConfig, positions, directions, wavelengths,
                 base_key, index_offset=0):
    """Trace a photon bundle to completion. All array args are device
    arrays; `cfg` is static. Returns (tallies, event_log, counts, steps).

    `index_offset` shifts the global photon index used for RNG key
    folding — sharded shards pass their global offset so results are
    bitwise independent of the sharding layout.
    """
    B = positions.shape[0]
    f = cfg.dtype
    pos = positions.astype(f)
    direction = directions.astype(f)
    wav = wavelengths.astype(f)

    photon_ids = jnp.asarray(index_offset, jnp.uint32) + jnp.arange(
        B, dtype=jnp.uint32
    )
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(photon_ids)

    if cfg.record_every > 0:
        slot = jnp.where(
            photon_ids % cfg.record_every == 0,
            (photon_ids // cfg.record_every).astype(jnp.int32),
            cfg.n_slots,
        )
    else:
        slot = jnp.full(B, cfg.n_slots, dtype=jnp.int32)

    log = _empty_log(cfg, B)
    nevents = jnp.zeros(B, dtype=jnp.int32)
    zero3 = jnp.zeros_like(pos)
    minus1 = jnp.full(B, -1, dtype=jnp.int32)
    log, nevents = _record(
        log, nevents, slot, jnp.ones(B, dtype=bool), cfg,
        kind=EV_GENERATE, hit=minus1, container=minus1, adjacent=minus1,
        component=minus1, source=minus1, pos=pos, direction=direction,
        normal=None, wavelength=wav, travelled=jnp.zeros(B, f),
        duration=jnp.zeros(B, f),
    )

    state = {
        "pos": pos,
        "dir": direction,
        "wav": wav,
        "trav": jnp.zeros(B, f),
        "dur": jnp.zeros(B, f),
        "source": jnp.full(B, -1, jnp.int32),
        "alive": jnp.ones(B, dtype=bool),
        "count": jnp.zeros(B, jnp.int32),
        "step": jnp.zeros((), jnp.int32),
        "keys": keys,
        "nevents": nevents,
        "slot": slot,
        "log": log,
        "tallies": _empty_tallies(cfg, B),
    }

    def cond(state):
        return jnp.any(state["alive"])

    def body(state):
        f32 = cfg.dtype
        pos = state["pos"]
        direction = state["dir"]
        wav = state["wav"]
        trav = state["trav"]
        dur = state["dur"]
        source = state["source"]
        alive = state["alive"]
        log = state["log"]
        nevents = state["nevents"]
        slot = state["slot"]
        tallies = state["tallies"]

        step = state["step"] + 1
        count = state["count"] + alive.astype(jnp.int32)

        # Per-photon, per-step uniforms (counter-based: independent of
        # scheduling and sharding).
        skeys = jax.vmap(lambda k: jax.random.fold_in(k, step))(state["keys"])
        u = jax.vmap(lambda k: jax.random.uniform(k, (8,), dtype=f32))(skeys)

        # --- event budget exhausted: kill recorded rays ----------------
        recorded = slot < cfg.n_slots
        budget_kill = alive & recorded & (nevents >= cfg.max_events - 1)
        log, nevents = _record(
            log, nevents, slot, budget_kill, cfg,
            kind=EV_KILL, hit=-1, container=-1, adjacent=-1, component=-1,
            source=source, pos=pos, direction=direction, normal=None,
            wavelength=wav, travelled=trav, duration=dur,
        )
        alive = alive & ~budget_kill

        # --- next hit over every node ---------------------------------
        t_all = _intersect_all(tables, cfg, pos, direction)  # [B, N, 4]
        finite = jnp.isfinite(t_all)
        node_hits = jnp.sum(finite, axis=-1)          # [B, N]
        node_min_t = jnp.min(t_all, axis=-1)          # [B, N]
        flat = t_all.reshape(B, -1)
        first_idx = jnp.argmin(flat, axis=-1)
        t0 = jnp.take_along_axis(flat, first_idx[:, None], axis=-1)[:, 0]
        hit = (first_idx // 4).astype(jnp.int32)
        nhits = jnp.sum(node_hits, axis=-1)
        no_hit = nhits == 0
        # second-nearest hit (for adjacent inference)
        cols = jnp.arange(flat.shape[1])[None, :]
        flat2 = jnp.where(cols == first_idx[:, None], jnp.inf, flat)
        second_idx = jnp.argmin(flat2, axis=-1)
        second_node = (second_idx // 4).astype(jnp.int32)

        # container: unique-forward-hit node nearest the origin
        cand = jnp.where(node_hits == 1, node_min_t, jnp.inf)
        cbest = jnp.min(cand, axis=-1)
        container = jnp.argmin(cand, axis=-1).astype(jnp.int32)
        container = jnp.where(jnp.isfinite(cbest), container, hit)
        adjacent = jnp.where(container == hit, second_node, hit)
        container = jnp.where(nhits == 1, hit, container)
        adjacent = jnp.where(nhits == 1, -1, adjacent)

        alive = alive & ~no_hit

        # --- maxsteps kill --------------------------------------------
        kill_max = alive & (count > cfg.maxsteps)
        log, nevents = _record(
            log, nevents, slot, kill_max, cfg,
            kind=EV_KILL, hit=-1, container=container, adjacent=-1,
            component=-1, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )
        alive = alive & ~kill_max

        n_cont = tables["nidx"][container]

        # --- exit through the root boundary ---------------------------
        exit_mask = alive & (hit == cfg.root_id)

        # --- volume absorption ----------------------------------------
        alpha = uniform_lookup(
            tables["node_alpha"], container, wav, cfg.grid_x0, cfg.grid_dx
        )
        depth = jnp.where(
            alpha > ALPHA_ZERO, -jnp.log1p(-u[:, 0]) / jnp.maximum(alpha, 1e-30),
            jnp.inf,
        )
        absorbed = alive & ~exit_mask & (depth < t0)

        advance = jnp.where(absorbed, depth, t0)
        moved = alive
        pos = jnp.where(moved[:, None], pos + direction * advance[:, None], pos)
        trav = jnp.where(moved, trav + advance, trav)
        dur = jnp.where(moved, dur + advance * n_cont / C_CM_PER_S, dur)

        # --- record EXIT ----------------------------------------------
        log, nevents = _record(
            log, nevents, slot, exit_mask, cfg,
            kind=EV_EXIT, hit=hit, container=container, adjacent=adjacent,
            component=-1, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )

        # --- component roulette ---------------------------------------
        target = u[:, 1] * alpha
        running = jnp.zeros(B, f32)
        chosen_k = jnp.zeros(B, jnp.int32)
        found = jnp.zeros(B, dtype=bool)
        for k in range(cfg.max_components):
            cidx = jnp.clip(tables["node_comp_idx"][container, k], 0, None)
            valid_k = k < tables["comp_count"][container]
            coef = uniform_lookup(
                tables["comp_coef"], cidx, wav, cfg.grid_x0, cfg.grid_dx
            )
            running = running + jnp.where(valid_k, coef, 0.0)
            take = valid_k & ~found & (target <= running)
            chosen_k = jnp.where(take, k, chosen_k)
            found = found | take
        last_k = jnp.maximum(tables["comp_count"][container] - 1, 0)
        chosen_k = jnp.where(found, chosen_k, last_k)
        comp_id = jnp.clip(tables["node_comp_idx"][container, chosen_k], 0, None)

        log, nevents = _record(
            log, nevents, slot, absorbed, cfg,
            kind=EV_ABSORB, hit=-1, container=container, adjacent=-1,
            component=comp_id, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )

        ctype = tables["comp_type"][comp_id]
        can_radiate = (ctype == comp.COMP_SCATTERER) | (
            ctype == comp.COMP_LUMINOPHORE
        )
        radiative = absorbed & can_radiate & (u[:, 2] < tables["comp_qy"][comp_id])

        # Radiative re-emission: new direction from the phase function
        # (world frame, kernel semantics), new wavelength for luminophores.
        new_dir = sample_phase(
            tables["comp_phase_type"][comp_id],
            tables["comp_phase_param"][comp_id],
            u[:, 3],
            u[:, 4],
        )
        is_lum = ctype == comp.COMP_LUMINOPHORE
        emitting = radiative & is_lum
        # kT / redshift truncation of the emission CDF
        if cfg.emit_method == comp.EMIT_FULL:
            p1 = jnp.zeros(B, f32)
        else:
            e_nm = wav
            if cfg.emit_method == comp.EMIT_KT:
                e_ev = 1240.0 / wav + 1.5 * KB_EV * 300.0
                e_nm = 1240.0 / e_ev
            p1 = uniform_lookup(
                tables["ems_cdf"], comp_id, e_nm, cfg.grid_x0, cfg.grid_dx
            )
        gamma = p1 + (1.0 - p1) * u[:, 5]
        icdf_dx = 1.0 / (cfg.icdf_n - 1)
        new_wav = uniform_lookup(tables["ems_icdf"], comp_id, gamma, 0.0, icdf_dx)
        tau_rad = tables["comp_tau_rad"][comp_id]
        rad_delay = jnp.where(tau_rad > 0.0, -jnp.log1p(-u[:, 6]) * tau_rad, 0.0)

        wav = jnp.where(emitting, new_wav, wav)
        dur = jnp.where(emitting, dur + rad_delay, dur)
        direction = jnp.where(radiative[:, None], new_dir, direction)
        source = jnp.where(radiative, comp_id, source)

        log, nevents = _record(
            log, nevents, slot, emitting, cfg,
            kind=EV_EMIT, hit=-1, container=container, adjacent=-1,
            component=comp_id, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )
        scattering = radiative & ~is_lum
        log, nevents = _record(
            log, nevents, slot, scattering, cfg,
            kind=EV_SCATTER, hit=-1, container=container, adjacent=-1,
            component=comp_id, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )

        # Non-radiative terminal events
        nonrad = absorbed & ~radiative
        tau_nr = tables["comp_tau_nr"][comp_id]
        nr_delay = jnp.where(tau_nr > 0.0, -jnp.log1p(-u[:, 6]) * tau_nr, 0.0)
        dur = jnp.where(nonrad, dur + nr_delay, dur)
        reacting = nonrad & (ctype == comp.COMP_REACTOR)
        losing = nonrad & ~reacting
        log, nevents = _record(
            log, nevents, slot, reacting, cfg,
            kind=EV_REACT, hit=-1, container=container, adjacent=-1,
            component=comp_id, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )
        log, nevents = _record(
            log, nevents, slot, losing, cfg,
            kind=EV_NONRADIATIVE, hit=-1, container=container, adjacent=-1,
            component=comp_id, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )

        # --- surface interaction --------------------------------------
        surf = alive & ~exit_mask & ~absorbed
        adj_bad = surf & (adjacent < 0)
        log, nevents = _record(
            log, nevents, slot, adj_bad, cfg,
            kind=EV_KILL, hit=hit, container=container, adjacent=-1,
            component=-1, source=source, pos=pos, direction=direction,
            normal=None, wavelength=wav, travelled=trav, duration=dur,
        )
        surf = surf & ~adj_bad

        # Surface normal machinery (also used for the EXIT tally)
        norm_mask = surf | exit_mask
        local_p = transform_point(tables["w2l"][hit], pos)
        nrm_local = _local_normal(tables, cfg, hit, local_p)
        nrm = transform_vector(tables["l2w"][hit], nrm_local)
        ddot_raw = dot3(nrm, direction)
        flip = jnp.where(ddot_raw < 0.0, -1.0, 1.0)
        nrm_along = nrm * flip[:, None]
        ddot = jnp.clip(jnp.abs(ddot_raw), 0.0, 1.0)
        angle = jnp.arccos(ddot)

        # Facet overrides (mirror / ideal cell / lambertian mirror)
        ovr_mode = jnp.full(B, comp.OVR_NONE, jnp.int32)
        for fct in range(cfg.max_overrides):
            mode_f = tables["ovr_mode"][hit, fct]
            match = (mode_f >= 0) & jnp.all(
                jnp.abs(tables["ovr_normal"][hit, fct] - nrm_local)
                <= tables["ovr_atol"][hit, fct][:, None],
                axis=-1,
            )
            ovr_mode = jnp.where((ovr_mode < 0) & match, mode_f, ovr_mode)

        n1 = tables["nidx"][container]
        n2 = tables["nidx"][jnp.clip(adjacent, 0, None)]
        r_fresnel = fresnel_reflectivity(angle, n1, n2)
        r = jnp.where(
            tables["surf_type"][hit] == comp.SURF_FRESNEL, r_fresnel, 0.0
        )
        r = jnp.where(
            (ovr_mode == OVR_MIRROR) | (ovr_mode == OVR_LAMBERTIAN), 1.0, r
        )
        r = jnp.where(ovr_mode == OVR_ABSORB, 0.0, r)

        reflecting = surf & (u[:, 7] < r)
        transmitting = surf & ~reflecting

        spec_dir = specular_reflect(direction, nrm)
        lamb = sample_lambertian(u[:, 3], u[:, 4])
        lamb_dir = rotate_from_z(lamb, -nrm_along)
        refl_dir = jnp.where((ovr_mode == OVR_LAMBERTIAN)[:, None], lamb_dir, spec_dir)

        refr_dir = fresnel_refract(direction, nrm_along, n1, n2)
        pass_through = (tables["surf_type"][hit] == comp.SURF_NULL) | (
            ovr_mode == OVR_ABSORB
        )
        trans_dir = jnp.where(pass_through[:, None], direction, refr_dir)

        direction = jnp.where(
            reflecting[:, None],
            refl_dir,
            jnp.where(transmitting[:, None], trans_dir, direction),
        )

        log, nevents = _record(
            log, nevents, slot, reflecting, cfg,
            kind=EV_REFLECT, hit=hit, container=container, adjacent=adjacent,
            component=-1, source=source, pos=pos, direction=direction,
            normal=nrm, wavelength=wav, travelled=trav, duration=dur,
        )
        log, nevents = _record(
            log, nevents, slot, transmitting, cfg,
            kind=EV_TRANSMIT, hit=hit, container=container, adjacent=adjacent,
            component=-1, source=source, pos=pos, direction=direction,
            normal=nrm, wavelength=wav, travelled=trav, duration=dur,
        )

        # --- merged recorder tally ------------------------------------
        if cfg.n_recorders > 0:
            sel = jnp.full(B, SEL_NONE, jnp.int32)
            tnode = jnp.full(B, -1, jnp.int32)
            have_n = jnp.zeros(B, dtype=bool)
            sel = jnp.where(kill_max, REC_KILLED, sel)
            tnode = jnp.where(kill_max, container, tnode)
            sel = jnp.where(exit_mask, REC_EXIT, sel)
            tnode = jnp.where(exit_mask, hit, tnode)
            have_n = have_n | exit_mask
            sel = jnp.where(reacting, REC_REACTED, sel)
            sel = jnp.where(losing, REC_LOST, sel)
            tnode = jnp.where(reacting | losing, container, tnode)
            refl_tally = reflecting & (container != hit)
            sel = jnp.where(refl_tally, REC_REFLECTED, sel)
            tnode = jnp.where(refl_tally, hit, tnode)
            have_n = have_n | refl_tally
            sel = jnp.where(
                transmitting,
                jnp.where(container == hit, REC_ESCAPING, REC_ENTERING),
                sel,
            )
            tnode = jnp.where(transmitting, hit, tnode)
            have_n = have_n | transmitting
            t_angle = jnp.where(exit_mask | reflecting | transmitting, angle, 0.0)
            lpos_t = transform_point(tables["w2l"][jnp.clip(tnode, 0, None)], pos)
            tallies = _tally(
                tallies, tables, cfg, sel, tnode, have_n, nrm, lpos_t,
                t_angle, wav, trav, dur,
            )

        # --- liveness --------------------------------------------------
        alive = alive & ~exit_mask & ~nonrad

        return {
            "pos": pos,
            "dir": direction,
            "wav": wav,
            "trav": trav,
            "dur": dur,
            "source": source,
            "alive": alive,
            "count": count,
            "step": step,
            "keys": state["keys"],
            "nevents": nevents,
            "slot": slot,
            "log": log,
            "tallies": tallies,
        }

    state = jax.lax.while_loop(cond, body, state)

    # Per-slot event counts ([n_slots], small) — device->host transfers
    # must stay tiny, so never return per-photon arrays.
    recorded = state["slot"] < cfg.n_slots
    counts = jnp.zeros(max(cfg.n_slots, 1), jnp.int32).at[
        jnp.where(recorded, state["slot"], 0)
    ].max(jnp.where(recorded, state["nevents"], 0))[: max(cfg.n_slots, 1)]
    return state["tallies"], state["log"], counts, state["step"]
