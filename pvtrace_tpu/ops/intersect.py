"""Batched analytic ray-primitive intersection kernels (jnp).

Each kernel returns up to MAX_PRIM_HITS forward parametric distances per
ray with +inf marking empty slots. Semantics replicate the reference
native kernel (engine/_kernel.pyx:245-356): local-frame solves, strict
``t > eps`` forward filtering, barrel z strictly inside, cap radius
inclusive.

These run on the VPU as fused elementwise code; there is no
data-dependent control flow so XLA vectorises the whole batch.
"""
import jax.numpy as jnp

MAX_PRIM_HITS = 4

_BIG = jnp.inf


def _pack2(t1, v1, t2, v2):
    """Pack two candidate hits into a [..., 4] array (inf = invalid)."""
    a = jnp.where(v1, t1, _BIG)
    b = jnp.where(v2, t2, _BIG)
    pad = jnp.full_like(a, _BIG)
    return jnp.stack([a, b, pad, pad], axis=-1)


def intersect_box(size, o, d, eps):
    """Slab-method AABB intersection.

    size: [..., 3] full side lengths; o, d: [..., 3] local-frame ray.
    Returns [..., 4] forward distances.
    """
    half = 0.5 * size
    safe_d = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    inv = 1.0 / safe_d
    t1 = (-half - o) * inv
    t2 = (half - o) * inv
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    # Parallel-axis handling: if |d| tiny, the axis constrains to a miss
    # when the origin is outside the slab, otherwise it is inert.
    parallel = jnp.abs(d) < 1e-30
    outside = (o < -half) | (o > half)
    miss_parallel = jnp.any(parallel & outside, axis=-1)
    tmin_ax = jnp.where(parallel, -_BIG, tmin_ax)
    tmax_ax = jnp.where(parallel, _BIG, tmax_ax)
    tmin = jnp.max(tmin_ax, axis=-1)
    tmax = jnp.min(tmax_ax, axis=-1)
    ok = (tmax >= tmin) & ~miss_parallel
    return _pack2(tmin, ok & (tmin > eps), tmax, ok & (tmax > eps))


def intersect_sphere(radius, o, d, eps):
    """Quadratic ray-sphere intersection; centre at local origin."""
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(d * o, axis=-1)
    c = jnp.sum(o * o, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    return _pack2(t1, ok & (t1 > eps), t2, ok & (t2 > eps))


def intersect_cylinder(length, radius, o, d, eps):
    """Capped z-aligned cylinder; centre at local origin.

    Up to 4 candidates (2 barrel, 2 caps) before filtering.
    """
    half = 0.5 * length
    a = d[..., 0] ** 2 + d[..., 1] ** 2
    has_barrel = a > 1e-30
    safe_a = jnp.where(has_barrel, a, 1.0)
    b = 2.0 * (o[..., 0] * d[..., 0] + o[..., 1] * d[..., 1])
    c = o[..., 0] ** 2 + o[..., 1] ** 2 - radius * radius
    disc = b * b - 4.0 * a * c
    ok = has_barrel & (disc >= 0.0)
    sq = jnp.sqrt(jnp.where(disc >= 0.0, disc, 0.0))
    tb1 = (-b - sq) / (2.0 * safe_a)
    tb2 = (-b + sq) / (2.0 * safe_a)
    zb1 = o[..., 2] + tb1 * d[..., 2]
    zb2 = o[..., 2] + tb2 * d[..., 2]
    vb1 = ok & (zb1 > -half) & (zb1 < half) & (tb1 > eps)
    vb2 = ok & (zb2 > -half) & (zb2 < half) & (tb2 > eps)

    has_caps = jnp.abs(d[..., 2]) > 1e-30
    safe_dz = jnp.where(has_caps, d[..., 2], 1.0)
    tc1 = (-half - o[..., 2]) / safe_dz
    tc2 = (half - o[..., 2]) / safe_dz
    r1 = (o[..., 0] + tc1 * d[..., 0]) ** 2 + (o[..., 1] + tc1 * d[..., 1]) ** 2
    r2 = (o[..., 0] + tc2 * d[..., 0]) ** 2 + (o[..., 1] + tc2 * d[..., 1]) ** 2
    vc1 = has_caps & (r1 <= radius * radius) & (tc1 > eps)
    vc2 = has_caps & (r2 <= radius * radius) & (tc2 > eps)

    return jnp.stack(
        [
            jnp.where(vb1, tb1, _BIG),
            jnp.where(vb2, tb2, _BIG),
            jnp.where(vc1, tc1, _BIG),
            jnp.where(vc2, tc2, _BIG),
        ],
        axis=-1,
    )


def local_normal_box(size, p):
    """Outward normal at local surface point: nearest face wins
    (reference _kernel.pyx:365-379)."""
    half = 0.5 * size
    d_neg = jnp.abs(p + half)
    d_pos = jnp.abs(p - half)
    # Face order (-x, +x, -y, +y, -z, +z) with first-minimum tie-breaks,
    # matching the kernel's axis-major/sign-minor scan.
    dists = jnp.stack(
        [
            d_neg[..., 0], d_pos[..., 0],
            d_neg[..., 1], d_pos[..., 1],
            d_neg[..., 2], d_pos[..., 2],
        ],
        axis=-1,
    )
    idx = jnp.argmin(dists, axis=-1)
    axis = idx // 2
    sign = jnp.where(idx % 2 == 1, 1.0, -1.0)
    eye = jnp.eye(3, dtype=p.dtype)
    return eye[axis] * sign[..., None]


def local_normal_sphere(p):
    mag = jnp.linalg.norm(p, axis=-1, keepdims=True)
    return p / jnp.where(mag == 0.0, 1.0, mag)


def local_normal_cylinder(length, p):
    half = 0.5 * length
    # np.isclose default tolerances, like the reference kernel (:388)
    atol = 1e-8 + 1e-5 * jnp.abs(half)
    bottom = jnp.abs(p[..., 2] + half) <= atol
    top = jnp.abs(p[..., 2] - half) <= atol
    r = jnp.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2)
    safe_r = jnp.where(r == 0.0, 1.0, r)
    barrel = jnp.stack(
        [p[..., 0] / safe_r, p[..., 1] / safe_r, jnp.zeros_like(r)], axis=-1
    )
    z = jnp.zeros_like(r)
    up = jnp.stack([z, z, jnp.ones_like(r)], axis=-1)
    down = -up
    return jnp.where(
        bottom[..., None], down, jnp.where(top[..., None], up, barrel)
    )
