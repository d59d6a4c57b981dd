"""Vectorised optics (jnp): Fresnel trio + phase-function direction
sampling driven by pre-drawn uniforms.

Distribution parity with the reference (material/utils.py:8-45,104-186
and the native kernel _kernel.pyx:406-476); formulated on cosines so no
trig round-trips through acos/asin are needed in the hot loop.
"""
import jax.numpy as jnp

from pvtrace_tpu.ops.linalg import dot3


def fresnel_reflectivity(angle, n1, n2):
    """Unpolarised Fresnel reflectivity; 1.0 beyond the TIR angle.

    All args broadcast elementwise.
    """
    tir = (n2 < n1) & (angle > jnp.arcsin(jnp.clip(n2 / n1, 0.0, 1.0)))
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    under = 1.0 - (n1 / n2 * s) ** 2
    k = jnp.sqrt(jnp.clip(under, 0.0, None))
    rs = ((n1 * c - n2 * k) / (n1 * c + n2 * k)) ** 2
    rp = ((n1 * k - n2 * c) / (n1 * k + n2 * c)) ** 2
    r = 0.5 * (rs + rp)
    return jnp.where(tir, 1.0, jnp.clip(r, 0.0, 1.0))


def specular_reflect(direction, normal):
    """Mirror `direction` about `normal` (auto-flipped along the ray)."""
    flip = jnp.sign(dot3(normal, direction))
    flip = jnp.where(flip == 0.0, 1.0, flip)
    n = normal * flip[..., None]
    return direction - 2.0 * dot3(n, direction)[..., None] * n


def fresnel_refract(direction, normal_along, n1, n2):
    """Snell refraction. `normal_along` must point along the ray."""
    dd = dot3(direction, normal_along)
    ratio = n1 / n2
    c = jnp.sqrt(jnp.clip(1.0 - ratio ** 2 * (1.0 - dd ** 2), 0.0, None))
    sign = jnp.where(dd < 0.0, -1.0, 1.0)
    return (
        ratio[..., None] * direction
        + (sign * (c - sign * ratio * dd))[..., None] * normal_along
    )


def sphere_direction(theta, phi):
    """(theta, phi) spherical angles to cartesian unit vectors [..., 3]."""
    st = jnp.sin(theta)
    return jnp.stack(
        [st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )


def sample_isotropic(u1, u2):
    phi = 2.0 * jnp.pi * u1
    mu = 2.0 * u2 - 1.0
    return sphere_direction(jnp.arccos(mu), phi)


def sample_henyey_greenstein(g, u1, u2):
    """HG about the +z axis (kernel semantics: absolute frame, not
    relative to the incident direction — _kernel.pyx:455-462)."""
    s = 2.0 * u1 - 1.0
    safe_g = jnp.where(jnp.abs(g) < 1e-12, 1.0, g)
    mu = (1.0 + g * g - ((1.0 - g * g) / (1.0 + g * s)) ** 2) / (2.0 * safe_g)
    mu = jnp.clip(mu, -1.0, 1.0)
    phi = 2.0 * jnp.pi * u2
    hg = sphere_direction(jnp.arccos(mu), phi)
    iso = sample_isotropic(u2, u1)
    return jnp.where((jnp.abs(g) < 1e-12)[..., None], iso, hg)


def sample_cone(theta_max, u1, u2):
    theta = jnp.arcsin(jnp.sqrt(u1) * jnp.sin(theta_max))
    phi = 2.0 * jnp.pi * u2
    return sphere_direction(theta, phi)


def sample_lambertian(u1, u2):
    theta = jnp.arcsin(jnp.sqrt(u1))
    phi = 2.0 * jnp.pi * u2
    return sphere_direction(theta, phi)


def sample_phase(phase_type, phase_param, u1, u2, eps=1e-12):
    """Dispatch on phase tag: 0 isotropic, 1 HG, 2 cone.

    HG with |g| < eps degrades to isotropic, like the kernel.
    """
    iso = sample_isotropic(u1, u2)
    # HG branch consumes (u1 -> s, u2 -> phi) like the kernel
    s = 2.0 * u1 - 1.0
    g = phase_param
    safe_g = jnp.where(jnp.abs(g) < eps, 1.0, g)
    mu = (1.0 + g * g - ((1.0 - g * g) / (1.0 + g * s)) ** 2) / (2.0 * safe_g)
    hg = sphere_direction(jnp.arccos(jnp.clip(mu, -1.0, 1.0)), 2.0 * jnp.pi * u2)
    con = sample_cone(phase_param, u1, u2)
    use_hg = (phase_type == 1) & (jnp.abs(g) >= eps)
    use_cone = phase_type == 2
    return jnp.where(
        use_cone[..., None], con, jnp.where(use_hg[..., None], hg, iso)
    )


def orthonormal_basis(n):
    """Two unit vectors orthogonal to unit vector(s) `n` ([..., 3])."""
    # Pick the helper axis least aligned with n (branch-free Frisvad-style)
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack(
        [1.0 + sign * n[..., 0] ** 2 * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    t2 = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t1, t2


def rotate_from_z(vec, axis):
    """Rotate vectors sampled about +z so +z maps onto unit `axis`."""
    t1, t2 = orthonormal_basis(axis)
    return (
        vec[..., 0:1] * t1 + vec[..., 1:2] * t2 + vec[..., 2:3] * axis
    )
