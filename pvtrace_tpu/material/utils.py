"""Host-side optics utilities: Fresnel trio, lineshapes, phase samplers.

Parity: reference ``pvtrace/material/utils.py``. These numpy versions
serve the Python oracle tracer and scene construction; the device tracer
uses the vectorised jnp equivalents inlined in the device tracer which
implement the same distributions.
"""
import numpy as np

from pvtrace_tpu.geometry.utils import close_to_zero, flip

# -- Fresnel -----------------------------------------------------------


def fresnel_reflectivity(angle, n1, n2):
    """Unpolarised Fresnel reflectivity; returns 1.0 beyond the TIR angle."""
    if n2 < n1 and angle > np.arcsin(n2 / n1):
        return 1.0
    c = np.cos(angle)
    s = np.sin(angle)
    k = np.sqrt(1 - (n1 / n2 * s) ** 2)
    rs = ((n1 * c - n2 * k) / (n1 * c + n2 * k)) ** 2
    rp = ((n1 * k - n2 * c) / (n1 * k + n2 * c)) ** 2
    return 0.5 * (rs + rp)


def specular_reflection(direction, normal):
    """Mirror `direction` about `normal` (normal auto-flipped along ray)."""
    direction = np.asarray(direction, dtype=float)
    normal = np.asarray(normal, dtype=float)
    if np.dot(normal, direction) < 0.0:
        normal = flip(normal)
    return direction - 2 * np.dot(normal, direction) * normal


def fresnel_refraction(direction, normal, n1, n2):
    """Snell refraction. `normal` should point along the ray direction."""
    vector = np.asarray(direction, dtype=float)
    normal = np.asarray(normal, dtype=float)
    n = n1 / n2
    dot = np.dot(vector, normal)
    c = np.sqrt(1 - n ** 2 * (1 - dot ** 2))
    sign = 1.0 if dot >= 0.0 else -1.0
    return n * vector + sign * (c - sign * n * dot) * normal


# -- Lineshapes --------------------------------------------------------


def gaussian(x, c1, c2, c3):
    return c1 * np.exp(-(((c2 - x) / c3) ** 2))


def bandgap(x, cutoff, alpha):
    return (1 - np.heaviside(x - cutoff, 0.5)) * alpha


def simple_convert_spectum(spec):
    """Convert a wavelength-axis spectrum to an energy axis (eV)."""
    h = 6.62607015e-34  # J s
    c = 299792458.0  # m s-1
    q = 1.60217662e-19  # C
    conversion_constant = h * c / q * 1e9
    _spec = np.array(spec, dtype=float)
    _spec[:, 0] = conversion_constant / spec[:, 0]
    return _spec


def thermodynamic_emission(abs_spec, T=300, mu=0.5):
    """Emission predicted from absorption by the generalised Planck law."""
    h = 6.62607015e-34  # J s
    c = 299792458.0  # m s-1
    q = 1.60217662e-19  # C
    kb = 1.38064852e-23  # J K-1
    energy_spec = simple_convert_spectum(abs_spec)
    x, y = energy_spec[:, 0], energy_spec[:, 1]
    ems = (
        y * 2 * x ** 2 / (c ** 2 * (h / q) ** 3) / np.expm1((x - mu) / ((kb / q) * T))
    )
    ems /= np.max(ems)
    return simple_convert_spectum(np.column_stack((x, ems)))


# -- Coordinates -------------------------------------------------------


def spherical_to_cart(theta, phi, r=1):
    x = r * np.sin(theta) * np.cos(phi)
    y = r * np.sin(theta) * np.sin(phi)
    z = r * np.cos(theta)
    cart = np.column_stack((x, y, z))
    if cart.size == 3:
        return cart[0, :]
    return cart


# -- Direction samplers ------------------------------------------------


def isotropic():
    """Uniform direction on the unit sphere."""
    g1, g2 = np.random.uniform(0, 1, 2)
    phi = 2 * np.pi * g1
    mu = 2 * g2 - 1
    return spherical_to_cart(np.arccos(mu), phi)


def henyey_greenstein(g=0.0):
    """Henyey-Greenstein phase function (isotropic in the g -> 0 limit)."""
    if close_to_zero(g):
        return isotropic()
    p = np.random.uniform(0, 1)
    s = 2 * p - 1
    mu = 1 / (2 * g) * (1 + g ** 2 - ((1 - g ** 2) / (1 + g * s)) ** 2)
    phi = 2 * np.pi * np.random.uniform()
    return spherical_to_cart(np.arccos(mu), phi)


class HenyeyGreenstein(object):
    """Callable Henyey-Greenstein sampler recognised by the compiler."""

    def __init__(self, g: float):
        self.g = float(g)

    def __call__(self):
        return henyey_greenstein(self.g)


def cone(theta_max: float):
    """Uniform directions within a cone of half-angle `theta_max` about +z."""
    if np.isclose(theta_max, 0.0) or theta_max > np.pi / 2:
        raise ValueError("Expected 0 < theta_max <= pi/2")
    p1, p2 = np.random.uniform(0, 1, 2)
    theta = np.arcsin(np.sqrt(p1) * np.sin(theta_max))
    phi = 2 * np.pi * p2
    return spherical_to_cart(theta, phi)


class Cone(object):
    """Callable cone sampler recognised by the compiler."""

    def __init__(self, theta_max: float):
        self.theta_max = float(theta_max)

    def __call__(self):
        return cone(self.theta_max)


def lambertian():
    """Lambertian directions about the +z axis (never negative z)."""
    p1, p2 = np.random.uniform(0, 1, 2)
    theta = np.arcsin(np.sqrt(p1))
    phi = 2 * np.pi * p2
    return spherical_to_cart(theta, phi)
