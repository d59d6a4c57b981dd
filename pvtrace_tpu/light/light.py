"""Light sources: delegate callables for wavelength, position, direction.

Parity: reference ``pvtrace/light/light.py`` — the built-in mask helper
classes are recognised by the YAML parser and by the engine's vectorised
bundle emission.
"""
from typing import Iterator, Sequence

import numpy as np

from pvtrace_tpu.light.ray import Ray


def default_wavelength():
    return 555.0


def default_position():
    return (0.0, 0.0, 0.0)


def default_direction():
    return (0.0, 0.0, 1.0)


def rectangular_mask(X, Y):
    """Uniform positions over a rectangle (half-widths X, Y) in the xy-plane."""
    return (np.random.uniform(-X, X), np.random.uniform(-Y, Y), 0.0)


def circular_mask(radius: float) -> Sequence[float]:
    """Uniform positions inside a circle of `radius` in the xy-plane."""
    rads = np.random.uniform(0, 2.0 * np.pi)
    r = np.sqrt(np.random.uniform()) * radius
    return (r * np.cos(rads), r * np.sin(rads), 0.0)


def cube_mask(X, Y, Z):
    """Uniform positions inside a cube with half-widths (X, Y, Z)."""
    return (
        np.random.uniform(-X, X),
        np.random.uniform(-Y, Y),
        np.random.uniform(-Z, Z),
    )


class DefaultWavelength(object):
    """Generates 555 nm rays."""

    def __call__(self):
        return default_wavelength()


class DefaultPosition(object):
    """Generates rays from the node origin."""

    def __call__(self):
        return default_position()


class DefaultDirection(object):
    """Generates rays travelling along +z."""

    def __call__(self):
        return default_direction()


class ConstantWavelengthMask(object):
    """Constant wavelength delegate."""

    def __init__(self, nanometers):
        self.nanometers = float(nanometers)

    def __call__(self):
        return self.nanometers


class SpectrumWavelengthMask(object):
    """Wavelengths sampled from a spectral Distribution."""

    def __init__(self, distribution):
        self.distribution = distribution

    def __call__(self):
        return self.distribution.sample(np.random.uniform(0, 1))


class RectangularMask(object):
    """Uniform positions on a rectangle in the xy-plane."""

    def __init__(self, x, y):
        self.x = float(x)
        self.y = float(y)

    def __call__(self):
        return rectangular_mask(self.x, self.y)


class CircularMask(object):
    """Uniform positions inside a circle."""

    def __init__(self, radius):
        self.radius = radius

    def __call__(self):
        return circular_mask(self.radius)


class CubeMask(object):
    """Uniform positions inside a cube."""

    def __init__(self, x, y, z):
        self.x = x
        self.y = y
        self.z = z

    def __call__(self):
        return cube_mask(self.x, self.y, self.z)


class Light(object):
    """Light source driven by three delegate callables.

    Without delegates the source emits monochromatic 555 nm rays from the
    node origin along +z. See reference light/light.py:159-233.
    """

    def __init__(self, wavelength=None, position=None, direction=None, name="Light"):
        self.wavelength = wavelength if wavelength is not None else default_wavelength
        self.position = position if position is not None else default_position
        self.direction = direction if direction is not None else default_direction
        self.name = name

    def emit(self, num_rays=None) -> Iterator[Ray]:
        """Yield up to `num_rays` rays sampled from the delegates."""
        if num_rays is None or num_rays == 0:
            return
        count = 0
        while True:
            count += 1
            if num_rays is not None and count > num_rays:
                break
            yield Ray(
                wavelength=self.wavelength(),
                position=self.position(),
                direction=self.direction(),
                source=self.name,
            )
