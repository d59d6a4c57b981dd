"""Surface interface physics via the delegate pattern.

Parity: reference ``pvtrace/material/surface.py`` — `SurfaceDelegate`
protocol, Fresnel and Null delegates, and the `Surface` Monte Carlo coin
flip. Custom delegates work with the Python oracle tracer; the device
compiler recognises the built-in delegates plus the facet-override
delegates in ``pvtrace_tpu.device.lsc``.
"""
import abc
from dataclasses import replace
from typing import Tuple

import numpy as np

from pvtrace_tpu.geometry.utils import angle_between, flip
from pvtrace_tpu.material.utils import (
    fresnel_reflectivity,
    fresnel_refraction,
    specular_reflection,
)


class SurfaceDelegate(abc.ABC):
    """Interface for custom surface interactions."""

    @abc.abstractmethod
    def reflectivity(self, surface, ray, geometry, container, adjacent) -> float:
        """Reflectivity for this interaction (0 to 1)."""

    @abc.abstractmethod
    def reflected_direction(
        self, surface, ray, geometry, container, adjacent
    ) -> Tuple[float, float, float]:
        """Reflected direction unit vector (ix, iy, iz)."""

    @abc.abstractmethod
    def transmitted_direction(
        self, surface, ray, geometry, container, adjacent
    ) -> Tuple[float, float, float]:
        """Transmitted direction unit vector (ix, iy, iz)."""


class NullSurfaceDelegate(SurfaceDelegate):
    """Transmits every ray unchanged. Useful for counting."""

    def reflectivity(self, surface, ray, geometry, container, adjacent):
        return 0.0

    def reflected_direction(self, surface, ray, geometry, container, adjacent):
        raise NotImplementedError("This surface delegate does not reflect.")

    def transmitted_direction(self, surface, ray, geometry, container, adjacent):
        return ray.direction


class FresnelSurfaceDelegate(SurfaceDelegate):
    """Fresnel reflection and Snell refraction."""

    def reflectivity(self, surface, ray, geometry, container, adjacent):
        n1 = container.geometry.material.refractive_index
        n2 = adjacent.geometry.material.refractive_index
        normal = geometry.normal(ray.position)
        # Tolerate either normal orientation convention
        if np.dot(normal, ray.direction) < 0.0:
            normal = flip(normal)
        angle = angle_between(normal, np.asarray(ray.direction))
        return float(fresnel_reflectivity(angle, n1, n2))

    def reflected_direction(self, surface, ray, geometry, container, adjacent):
        normal = geometry.normal(ray.position)
        return tuple(specular_reflection(ray.direction, normal).tolist())

    def transmitted_direction(self, surface, ray, geometry, container, adjacent):
        n1 = container.geometry.material.refractive_index
        n2 = adjacent.geometry.material.refractive_index
        normal = geometry.normal(ray.position)
        if np.dot(normal, ray.direction) < 0.0:
            normal = flip(normal)
        return tuple(fresnel_refraction(ray.direction, normal, n1, n2).tolist())


class BaseSurface(abc.ABC):
    @property
    @abc.abstractmethod
    def delegate(self):
        """An object implementing the `SurfaceDelegate` protocol."""

    @abc.abstractmethod
    def is_reflected(self, ray, geometry, container, adjacent):
        """True when the ray is reflected."""

    @abc.abstractmethod
    def reflect(self, ray, geometry, container, adjacent):
        """Ray reflected from the interface."""

    @abc.abstractmethod
    def transmit(self, ray, geometry, container, adjacent):
        """Ray transmitted through the interface."""


class Surface(BaseSurface):
    """Monte Carlo surface event sampler driven by a delegate.

    The default delegate performs Fresnel reflection and refraction.
    """

    def __init__(self, delegate=None):
        super(Surface, self).__init__()
        self._delegate = FresnelSurfaceDelegate() if delegate is None else delegate

    @property
    def delegate(self):
        return self._delegate

    def is_reflected(self, ray, geometry, container, adjacent):
        r = self.delegate.reflectivity(self, ray, geometry, container, adjacent)
        if not isinstance(r, (int, float)):
            raise ValueError("Reflectivity must be a number.")
        if r == 0.0:
            return False
        return np.random.uniform() < r

    def reflect(self, ray, geometry, container, adjacent):
        direction = self.delegate.reflected_direction(
            self, ray, geometry, container, adjacent
        )
        if not isinstance(direction, tuple) or len(direction) != 3:
            raise ValueError(
                "Delegate method `reflected_direction` should return a tuple "
                "of length 3."
            )
        return replace(ray, direction=direction)

    def transmit(self, ray, geometry, container, adjacent):
        direction = self.delegate.transmitted_direction(
            self, ray, geometry, container, adjacent
        )
        if not isinstance(direction, tuple) or len(direction) != 3:
            raise ValueError(
                "Delegate method `transmitted_direction` should return a tuple "
                "of length 3."
            )
        return replace(ray, direction=direction)
