"""Material: refractive index + surface + volume components.

Parity: reference ``pvtrace/material/material.py`` — Beer-Lambert
penetration-depth sampling and component roulette proportional to the
attenuation coefficient.
"""
from typing import Tuple

import numpy as np

from pvtrace_tpu.material.component import Component
from pvtrace_tpu.material.surface import Surface


class Material(object):
    def __init__(self, refractive_index: float, surface=None, components=None):
        self.refractive_index = refractive_index
        self.surface = Surface() if surface is None else surface
        self.components = [] if components is None else components

    def total_attenutation_coefficient(self, wavelength: float) -> float:
        """Sum of component attenuation coefficients at `wavelength`.

        (Spelling kept for API parity with the reference.)
        """
        coefs = [x.coefficient(wavelength) for x in self.components]
        return float(np.sum(coefs))

    def is_absorbed(self, ray, full_distance) -> Tuple[bool, float]:
        distance = self.penetration_depth(ray.wavelength)
        return (distance < full_distance, distance)

    def penetration_depth(self, wavelength: float) -> float:
        """Sample the Beer-Lambert penetration depth (cm), inf when
        transparent."""
        alpha = self.total_attenutation_coefficient(wavelength)
        if np.isclose(alpha, 0.0):
            return float("inf")
        if not np.isfinite(alpha):
            return 0.0
        return -np.log(1 - np.random.uniform()) / alpha

    def component(self, wavelength: float) -> Component:
        """Monte Carlo roulette: which component absorbs the ray."""
        coefs = np.array([x.coefficient(wavelength) for x in self.components])
        if np.any(coefs < 0.0):
            raise ValueError("Must be positive.")
        cdf = np.cumsum(coefs)
        target = np.random.uniform() * cdf[-1]
        index = int(np.searchsorted(cdf, target))
        index = min(index, len(self.components) - 1)
        return self.components[index]
