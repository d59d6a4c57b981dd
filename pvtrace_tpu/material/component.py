"""Volume physics components attachable to a Material.

Parity: reference ``pvtrace/material/component.py`` — class hierarchy
Component -> Scatterer -> (Absorber -> Reactor, Luminophore), quantum
yield from `quantum_yield` or (tau_rad, tau_nr), emission sampling with
kT / redshift / full truncation, exponential lifetime delays.
"""
from dataclasses import replace
from typing import Callable, Optional, Union

import numpy as np

from pvtrace_tpu.light.ray import Ray
from pvtrace_tpu.material.distribution import Distribution
from pvtrace_tpu.material.utils import gaussian, isotropic

q = 1.60217662e-19  # C
kB = 1.380649e-23 / q  # eV K-1


class Component(object):
    """Base class for things added to a host material."""

    def __init__(self, name: str = "Component"):
        super(Component, self).__init__()
        self.name = name

    def is_radiative(self, ray):
        return False

    def nonradiative_absorb(self, ray):
        return ray


class Scatterer(Component):
    """Scattering centre with attenuation coefficient per unit length."""

    def __init__(
        self,
        coefficient: Union[float, list, tuple, np.ndarray],
        x=None,
        quantum_yield: Optional[float] = 1.0,
        tau_rad: Optional[float] = None,
        tau_nr: Optional[float] = None,
        phase_function: Optional[Callable] = None,
        hist: bool = False,
        name: str = "Scatterer",
    ):
        """Parameters mirror the reference (component.py:52-139): a
        constant or spectral `coefficient`, quantum yield either directly
        or computed as tau_nr / (tau_nr + tau_rad), and an optional phase
        function (isotropic by default)."""
        super(Scatterer, self).__init__(name=name)

        self._coefficient = coefficient
        if coefficient is None:
            raise ValueError("Coefficient must be specified.")
        elif isinstance(coefficient, (float, int)):
            self._abs_dist = Distribution(x=None, y=float(coefficient), hist=hist)
        elif isinstance(coefficient, np.ndarray):
            self._abs_dist = Distribution(
                x=coefficient[:, 0], y=coefficient[:, 1], hist=hist
            )
        elif isinstance(coefficient, (list, tuple)):
            if x is None:
                raise ValueError("Requires `x`.")
            self._abs_dist = Distribution.from_functions(x, coefficient, hist=hist)
        else:
            raise ValueError("Unsupported coefficient type.")

        qy = np.nan
        if tau_rad is not None and tau_nr is not None:
            qy = tau_nr / (tau_nr + tau_rad)
        elif quantum_yield is not None:
            qy = quantum_yield
        if not np.isfinite(qy):
            raise ValueError(
                "Specify either `quantum yield` or both `tau_rad` and `tau_nr`"
            )

        self.quantum_yield = qy
        self.tau_rad = tau_rad
        self.tau_nr = tau_nr
        self.phase_function = (
            phase_function if phase_function is not None else isotropic
        )

    def coefficient(self, wavelength):
        """Scattering coefficient at `wavelength`."""
        return self._abs_dist(wavelength)

    def is_radiative(self, ray):
        """Monte Carlo test: is this event radiative?"""
        return np.random.uniform() < self.quantum_yield

    def nonradiative_absorb(self, ray: Ray) -> Ray:
        """Apply a non-radiative lifetime delay when tau_nr is set."""
        if self.tau_nr:
            delay = -np.log(1 - np.random.uniform()) * self.tau_nr
            return replace(ray, duration=ray.duration + delay)
        return ray

    def emit(self, ray: Ray, **kwargs) -> Ray:
        """Redirect the ray using the phase function."""
        direction = self.phase_function()
        return replace(ray, direction=tuple(direction), source=self.name)


class Absorber(Scatterer):
    """Attenuates by purely non-radiative absorption (quantum yield 0)."""

    def __init__(self, coefficient, x=None, tau_nr=None, name="Absorber", hist=False):
        super(Absorber, self).__init__(
            coefficient,
            x=x,
            quantum_yield=0.0,
            tau_nr=tau_nr,
            tau_rad=0.0,
            phase_function=None,
            hist=hist,
            name=name,
        )

    def is_radiative(self, ray):
        return False


class Reactor(Absorber):
    """Absorbed photons drive a photochemical reaction (REACT event)."""

    def __init__(self, coefficient, x=None, name="Reactor", hist=False):
        super(Reactor, self).__init__(coefficient, x=x, hist=hist, name=name)


class Luminophore(Scatterer):
    """Absorbs and re-emits light with a sampled emission spectrum."""

    def __init__(
        self,
        coefficient,
        emission=None,
        x=None,
        hist=False,
        quantum_yield=1.0,
        tau_rad=None,
        tau_nr=None,
        phase_function=None,
        name="Luminophore",
    ):
        super(Luminophore, self).__init__(
            coefficient,
            x=x,
            quantum_yield=quantum_yield,
            tau_rad=tau_rad,
            tau_nr=tau_nr,
            phase_function=phase_function,
            hist=hist,
            name=name,
        )

        self._emission = emission
        if emission is None:
            self._ems_dist = Distribution.from_functions(
                x, [lambda w: gaussian(w, 1.0, 600.0, 40.0)], hist=hist
            )
        elif isinstance(emission, np.ndarray):
            self._ems_dist = Distribution(
                x=emission[:, 0], y=emission[:, 1], hist=hist
            )
        elif isinstance(emission, (tuple, list)):
            if x is None:
                raise ValueError("Requires `x`.")
            self._ems_dist = Distribution.from_functions(x, emission, hist=hist)
        else:
            raise ValueError("Luminophore `emission` arg has wrong type.")

    def emit(self, ray: Ray, method="kT", T=300.0, **kwargs) -> Ray:
        """Sample a new direction and wavelength for the emitted ray.

        `method` is 'kT' (emitted energy may rise by 3/2 kT), 'redshift'
        (energy can only fall) or 'full' (sample whole spectrum) —
        reference component.py:381-440.
        """
        direction = self.phase_function()
        dist = self._ems_dist
        nm = ray.wavelength
        if method == "kT":
            eV = 1240.0 / nm + 3 / 2 * kB * T
            nm = 1240.0 / eV
            p1 = dist.lookup(np.clip(nm, *dist._x_range))
        elif method == "redshift":
            p1 = dist.lookup(np.clip(nm, *dist._x_range))
        elif method == "full":
            p1 = 0.0
        else:
            raise ValueError("emit_method must be one of 'kT', 'redshift', 'full'")
        gamma = np.random.uniform(p1, 1.0)
        wavelength = dist.sample(gamma)

        emission_delay = 0.0
        if self.tau_rad:
            emission_delay = -np.log(1 - np.random.uniform()) * self.tau_rad

        return replace(
            ray,
            direction=tuple(direction),
            wavelength=wavelength,
            source=self.name,
            duration=ray.duration + emission_delay,
        )
