"""Optics and sampling unit tests.

Mirrors reference tests/test_frensel_reflection.py,
test_frensel_refraction.py and test_distibution.py.
"""
import numpy as np
import pytest

from pvtrace_tpu import Distribution
from pvtrace_tpu.material.utils import (
    cone,
    fresnel_reflectivity,
    fresnel_refraction,
    henyey_greenstein,
    isotropic,
    lambertian,
    specular_reflection,
)


class TestFresnel:
    def test_normal_incidence_glass(self):
        # R = ((n1-n2)/(n1+n2))^2 = 0.04 for 1.0 -> 1.5
        assert np.isclose(fresnel_reflectivity(0.0, 1.0, 1.5), 0.04)

    def test_tir(self):
        critical = np.arcsin(1.0 / 1.5)
        assert fresnel_reflectivity(critical + 0.01, 1.5, 1.0) == 1.0

    def test_brewster(self):
        brewster = np.arctan(1.5 / 1.0)
        # p-polarised reflectivity vanishes; average = Rs/2 > 0
        r = fresnel_reflectivity(brewster, 1.0, 1.5)
        assert 0.0 < r < 0.1

    def test_grazing(self):
        assert np.isclose(fresnel_reflectivity(np.pi / 2 - 1e-9, 1.0, 1.5), 1.0, atol=1e-4)

    def test_specular_reflection(self):
        d = np.array([0.0, 0.0, 1.0])
        n = np.array([0.0, 0.0, -1.0])  # normal flipped against ray: auto-flip
        out = specular_reflection(d, n)
        assert np.allclose(out, [0.0, 0.0, -1.0])

    def test_specular_reflection_45(self):
        d = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
        n = np.array([0.0, 0.0, 1.0])
        out = specular_reflection(d, n)
        assert np.allclose(out, np.array([1.0, 0.0, -1.0]) / np.sqrt(2))

    def test_refraction_straight_through(self):
        d = np.array([0.0, 0.0, 1.0])
        n = np.array([0.0, 0.0, 1.0])
        out = fresnel_refraction(d, n, 1.0, 1.5)
        assert np.allclose(out, [0.0, 0.0, 1.0])

    def test_refraction_snell(self):
        theta1 = np.radians(30.0)
        d = np.array([np.sin(theta1), 0.0, np.cos(theta1)])
        n = np.array([0.0, 0.0, 1.0])
        out = fresnel_refraction(d, n, 1.0, 1.5)
        theta2 = np.arcsin(out[0])
        assert np.isclose(np.sin(theta1), 1.5 * np.sin(theta2))
        assert np.isclose(np.linalg.norm(out), 1.0)


class TestDistribution:
    def test_constant(self):
        dist = Distribution(x=None, y=2.5)
        assert dist(555.0) == 2.5
        assert np.allclose(dist(np.array([400.0, 600.0])), [2.5, 2.5])

    def test_call_interpolates(self):
        x = np.linspace(0.0, 10.0, 11)
        dist = Distribution(x, x * 2.0)
        assert np.isclose(dist(2.5), 5.0)

    def test_call_raises_outside_range(self):
        x = np.linspace(0.0, 10.0, 11)
        dist = Distribution(x, np.ones_like(x))
        with pytest.raises(ValueError):
            dist(11.0)

    def test_lookup_sample_roundtrip(self):
        x = np.linspace(0, 200, 201)
        y = np.exp(-(((x - 50.0) / 20.0) ** 2))
        dist = Distribution(x, y)
        assert np.isclose(dist.lookup(0.0), 0.0)
        assert np.isclose(dist.lookup(200.0), 1.0)
        for p in (0.1, 0.5, 0.9):
            assert np.isclose(dist.lookup(dist.sample(p)), p, atol=1e-6)

    def test_sample_edges(self):
        x = np.linspace(0, 1, 10)
        dist = Distribution(x, np.ones_like(x))
        assert np.isclose(dist.sample(0.0), 0.0)
        assert np.isclose(dist.sample(1.0), 1.0)

    def test_histogram_mode_yields_grid_values(self):
        x = np.array([0.0, 1.0, 2.0, 3.0])
        y = np.array([1.0, 2.0, 1.0, 1.0])
        dist = Distribution(x, y, hist=True)
        np.random.seed(1)
        draws = np.asarray([dist.sample(np.random.uniform()) for _ in range(100)])
        assert set(np.unique(draws)).issubset(set(x.tolist()))

    def test_sampled_distribution_matches_pdf(self):
        x = np.linspace(0, 200, 201)
        y = np.exp(-(((x - 100.0) / 20.0) ** 2))
        dist = Distribution(x, y)
        np.random.seed(0)
        draws = dist.sample(np.random.uniform(0, 1, 20000))
        assert np.isclose(np.mean(draws), 100.0, atol=1.0)
        assert np.isclose(np.std(draws), 20.0 / np.sqrt(2), atol=1.0)

    def test_from_functions(self):
        x = np.linspace(400, 800, 100)
        dist = Distribution.from_functions(
            x, [lambda w: np.exp(-(((w - 600) / 40) ** 2))]
        )
        assert np.isclose(dist(600.0), 1.0, atol=1e-2)


class TestPhaseSamplers:
    def test_isotropic_is_unit_and_covers_sphere(self):
        np.random.seed(0)
        vs = np.array([isotropic() for _ in range(2000)])
        assert np.allclose(np.linalg.norm(vs, axis=1), 1.0)
        # mean should be near zero for an isotropic cloud
        assert np.all(np.abs(vs.mean(axis=0)) < 0.05)

    def test_cone_within_theta_max(self):
        np.random.seed(0)
        theta_max = np.pi / 8
        vs = np.array([cone(theta_max) for _ in range(500)])
        assert np.all(vs[:, 2] >= np.cos(theta_max) - 1e-9)

    def test_cone_raises(self):
        with pytest.raises(ValueError):
            cone(0.0)

    def test_lambertian_upper_hemisphere(self):
        np.random.seed(0)
        vs = np.array([lambertian() for _ in range(500)])
        assert np.all(vs[:, 2] > 0.0)
        # mean z of lambertian is 2/3
        assert np.isclose(vs[:, 2].mean(), 2.0 / 3.0, atol=0.03)

    def test_henyey_greenstein_mean_cosine(self):
        np.random.seed(0)
        g = 0.7
        mus = np.array([henyey_greenstein(g)[2] for _ in range(4000)])
        # <cos theta> = g for HG sampled about +z
        assert np.isclose(mus.mean(), g, atol=0.03)
