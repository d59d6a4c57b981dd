"""Geometry primitive unit tests.

Mirrors the strategy of reference tests/test_box.py, test_sphere.py,
test_cylinder.py, test_geometry_utils.py: exact assertions on analytic
intersections, normals and containment.
"""
import numpy as np
import pytest

from pvtrace_tpu import Box, Cylinder, Mesh, Sphere
from pvtrace_tpu.common.errors import GeometryError
from pvtrace_tpu.geometry.utils import (
    EPS_ZERO,
    aabb_intersection,
    on_aabb_surface,
    ray_z_cylinder,
)


class TestBox:
    def test_intersections_through_centre(self):
        box = Box((1.0, 1.0, 1.0))
        hits = box.intersections((0.0, 0.0, -2.0), (0.0, 0.0, 1.0))
        assert np.allclose(hits, [(0.0, 0.0, -0.5), (0.0, 0.0, 0.5)])

    def test_intersections_from_inside(self):
        box = Box((1.0, 1.0, 1.0))
        hits = box.intersections((0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
        assert np.allclose(hits, [(0.0, 0.0, 0.5)])

    def test_miss(self):
        box = Box((1.0, 1.0, 1.0))
        assert box.intersections((2.0, 2.0, -2.0), (0.0, 0.0, 1.0)) == ()

    def test_contains(self):
        box = Box((1.0, 2.0, 3.0))
        assert box.contains((0.0, 0.0, 0.0))
        assert box.contains((0.49, 0.99, 1.49))
        assert not box.contains((0.51, 0.0, 0.0))
        assert not box.contains((0.5, 0.0, 0.0))  # on surface is not inside

    def test_is_on_surface(self):
        box = Box((1.0, 1.0, 1.0))
        assert box.is_on_surface((0.5, 0.0, 0.0))
        assert box.is_on_surface((0.0, -0.5, 0.1))
        assert not box.is_on_surface((0.0, 0.0, 0.0))
        assert not box.is_on_surface((0.5 + 1e-6, 0.0, 0.0))

    def test_normals(self):
        box = Box((1.0, 1.0, 1.0))
        assert box.normal((0.5, 0.0, 0.0)) == (1, 0, 0)
        assert box.normal((-0.5, 0.1, 0.2)) == (-1, 0, 0)
        assert box.normal((0.1, 0.5, 0.0)) == (0, 1, 0)
        assert box.normal((0.0, 0.0, -0.5)) == (0, 0, -1)

    def test_normal_raises_off_surface(self):
        box = Box((1.0, 1.0, 1.0))
        with pytest.raises(GeometryError):
            box.normal((0.0, 0.0, 0.0))

    def test_is_entering(self):
        box = Box((1.0, 1.0, 1.0))
        assert box.is_entering((0.0, 0.0, 0.5), (0.0, 0.0, -1.0))
        assert not box.is_entering((0.0, 0.0, 0.5), (0.0, 0.0, 1.0))


class TestSphere:
    def test_intersections(self):
        sphere = Sphere(radius=1.0)
        hits = sphere.intersections((-2.0, 0.0, 0.0), (1.0, 0.0, 0.0))
        assert np.allclose(hits, [(-1.0, 0.0, 0.0), (1.0, 0.0, 0.0)])

    def test_intersection_from_inside(self):
        sphere = Sphere(radius=1.0)
        hits = sphere.intersections((0.0, 0.0, 0.0), (1.0, 0.0, 0.0))
        assert np.allclose(hits, [(1.0, 0.0, 0.0)])

    def test_tangent(self):
        sphere = Sphere(radius=1.0)
        hits = sphere.intersections((-2.0, 1.0, 0.0), (1.0, 0.0, 0.0))
        assert len(hits) == 1
        assert np.allclose(hits[0], (0.0, 1.0, 0.0), atol=1e-6)

    def test_miss(self):
        sphere = Sphere(radius=1.0)
        assert sphere.intersections((-2.0, 1.5, 0.0), (1.0, 0.0, 0.0)) == ()

    def test_contains_and_surface(self):
        sphere = Sphere(radius=1.0)
        assert sphere.contains((0.0, 0.0, 0.0))
        assert not sphere.contains((1.0, 0.0, 0.0))
        assert sphere.is_on_surface((0.0, 1.0, 0.0))
        assert not sphere.is_on_surface((0.0, 0.9, 0.0))

    def test_normal(self):
        sphere = Sphere(radius=2.0)
        assert np.allclose(sphere.normal((0.0, 0.0, 2.0)), (0.0, 0.0, 1.0))


class TestCylinder:
    def test_intersections_barrel(self):
        cyl = Cylinder(length=2.0, radius=1.0)
        hits = cyl.intersections((-2.0, 0.0, 0.0), (1.0, 0.0, 0.0))
        assert np.allclose(hits, [(-1.0, 0.0, 0.0), (1.0, 0.0, 0.0)])

    def test_intersections_caps(self):
        cyl = Cylinder(length=2.0, radius=1.0)
        hits = cyl.intersections((0.0, 0.0, -2.0), (0.0, 0.0, 1.0))
        assert np.allclose(hits, [(0.0, 0.0, -1.0), (0.0, 0.0, 1.0)])

    def test_oblique_cap_and_barrel(self):
        cyl = Cylinder(length=2.0, radius=1.0)
        d = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
        hits = cyl.intersections((-1.5, 0.0, -0.5), tuple(d))
        assert len(hits) == 2
        # enters the barrel at x=-1, exits through the top cap at z=1
        assert np.allclose(hits[0], (-1.0, 0.0, 0.0))
        assert np.allclose(hits[1], (0.0, 0.0, 1.0))

    def test_normals(self):
        cyl = Cylinder(length=2.0, radius=1.0)
        assert cyl.normal((0.0, 0.0, 1.0)) == (0.0, 0.0, 1.0)
        assert cyl.normal((0.0, 0.0, -1.0)) == (0.0, 0.0, -1.0)
        assert np.allclose(cyl.normal((1.0, 0.0, 0.5)), (1.0, 0.0, 0.0))

    def test_contains(self):
        cyl = Cylinder(length=2.0, radius=1.0)
        assert cyl.contains((0.0, 0.0, 0.0))
        assert not cyl.contains((0.0, 0.0, 1.5))
        assert not cyl.contains((1.5, 0.0, 0.0))


class TestUtils:
    def test_ray_z_cylinder_miss(self):
        points, dists = ray_z_cylinder(1.0, 1.0, (5.0, 5.0, 0.0), (0.0, 0.0, 1.0))
        assert points == [] and dists == []

    def test_ray_z_cylinder_through(self):
        points, dists = ray_z_cylinder(
            1.0, 1.0, (-2.0, 0.0, 0.0), (1.0, 0.0, 0.0)
        )
        assert np.allclose(dists, [1.0, 3.0])

    def test_aabb_intersection_behind(self):
        # Ray pointing away from the box: no forward hits
        hits = aabb_intersection(
            (-0.5,) * 3, (0.5,) * 3, (0.0, 0.0, 2.0), (0.0, 0.0, 1.0)
        )
        assert hits == ()

    def test_on_aabb_surface(self):
        ok, surfaces = on_aabb_surface((1.0, 1.0, 1.0), (0.5, 0.0, 0.0))
        assert ok and surfaces == [1]
        ok, _ = on_aabb_surface(
            (1.0, 1.0, 1.0), (0.5 + 2 * EPS_ZERO, 0.0, 0.0), atol=EPS_ZERO
        )
        assert not ok


class TestMesh:
    @staticmethod
    def _cube_mesh(size=1.0):
        # 12-triangle cube centred at origin
        s = size / 2.0
        v = np.array(
            [
                [-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
                [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s],
            ]
        )
        f = np.array(
            [
                [0, 2, 1], [0, 3, 2],  # bottom
                [4, 5, 6], [4, 6, 7],  # top
                [0, 1, 5], [0, 5, 4],  # y min
                [2, 3, 7], [2, 7, 6],  # y max
                [1, 2, 6], [1, 6, 5],  # x max
                [3, 0, 4], [3, 4, 7],  # x min
            ]
        )
        return Mesh((v, f))

    def test_intersections(self):
        mesh = self._cube_mesh()
        hits = mesh.intersections((0.1, 0.1, -2.0), (0.0, 0.0, 1.0))
        assert len(hits) == 2
        assert np.allclose([h[2] for h in hits], [-0.5, 0.5])

    def test_contains(self):
        mesh = self._cube_mesh()
        assert mesh.contains((0.0, 0.0, 0.0))
        assert not mesh.contains((0.0, 0.0, 2.0))

    def test_normal(self):
        mesh = self._cube_mesh()
        assert np.allclose(mesh.normal((0.1, 0.1, 0.5)), (0.0, 0.0, 1.0))

    def test_is_entering(self):
        mesh = self._cube_mesh()
        assert mesh.is_entering((0.1, 0.1, 0.5), (0.0, 0.0, -1.0))
        assert not mesh.is_entering((0.1, 0.1, 0.5), (0.0, 0.0, 1.0))
