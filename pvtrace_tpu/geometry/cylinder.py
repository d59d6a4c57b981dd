"""Z-aligned capped cylinder geometry.

Parity: reference ``pvtrace/geometry/cylinder.py`` (analytic quadratic +
cap planes via ``ray_z_cylinder``; normal branches cap vs barrel).
"""
import numpy as np

from pvtrace_tpu.common.errors import GeometryError
from pvtrace_tpu.geometry.geometry import Geometry
from pvtrace_tpu.geometry.utils import close_to_zero, norm, ray_z_cylinder


class Cylinder(Geometry):
    """A capped cylinder of given length and radius, centred at (0, 0, 0)
    and aligned along the local z axis."""

    def __init__(self, length, radius, material=None):
        super(Cylinder, self).__init__()
        self.length = length
        self.radius = radius
        self._material = material

    @property
    def material(self):
        return self._material

    @material.setter
    def material(self, new_value):
        self._material = new_value

    def is_on_surface(self, point):
        _, dist = ray_z_cylinder(self.length, self.radius, point, norm((1, 1, 1)))
        if len(dist) == 0:
            return False
        return bool(close_to_zero(dist[0]))

    def contains(self, point):
        z = point[2]
        r = np.sqrt(point[0] ** 2 + point[1] ** 2)
        return bool(-0.5 * self.length < z < 0.5 * self.length and r < self.radius)

    def intersections(self, origin, direction):
        points, _ = ray_z_cylinder(self.length, self.radius, origin, direction)
        return points

    def normal(self, surface_point):
        z = surface_point[2]
        if np.isclose(z, -0.5 * self.length):
            return (0.0, 0.0, -1.0)
        if np.isclose(z, 0.5 * self.length):
            return (0.0, 0.0, 1.0)
        r = np.sqrt(surface_point[0] ** 2 + surface_point[1] ** 2)
        if np.isclose(self.radius, r):
            v = np.array([surface_point[0], surface_point[1], 0.0])
            return tuple(norm(v).tolist())
        raise GeometryError("Not a surface point.")

    def is_entering(self, surface_point, direction) -> bool:
        if not self.is_on_surface(surface_point):
            raise GeometryError("Not a surface point.")
        return bool(np.dot(self.normal(surface_point), direction) < 0.0)
