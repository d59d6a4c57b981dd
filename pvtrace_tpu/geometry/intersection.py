"""Intersection record with frame conversion.

Parity: reference ``pvtrace/geometry/intersection.py``.
"""
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from pvtrace_tpu.geometry.utils import floats_close


@dataclass
class Intersection:
    #: Coordinate system node of `point` (not necessarily the hit node).
    coordsys: "Node"  # noqa: F821
    #: (x, y, z) intersection point
    point: Tuple[float, ...]
    #: The node owning the geometry whose surface contains `point`.
    hit: "Node"  # noqa: F821
    #: Distance between the ray location and the hit point.
    distance: float

    def to(self, other_node) -> "Intersection":
        """Re-express the intersection point in another node's frame."""
        return Intersection(
            coordsys=other_node,
            point=self.coordsys.point_to_node(self.point, other_node),
            hit=self.hit,
            distance=self.distance,
        )

    def __eq__(self, other):
        return all(
            [
                self.coordsys == other.coordsys,
                np.allclose(self.point, other.point),
                self.hit == other.hit,
                floats_close(self.distance, other.distance),
            ]
        )
