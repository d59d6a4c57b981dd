"""Node tree / frame conversion tests.

Mirrors reference tests/test_node.py and test_transformable.py: point and
vector conversions through nested rotated frames.
"""
import numpy as np

from pvtrace_tpu import Box, Material, Node, Scene, Sphere
from pvtrace_tpu.geometry.transformations import rotation_matrix, translation_matrix


class TestTransformable:
    def test_default_location(self):
        node = Node(name="n")
        assert node.location == (0.0, 0.0, 0.0)

    def test_translate(self):
        node = Node(name="n")
        node.translate((1.0, 2.0, 3.0))
        node.translate((1.0, 0.0, 0.0))
        assert np.allclose(node.location, (2.0, 2.0, 3.0))

    def test_rotate_preserves_location(self):
        node = Node(name="n", location=(1.0, 0.0, 0.0))
        node.rotate(np.pi / 2, (0, 0, 1))
        assert np.allclose(node.location, (1.0, 0.0, 0.0))


class TestNodeFrames:
    def test_point_to_node_translation(self):
        a = Node(name="a")
        b = Node(name="b", parent=a, location=(1.0, 1.0, 1.0))
        # b's origin is at (1,1,1) in a's frame
        assert np.allclose(b.point_to_node((0.0, 0.0, 0.0), a), (1.0, 1.0, 1.0))
        assert np.allclose(a.point_to_node((1.0, 1.0, 1.0), b), (0.0, 0.0, 0.0))

    def test_vector_to_node_rotation(self):
        a = Node(name="a")
        b = Node(name="b", parent=a)
        b.rotate(np.pi / 2, (0, 0, 1))
        # b's x-axis points along a's y-axis
        assert np.allclose(b.vector_to_node((1.0, 0.0, 0.0), a), (0.0, 1.0, 0.0))

    def test_nested_rotated_frames(self):
        root = Node(name="root")
        mid = Node(name="mid", parent=root, location=(0.0, 0.0, 1.0))
        mid.rotate(np.pi / 2, (0, 0, 1))
        leaf = Node(name="leaf", parent=mid, location=(1.0, 0.0, 0.0))
        # leaf origin: in mid frame at (1,0,0); mid is rotated 90deg about z
        # so that is (0,1,0) in root, plus mid location (0,0,1)
        assert np.allclose(
            leaf.point_to_node((0.0, 0.0, 0.0), root), (0.0, 1.0, 1.0)
        )

    def test_sibling_conversion(self):
        root = Node(name="root")
        a = Node(name="a", parent=root, location=(1.0, 0.0, 0.0))
        b = Node(name="b", parent=root, location=(0.0, 1.0, 0.0))
        assert np.allclose(a.point_to_node((0.0, 0.0, 0.0), b), (1.0, -1.0, 0.0))

    def test_look_at(self):
        root = Node(name="root")
        node = Node(name="n", parent=root)
        node.look_at((1.0, 0.0, 0.0))
        assert np.allclose(node.vector_to_node((0.0, 0.0, 1.0), root), (1.0, 0.0, 0.0))

    def test_look_at_antiparallel(self):
        root = Node(name="root")
        node = Node(name="n", parent=root)
        node.look_at((0.0, 0.0, -1.0))
        assert np.allclose(
            node.vector_to_node((0.0, 0.0, 1.0), root), (0.0, 0.0, -1.0)
        )

    def test_transformations_roundtrip(self):
        m = rotation_matrix(0.3, (1, 2, 3)) @ translation_matrix((1, 2, 3))
        inv = np.linalg.inv(m)
        assert np.allclose(m @ inv, np.identity(4))


class TestSceneIntersections:
    def test_intersections_sorted_and_forward(self):
        world = Node(
            name="world",
            geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
        )
        box = Node(
            name="box",
            geometry=Box((1.0, 1.0, 1.0), material=Material(refractive_index=1.5)),
            parent=world,
        )
        scene = Scene(world)
        hits = scene.intersections((0.0, 0.0, -5.0), (0.0, 0.0, 1.0))
        names = [i.hit.name for i in hits]
        assert names == ["box", "box", "world"]
        dists = [i.distance for i in hits]
        assert dists == sorted(dists)
        assert np.allclose(dists, [4.5, 5.5, 15.0])

    def test_intersections_in_rotated_child_frame(self):
        world = Node(
            name="world",
            geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
        )
        box = Node(
            name="box",
            geometry=Box((1.0, 1.0, 1.0), material=Material(refractive_index=1.5)),
            parent=world,
        )
        box.rotate(np.pi / 4, (0, 0, 1))  # rotation about z: ray along z unaffected
        scene = Scene(world)
        hits = scene.intersections((0.0, 0.0, -5.0), (0.0, 0.0, 1.0))
        assert np.allclose([i.distance for i in hits], [4.5, 5.5, 15.0])

    def test_emit_world_frame(self):
        from pvtrace_tpu import Light

        world = Node(
            name="world",
            geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
        )
        light = Node(name="light", light=Light(), parent=world)
        light.translate((0.0, 0.0, -5.0))
        light.look_at((0.0, 1.0, 0.0))
        scene = Scene(world)
        rays = list(scene.emit(1))
        assert np.allclose(rays[0].position, (0.0, 0.0, -5.0))
        assert np.allclose(rays[0].direction, (0.0, 1.0, 0.0))
