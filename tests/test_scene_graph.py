"""Node tree / frame conversion tests.

Mirrors reference tests/test_node.py and test_transformable.py: point and
vector conversions through nested rotated frames.
"""
import numpy as np
import pytest

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


class TestEulerConventions:
    """All 24 Gohlke-style Euler conventions round-trip (reference
    vendored transformations.py:1061-1240 equivalents)."""

    CONVENTIONS = [
        first + a + b + c
        for first in "sr"
        for a in "xyz"
        for b in "xyz"
        for c in "xyz"
        if a != b and b != c
    ]

    def test_roundtrip_all_conventions(self):
        from pvtrace_tpu.geometry import transformations as tf

        rng = np.random.default_rng(5)
        assert len(self.CONVENTIONS) == 24
        for axes in self.CONVENTIONS:
            for _ in range(8):
                angles = rng.uniform(-np.pi, np.pi, 3)
                angles[1] *= 0.45  # stay clear of the lock for roundtrip
                m = tf.euler_matrix(*angles, axes=axes)
                back = tf.euler_from_matrix(m, axes=axes)
                m2 = tf.euler_matrix(*back, axes=axes)
                np.testing.assert_allclose(m2, m, atol=1e-10), axes

    def test_gimbal_lock_recomposes(self):
        from pvtrace_tpu.geometry import transformations as tf

        for axes in self.CONVENTIONS:
            lock = 0.0 if axes[1] == axes[3] else np.pi / 2
            m = tf.euler_matrix(0.4, lock, -0.9, axes=axes)
            back = tf.euler_from_matrix(m, axes=axes)
            np.testing.assert_allclose(
                tf.euler_matrix(*back, axes=axes), m, atol=1e-8
            )

    def test_static_equals_reversed_rotating(self):
        from pvtrace_tpu.geometry import transformations as tf

        m1 = tf.euler_matrix(0.3, -0.6, 1.1, axes="sxyz")
        m2 = tf.euler_matrix(1.1, -0.6, 0.3, axes="rzyx")
        np.testing.assert_allclose(m1, m2, atol=1e-12)

    def test_quaternion_from_euler(self):
        from pvtrace_tpu.geometry import transformations as tf

        q = tf.quaternion_from_euler(0.2, 0.5, -0.7, axes="ryxz")
        np.testing.assert_allclose(
            tf.quaternion_matrix(q),
            tf.euler_matrix(0.2, 0.5, -0.7, axes="ryxz"),
            atol=1e-12,
        )


class TestComposeDecompose:
    def test_roundtrip(self):
        from pvtrace_tpu.geometry import transformations as tf

        scale = (1.5, 0.7, 2.0)
        shear = (0.2, -0.1, 0.3)
        angles = (0.4, -0.3, 0.9)
        translate = (1.0, -2.0, 0.5)
        m = tf.compose_matrix(scale, shear, angles, translate)
        s2, sh2, a2, t2 = tf.decompose_matrix(m)
        np.testing.assert_allclose(s2, scale, atol=1e-10)
        np.testing.assert_allclose(sh2, shear, atol=1e-10)
        np.testing.assert_allclose(a2, angles, atol=1e-10)
        np.testing.assert_allclose(t2, translate, atol=1e-10)

    def test_rigid_matrix_decomposes_cleanly(self):
        from pvtrace_tpu.geometry import transformations as tf

        m = tf.rotation_matrix(0.8, (1, 2, 3), point=(0.5, 0, -1))
        scale, shear, angles, translate = tf.decompose_matrix(m)
        np.testing.assert_allclose(scale, (1, 1, 1), atol=1e-10)
        np.testing.assert_allclose(shear, (0, 0, 0), atol=1e-10)
        np.testing.assert_allclose(
            tf.compose_matrix(scale, shear, angles, translate), m, atol=1e-10
        )

    def test_scale_matrix(self):
        from pvtrace_tpu.geometry import transformations as tf

        m = tf.scale_matrix(2.0, origin=(1.0, 1.0, 1.0))
        np.testing.assert_allclose(m @ [1, 1, 1, 1], [1, 1, 1, 1])
        np.testing.assert_allclose(m @ [2, 1, 1, 1], [3, 1, 1, 1])

    def test_singular_raises(self):
        from pvtrace_tpu.geometry import transformations as tf

        bad = np.diag([1.0, 0.0, 1.0, 1.0])
        with pytest.raises(ValueError):
            tf.decompose_matrix(bad)
