"""Device-engine golden tests for touching / coincident surfaces.

The reference pins container/adjacent resolution for scenes with
coincident faces through its Python tracer
(``tests/test_refractored_tracer.py:253-377``: three touching glass
boxes, an embedded box, ``find_container`` start-point cases). Here the
SAME scenes drive the device engine's vectorized container inference
(``engine/tracer.py``), via ``trace_bundle`` with crafted start rays and
``record_every=1``, at BOTH f32 and f64:

* the first boundary event after each start point must carry the
  container the reference's ``find_container`` resolves (the engine
  infers the container per photon to pick n1 and the absorbing
  material — the GENERATE row itself logs -1 by design);
* interior touching faces between equal-index boxes have R = 0, so the
  crossing events there are DETERMINISTIC: TRANSMIT with the exact
  (container, adjacent) pair and boundary position;
* fully-transmitted photons must reproduce the reference's golden
  path — positions (-0.5, 0.5, 1.5, 2.5) then the world-sphere exit —
  event for event, and the oracle must agree on the same rays.
"""
import jax
import numpy as np
import pytest

from pvtrace_tpu import (
    Box,
    Event,
    Material,
    Node,
    Scene,
    Sphere,
    photon_tracer,
)
from pvtrace_tpu.engine import compile_scene
from pvtrace_tpu.engine import tracer as tracer_module
from pvtrace_tpu.engine.api import _get_tables
from pvtrace_tpu.light.ray import Ray

# log["ints"] field order (tracer._LOG_INTS)
KIND, HIT, CONTAINER, ADJACENT = 0, 1, 2, 3


def touching_scene(n1=1.5, n2=1.5, n3=1.5):
    """Three unit glass boxes stacked along +z with coincident faces."""
    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    for name, n, dz in (("box1", n1, 0.0), ("box2", n2, 1.0),
                        ("box3", n3, 2.0)):
        node = Node(
            name=name,
            geometry=Box((1.0, 1.0, 1.0),
                         material=Material(refractive_index=n)),
            parent=world,
        )
        node.translate((0.0, 0.0, dz))
    return Scene(world)


def embedded_scene(n1=1.5):
    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    Node(
        name="box",
        geometry=Box((1.0, 1.0, 1.0),
                     material=Material(refractive_index=n1)),
        parent=world,
    )
    return Scene(world)


def engine_trace(scene, starts, directions, dtype, seed=2, wavelength=555.0):
    """Trace crafted start rays on the device engine with a full event
    log; returns (node_index_map, log_ints, log_floats, counts)."""
    compiled = compile_scene(scene)
    B = len(starts)
    cfg = tracer_module.make_config(
        compiled, n_rays=B, dtype=dtype, record_every=1
    )
    tables = _get_tables(compiled, dtype)
    pos = np.asarray(starts, dtype=dtype)
    direction = np.asarray(directions, dtype=dtype)
    wav = np.full(B, wavelength, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    _tallies, log, counts, _steps = jax.jit(
        lambda: tracer_module.trace_bundle(
            compiled, cfg, tables, pos, direction, wav, key
        )
    )()
    idx = {name: i for i, name in enumerate(compiled.node_names)}
    return idx, np.asarray(log["ints"]), np.asarray(log["floats"]), (
        np.asarray(counts)
    )


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
class TestTouchingSurfaces:
    def test_container_inference_touching_starts(self, dtype):
        """Reference test_find_container_touching_scene start points:
        the engine's vectorized container inference must resolve the
        same container the oracle does — asserted on each photon's
        FIRST boundary event (GENERATE rows log -1 by design)."""
        scene = touching_scene()
        starts = [(0.0, 0.0, z) for z in (-1.0, -0.4, 0.6, 1.6, 2.6)]
        expected = ["world", "box1", "box2", "box3", "world"]
        dirs = [(0.0, 0.0, 1.0)] * len(starts)
        idx, ints, _floats, counts = engine_trace(scene, starts, dirs, dtype)
        for j, name in enumerate(expected):
            assert Event(ints[j, 0, KIND]) == Event.GENERATE
            assert int(counts[j]) >= 2
            assert ints[j, 1, CONTAINER] == idx[name], (
                j, name, ints[j, 1, CONTAINER]
            )

    def test_container_inference_embedded_starts(self, dtype):
        """Reference test_find_container_embedded_scene start points,
        including a start between the box top and the world boundary."""
        scene = embedded_scene()
        starts = [(0.0, 0.0, -1.0), (0.0, 0.0, -0.4), (0.0, 0.0, 0.6)]
        expected = [
            ("world", "box"),   # below the box: next hit enters it
            ("box", "world"),   # inside the box: next hit leaves it
            ("world", None),    # above the box: straight to EXIT
        ]
        dirs = [(0.0, 0.0, 1.0)] * len(starts)
        idx, ints, _floats, counts = engine_trace(scene, starts, dirs, dtype)
        for j, (container, adjacent) in enumerate(expected):
            assert Event(ints[j, 0, KIND]) == Event.GENERATE
            assert int(counts[j]) >= 2
            assert ints[j, 1, CONTAINER] == idx[container], j
            if adjacent is not None:
                assert ints[j, 1, ADJACENT] == idx[adjacent], j
            else:
                assert Event(ints[j, 1, KIND]) == Event.EXIT

    def test_interior_coincident_faces_are_deterministic(self, dtype):
        """Equal-index touching faces have R = 0: every photon that
        enters box1 moving +z MUST cross z=0.5 (box1->box2) and z=1.5
        (box2->box3) as TRANSMIT with exactly that (container, adjacent)
        pair — the engine's adjacent resolution at coincident faces."""
        scene = touching_scene()
        B = 200
        starts = [(0.0, 0.0, -1.0)] * B
        dirs = [(0.0, 0.0, 1.0)] * B
        idx, ints, floats, counts = engine_trace(scene, starts, dirs, dtype)
        atol = 1e-4 if dtype is np.float32 else 1e-9
        inner = {  # z -> (container, adjacent) for +z crossings
            0.5: (idx["box1"], idx["box2"]),
            1.5: (idx["box2"], idx["box3"]),
        }
        crossings = 0
        for j in range(B):
            for k in range(int(counts[j])):
                event = Event(ints[j, k, KIND])
                if event not in (Event.TRANSMIT, Event.REFLECT):
                    continue
                z = float(floats[j, k, 2])
                going_up = float(floats[j, k, 5]) > 0.0
                for z0, (c, a) in inner.items():
                    if abs(z - z0) < atol and going_up:
                        # Interior coincident face: never a reflection.
                        assert event == Event.TRANSMIT, (j, k, z0)
                        assert ints[j, k, CONTAINER] == c, (j, k, z0)
                        assert ints[j, k, ADJACENT] == a, (j, k, z0)
                        crossings += 1
        # The 0.96 entry coin means most of the 200 photons cross both.
        assert crossings > 200

    def test_golden_transmit_path(self, dtype):
        """Photons that transmit at both air/glass coins reproduce the
        reference's expected positions/events exactly
        (test_follow_touching_scene golden path)."""
        scene = touching_scene()
        B = 100
        starts = [(0.0, 0.0, -1.0)] * B
        dirs = [(0.0, 0.0, 1.0)] * B
        idx, ints, floats, counts = engine_trace(scene, starts, dirs, dtype)
        atol = 1e-4 if dtype is np.float32 else 1e-9
        expected_z = [-1.0, -0.5, 0.5, 1.5, 2.5, 10.0]
        expected_events = [
            Event.GENERATE, Event.TRANSMIT, Event.TRANSMIT,
            Event.TRANSMIT, Event.TRANSMIT, Event.EXIT,
        ]
        expected_pairs = [  # (container, adjacent) per boundary event
            None,
            (idx["world"], idx["box1"]),
            (idx["box1"], idx["box2"]),
            (idx["box2"], idx["box3"]),
            (idx["box3"], idx["world"]),
            None,
        ]
        golden = 0
        for j in range(B):
            n_events = int(counts[j])
            events = [Event(ints[j, k, KIND]) for k in range(n_events)]
            if events != expected_events:
                continue  # reflected at an air/glass coin — stochastic
            golden += 1
            for k in range(n_events):
                z = float(floats[j, k, 2])
                assert abs(z - expected_z[k]) < (
                    atol if k < n_events - 1 else 1e-3
                ), (j, k, z)
                assert abs(float(floats[j, k, 0])) < 1e-3  # x stays 0
                assert abs(float(floats[j, k, 1])) < 1e-3  # y stays 0
                if expected_pairs[k] is not None:
                    c, a = expected_pairs[k]
                    assert ints[j, k, CONTAINER] == c
                    assert ints[j, k, ADJACENT] == a
        # P(full transmit) = 0.96^2 ~ 0.92: expect the large majority.
        assert golden > 70

    def test_oracle_agrees_on_golden_path(self, dtype):
        """The f64 oracle resolves the same containers/events on the
        identical start ray (deterministic interior, equal n)."""
        scene = touching_scene()
        np.random.seed(0)
        ray = Ray(
            position=(0.0, 0.0, -1.0), direction=(0.0, 0.0, 1.0),
            wavelength=555.0,
        )
        # Try a few oracle draws until one takes the all-transmit path.
        for _ in range(20):
            history = photon_tracer.follow(scene, ray)
            events = [e for _, e in history]
            if events == [
                Event.GENERATE, Event.TRANSMIT, Event.TRANSMIT,
                Event.TRANSMIT, Event.TRANSMIT, Event.EXIT,
            ]:
                break
        else:
            pytest.fail("oracle never took the 92%-probability path")
        zs = [r.position[2] for r, _ in history]
        np.testing.assert_allclose(
            zs[:5], [-1.0, -0.5, 0.5, 1.5, 2.5], atol=1e-9
        )

    def test_unequal_indices_still_resolve_adjacency(self, dtype):
        """With n1 != n2 != n3 the interior faces carry real Fresnel
        coins; whatever events occur at z=0.5/1.5 must still carry the
        correct (container, adjacent) node pair."""
        scene = touching_scene(n1=1.5, n2=1.8, n3=1.3)
        B = 200
        starts = [(0.0, 0.0, -1.0)] * B
        dirs = [(0.0, 0.0, 1.0)] * B
        idx, ints, floats, counts = engine_trace(scene, starts, dirs, dtype)
        atol = 1e-4 if dtype is np.float32 else 1e-9
        seen = 0
        for j in range(B):
            for k in range(int(counts[j])):
                event = Event(ints[j, k, KIND])
                if event not in (Event.TRANSMIT, Event.REFLECT):
                    continue
                z = float(floats[j, k, 2])
                going_up = float(floats[j, k, 5]) > 0.0
                if abs(z - 0.5) < atol and going_up:
                    assert ints[j, k, CONTAINER] == idx["box1"]
                    assert ints[j, k, ADJACENT] == idx["box2"]
                    seen += 1
                elif abs(z - 1.5) < atol and going_up:
                    assert ints[j, k, CONTAINER] == idx["box2"]
                    assert ints[j, k, ADJACENT] == idx["box3"]
                    seen += 1
        assert seen > 100
