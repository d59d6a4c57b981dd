"""Checkpoint/resume tests.

The key guarantee: an interrupted + resumed run produces EXACTLY the
same tallies as an uninterrupted run with the same seed, because each
bundle is seeded by its start offset (the ``simulate_stream``
idempotent-bundle design, reference ``engine/api.py:249-264``).
"""
import numpy as np
import pytest

from pvtrace_tpu import (
    Absorber,
    Box,
    Light,
    Material,
    Node,
    Scene,
    Sphere,
    engine,
)
from pvtrace_tpu.engine.recorder import Histogram, Recorder
from pvtrace_tpu.light.light import ConstantWavelengthMask


def make_scene():
    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    box = Node(
        name="box",
        geometry=Box(
            (2.0, 2.0, 1.0),
            material=Material(
                refractive_index=1.5, components=[Absorber(0.5)]
            ),
        ),
        parent=world,
    )
    box.recorders = [
        Recorder(
            "escape",
            event="escaping",
            histograms=[Histogram("wavelength", 400, 800, 40)],
        ),
        Recorder("lost", event="lost"),
    ]
    light = Node(
        name="light",
        light=Light(wavelength=ConstantWavelengthMask(555.0)),
        parent=world,
    )
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def tallies(result):
    out = {}
    for name, recorder in result.recorders.items():
        edges, counts = recorder.histogram(0) if recorder.spec.histograms else (None, None)
        out[name] = (
            recorder.rays,
            recorder.crossings,
            None if counts is None else counts.tolist(),
        )
    return out


def test_resume_equals_uninterrupted(tmp_path):
    scene = make_scene()
    path = str(tmp_path / "run.npz")

    full = engine.simulate_checkpointed(
        scene, 6000, checkpoint=None, bundle=1000, seed=42
    )
    assert full.complete and full.traced == 6000

    # Interrupted after 2 bundles, then resumed to completion.
    partial = engine.simulate_checkpointed(
        scene, 6000, checkpoint=path, bundle=1000, seed=42,
        stop_after_bundles=2,
    )
    assert not partial.complete and partial.traced == 2000

    resumed = engine.simulate_checkpointed(
        scene, 6000, checkpoint=path, bundle=1000, seed=42
    )
    assert resumed.complete and resumed.traced == 6000

    assert tallies(resumed) == tallies(full)
    assert resumed.fate_counts() == full.fate_counts()


def test_checkpoint_rejects_wrong_scene(tmp_path):
    scene = make_scene()
    path = str(tmp_path / "run.npz")
    engine.simulate_checkpointed(
        scene, 2000, checkpoint=path, bundle=1000, seed=1,
        stop_after_bundles=1,
    )
    other = make_scene()
    other.root.children[0].geometry.material.refractive_index = 1.7
    with pytest.raises(ValueError, match="different scene"):
        engine.simulate_checkpointed(
            other, 2000, checkpoint=path, bundle=1000, seed=1
        )


def test_checkpoint_rejects_shape_mismatch(tmp_path):
    scene = make_scene()
    path = str(tmp_path / "run.npz")
    engine.simulate_checkpointed(
        scene, 2000, checkpoint=path, bundle=1000, seed=1,
        stop_after_bundles=1,
    )
    with pytest.raises(ValueError, match="shape mismatch"):
        engine.simulate_checkpointed(
            scene, 4000, checkpoint=path, bundle=1000, seed=1
        )
    with pytest.raises(ValueError, match="seed"):
        engine.simulate_checkpointed(
            scene, 2000, checkpoint=path, bundle=1000, seed=2
        )


def test_completed_checkpoint_is_a_noop(tmp_path):
    scene = make_scene()
    path = str(tmp_path / "run.npz")
    first = engine.simulate_checkpointed(
        scene, 2000, checkpoint=path, bundle=1000, seed=9
    )
    again = engine.simulate_checkpointed(
        scene, 2000, checkpoint=path, bundle=1000, seed=9
    )
    assert again.traced == 2000
    assert tallies(again) == tallies(first)


def test_checkpointed_score_gradients(tmp_path):
    scene = make_scene()
    path = str(tmp_path / "score.npz")
    partial = engine.simulate_checkpointed(
        scene, 4000, checkpoint=path, bundle=1000, seed=3,
        stop_after_bundles=2, score=True,
    )
    resumed = engine.simulate_checkpointed(
        scene, 4000, checkpoint=path, bundle=1000, seed=3, score=True,
    )
    full = engine.simulate_checkpointed(
        scene, 4000, checkpoint=None, bundle=1000, seed=3, score=True,
    )
    fr, gr = resumed.fate_gradients()
    ff, gf = full.fate_gradients()
    assert fr == ff
    for event in gr:
        np.testing.assert_allclose(gr[event], gf[event], rtol=1e-12)
    # Absorber scale up => more NONRADIATIVE
    from pvtrace_tpu.light.event import Event
    assert gr[Event.NONRADIATIVE][0] > 0


def test_score_checkpoint_mismatch_raises(tmp_path):
    scene = make_scene()
    path = str(tmp_path / "noscore.npz")
    engine.simulate_checkpointed(
        scene, 2000, checkpoint=path, bundle=1000, seed=1,
        stop_after_bundles=1,
    )
    with pytest.raises(ValueError, match="without score"):
        engine.simulate_checkpointed(
            scene, 2000, checkpoint=path, bundle=1000, seed=1, score=True,
        )


def test_checkpoint_is_topology_portable(tmp_path):
    """A run checkpointed on an 8-device mesh resumes bit-exactly on a
    single device (and matches the uninterrupted single-device run):
    per-photon keys fold the global photon index, so the mesh shape is
    not part of the state."""
    from pvtrace_tpu.parallel import make_photon_mesh

    scene = make_scene()
    path = str(tmp_path / "mesh-run.npz")

    full = engine.simulate_checkpointed(
        scene, 6000, checkpoint=None, bundle=1000, seed=17, record_every=0
    )

    partial = engine.simulate_checkpointed(
        scene, 6000, checkpoint=path, bundle=1000, seed=17,
        stop_after_bundles=3, mesh=make_photon_mesh(),
    )
    assert not partial.complete and partial.traced == 3000

    resumed = engine.simulate_checkpointed(
        scene, 6000, checkpoint=path, bundle=1000, seed=17, record_every=0
    )
    assert resumed.complete
    assert tallies(resumed) == tallies(full)
    assert resumed.fate_counts() == full.fate_counts()


def test_checkpoint_mesh_rejects_indivisible_bundle(tmp_path):
    from pvtrace_tpu.parallel import make_photon_mesh

    scene = make_scene()
    with pytest.raises(ValueError, match="multiples of the mesh"):
        engine.simulate_checkpointed(
            scene, 6000, checkpoint=None, bundle=999, seed=1,
            mesh=make_photon_mesh(),
        )
