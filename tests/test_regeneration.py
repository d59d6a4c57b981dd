"""Lane-regeneration tests.

Regeneration (``lanes < num_rays``) refills dead wavefront lanes with
freshly emitted photons until the budget is spent, so loop cost follows
the mean photon lifetime instead of the max. Each photon's stream is a
pure function of ``fold_in(base_key, pid)``, so tallies must be
independent of the lane width — validated here against the plain
full-width path with two-proportion z-tests, and exactly for the photon
budget and determinism.
"""
import numpy as np
import pytest

from pvtrace_tpu import (
    Absorber,
    Box,
    Light,
    Luminophore,
    Material,
    Node,
    Scene,
    Sphere,
    engine,
)
from pvtrace_tpu.data import lumogen_f_red_305
from pvtrace_tpu.engine.recorder import Histogram, Recorder
from pvtrace_tpu.light.event import Event
from pvtrace_tpu.light.light import ConstantWavelengthMask


def lsc_scene():
    x = np.arange(400, 801, dtype=float)
    world = Node(
        name="world",
        geometry=Sphere(radius=12.0, material=Material(refractive_index=1.0)),
    )
    lsc = Node(
        name="lsc",
        geometry=Box(
            (5.0, 5.0, 1.0),
            material=Material(
                refractive_index=1.5,
                components=[
                    Luminophore(
                        coefficient=np.column_stack(
                            (x, lumogen_f_red_305.absorption(x) * 8.0)
                        ),
                        emission=np.column_stack(
                            (x, lumogen_f_red_305.emission(x))
                        ),
                        quantum_yield=0.9,
                    ),
                    Absorber(0.2),
                ],
            ),
        ),
        parent=world,
    )
    lsc.recorders = [
        Recorder(
            "escape",
            event="escaping",
            histograms=[Histogram("wavelength", 400, 800, 40)],
        )
    ]
    light = Node(
        name="light",
        light=Light(wavelength=ConstantWavelengthMask(555.0)),
        parent=world,
    )
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


@pytest.mark.slow
def test_regeneration_traces_exact_budget_and_matches_plain():
    # Per-photon key streams fold (pid, own step counter), so the
    # regenerated run is BITWISE identical to the full-width run.
    scene = lsc_scene()
    N = 20000
    plain = engine.simulate(scene, N, seed=11, record_every=0, lanes=None)
    regen = engine.simulate(scene, N, seed=11, record_every=0, lanes=4096)
    fates_regen = regen.fate_counts()
    assert sum(fates_regen.values()) == N
    assert fates_regen == plain.fate_counts()
    r1 = plain.recorders["escape"]
    r2 = regen.recorders["escape"]
    assert r1.rays == r2.rays
    assert r1.crossings == r2.crossings
    _, c1 = r1.histogram()
    _, c2 = r2.histogram()
    assert (c1 == c2).all()
    assert abs(r1.mean("wavelength") - r2.mean("wavelength")) < 1e-6


def test_regeneration_is_deterministic():
    scene = lsc_scene()
    a = engine.simulate(scene, 8000, seed=3, record_every=0, lanes=2048)
    b = engine.simulate(scene, 8000, seed=3, record_every=0, lanes=2048)
    assert a.fate_counts() == b.fate_counts()
    ea, ca = a.recorders["escape"].histogram()
    eb, cb = b.recorders["escape"].histogram()
    assert (ca == cb).all()


@pytest.mark.slow
def test_regeneration_histories_are_complete():
    scene = lsc_scene()
    result = engine.simulate(
        scene, 6000, seed=5, record_every=250, lanes=1024
    )
    histories = list(result.histories())
    assert len(histories) == 24
    for history in histories:
        assert history[0][1] == Event.GENERATE
        assert history[-1][1] in (
            Event.EXIT,
            Event.NONRADIATIVE,
            Event.KILL,
        )
