"""Pallas megakernel equivalence tests (interpret mode on CPU).

The megakernel runs the ENTIRE regeneration trace loop inside one
pallas_call (state in VMEM, Chebyshev spectral surrogates baked in as
constants, per-block refill queues with MXU triangular prefix sums).
Every photon's random stream is a pure function of (seed, pid) exactly
as in the XLA body, so integer fate tallies must agree EXACTLY even
though the photon->lane assignment differs (block-contiguous queue
ranges vs one global queue).
"""
import numpy as np

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
from pvtrace_tpu.engine.recorder import Recorder
from pvtrace_tpu.light.light import ConstantWavelengthMask


def lsc_scene(recorders=False):
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
    if recorders:
        lsc.recorders = [Recorder("escape", event="escaping")]
    light = Node(
        name="light",
        light=Light(wavelength=ConstantWavelengthMask(555.0)),
        parent=world,
    )
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def test_megakernel_fates_match_xla_exactly():
    """Same (seed, pid)-pure streams => identical integer fate tallies,
    including with lane regeneration (budget > wavefront)."""
    scene = lsc_scene()
    kwargs = dict(seed=11, record_every=0, lanes=1280, dtype=np.float32)
    r_xla = engine.simulate(scene, 5120, pallas=False, **kwargs)
    r_mega = engine.simulate(scene, 5120, pallas=True, **kwargs)
    assert r_mega.fate_counts() == r_xla.fate_counts()
    np.testing.assert_array_equal(
        np.asarray(r_mega.data["fates"]), np.asarray(r_xla.data["fates"])
    )


def test_megakernel_budget_equals_wavefront():
    """pallas=True with budget == lanes still routes through the
    megakernel (refill never fires) and matches the XLA body."""
    scene = lsc_scene()
    kwargs = dict(seed=3, record_every=0, dtype=np.float32)
    r_xla = engine.simulate(scene, 2048, pallas=False, lanes=None, **kwargs)
    r_mega = engine.simulate(scene, 2048, pallas=True, lanes=None, **kwargs)
    assert r_mega.fate_counts() == r_xla.fate_counts()


def test_megakernel_deterministic_for_seed():
    scene = lsc_scene()
    kwargs = dict(seed=7, record_every=0, lanes=512, dtype=np.float32)
    a = engine.simulate(scene, 2048, pallas=True, **kwargs)
    b = engine.simulate(scene, 2048, pallas=True, **kwargs)
    np.testing.assert_array_equal(
        np.asarray(a.data["fates"]), np.asarray(b.data["fates"])
    )


def test_recorder_scenes_fall_back_to_xla():
    """Recorders are not (yet) tallied inside the megakernel; pallas=True
    must silently fall back to the XLA body with identical results."""
    scene = lsc_scene(recorders=True)
    kwargs = dict(seed=5, record_every=0, lanes=512, dtype=np.float32)
    r_xla = engine.simulate(scene, 1024, pallas=False, **kwargs)
    r_fb = engine.simulate(scene, 1024, pallas=True, **kwargs)
    assert r_fb.fate_counts() == r_xla.fate_counts()
    assert (
        r_fb.recorders["escape"].rays == r_xla.recorders["escape"].rays
    )
