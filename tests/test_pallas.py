"""Pallas step-kernel equivalence tests (interpret mode on CPU).

The hand-fused Pallas step runs the same `physics_core` as the XLA
fast body; only table interpolation differs (one-hot MXU matmuls vs
gathers). The one-hot weights have exactly two nonzero entries per
lane, so in interpret mode the result is BIT-IDENTICAL to the gather
formulation — asserted here including recorders.
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
from pvtrace_tpu.engine.recorder import Histogram, Recorder
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


def test_pallas_step_matches_xla_core_exactly():
    scene = lsc_scene()
    kwargs = dict(seed=11, record_every=0, lanes=2048, dtype=np.float32)
    r_xla = engine.simulate(scene, 8192, pallas=False, **kwargs)
    r_pl = engine.simulate(scene, 8192, pallas=True, **kwargs)
    assert r_pl.fate_counts() == r_xla.fate_counts()
    a = r_xla.recorders["escape"]
    b = r_pl.recorders["escape"]
    assert a.rays == b.rays
    assert a.crossings == b.crossings
    _, ca = a.histogram()
    _, cb = b.histogram()
    assert (ca == cb).all()


def test_pallas_falls_back_without_aligned_block():
    # 9000 lanes has no block divisor >= 128 aligned with the TPU
    # layout; the tracer silently uses the XLA fast body.
    scene = lsc_scene()
    result = engine.simulate(
        scene, 9000, seed=3, record_every=0, lanes=None,
        dtype=np.float32, pallas=True,
    )
    assert sum(result.fate_counts().values()) == 9000
