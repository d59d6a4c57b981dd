"""Multi-chip sharding tests (virtual 8-device CPU mesh).

The guarantee under test: per-photon key streams fold the global photon
index and the photon's own step counter, so recorder tallies are
BITWISE identical whether a bundle is traced on one device, sharded
over a mesh, or run through regeneration at any lane width — the TPU
analogue of the reference's scheduling-independent per-ray RNG streams
(``_kernel.pyx:71-77``, ``tests/test_engine.py:169-176``).
"""
import jax
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
from pvtrace_tpu.engine import tracer as tracer_module
from pvtrace_tpu.engine.api import _get_tables
from pvtrace_tpu.engine.emit import emit_bundle
from pvtrace_tpu.engine.recorder import Histogram, Recorder
from pvtrace_tpu.light.light import ConstantWavelengthMask
from pvtrace_tpu.parallel.shard import (
    make_photon_mesh,
    shard_trace,
    shard_trace_device_emit,
)


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


@pytest.fixture(scope="module")
def setup():
    scene = lsc_scene()
    compiled = engine.compile_scene(scene)
    cfg = tracer_module.make_config(
        compiled, n_rays=8000, dtype=np.float64, record_every=0
    )
    tables = _get_tables(compiled, np.float64)
    return scene, compiled, cfg, tables


def assert_tallies_equal(a, b, cfg):
    # bins[total_bins] is the scatter-add overflow slot; it counts every
    # non-matching interaction per loop step, so it varies with loop
    # length and is dropped by the results API — exclude it here too.
    T = cfg.total_bins
    for name in ("distinct", "cross", "fates"):
        assert (np.asarray(a[name]) == np.asarray(b[name])).all(), name
    assert (np.asarray(a["bins"])[:T] == np.asarray(b["bins"])[:T]).all()


def test_sharded_host_bundle_matches_single_device(setup):
    scene, compiled, cfg, tables = setup
    mesh = make_photon_mesh()
    assert mesh.devices.size == 8
    np.random.seed(0)
    pos, direction, wav, _src = emit_bundle(scene, 8000)
    key = jax.random.PRNGKey(3)
    f64 = np.float64

    sharded = shard_trace(compiled, cfg, mesh)
    tallies, steps = sharded(
        tables, pos.astype(f64), direction.astype(f64), wav.astype(f64), key
    )

    single, _log, _counts, _steps = jax.jit(
        lambda: tracer_module.trace_bundle(
            compiled, cfg, tables,
            pos.astype(f64), direction.astype(f64), wav.astype(f64), key,
        )
    )()
    assert_tallies_equal(tallies, single, cfg)
    np.testing.assert_allclose(
        np.asarray(tallies["sums"]), np.asarray(single["sums"]), rtol=1e-12
    )


def test_sharded_device_emit_regen_matches_single_device(setup):
    scene, compiled, cfg, tables = setup
    mesh = make_photon_mesh()
    key = jax.random.PRNGKey(9)

    sharded = shard_trace_device_emit(compiled, cfg, mesh, lanes=256)
    tallies, _ = sharded(tables, 8000, key)
    assert int(np.asarray(tallies["fates"]).sum()) == 8000

    single, _log, _counts, _steps = jax.jit(
        lambda: tracer_module.trace_bundle_device_emit(
            compiled, cfg, tables, key, 8000, lanes=256
        )
    )()
    assert_tallies_equal(tallies, single, cfg)


def test_regen_lane_width_is_bitwise_invariant(setup):
    scene, compiled, cfg, tables = setup
    key = jax.random.PRNGKey(4)

    def run(lanes):
        tallies, _l, _c, _s = jax.jit(
            lambda: tracer_module.trace_bundle_device_emit(
                compiled, cfg, tables, key, 6000, lanes=lanes
            )
        )()
        return tallies

    a = run(512)
    b = run(1024)
    c = run(None)  # full-width, no regeneration
    assert_tallies_equal(a, b, cfg)
    assert_tallies_equal(a, c, cfg)
