"""Differentiable-transport tests (BASELINE north star).

The device tracer's score-function estimator gives full multi-bounce
gradients of fate fractions w.r.t. component coefficient scales from a
single run. Validated here (1) against the ANALYTIC gradient on a
straight-through absorber slab, and (2) against central finite
differences with common random numbers on the multi-bounce LSC scene.
"""
import functools

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
    cone,
)
from pvtrace_tpu.data import lumogen_f_red_305
from pvtrace_tpu.diff.transport import fate_gradients
from pvtrace_tpu.light.event import Event
from pvtrace_tpu.light.light import ConstantWavelengthMask
from pvtrace_tpu.material.surface import NullSurfaceDelegate, Surface


def slab_scene(alpha):
    """Collimated light through a null-surface slab: no reflection, no
    refraction — P(absorb) = 1 - exp(-alpha * L) exactly."""
    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    Node(
        name="slab",
        parent=world,
        geometry=Box(
            (2.0, 2.0, 1.0),
            material=Material(
                refractive_index=1.0,
                surface=Surface(delegate=NullSurfaceDelegate()),
                components=[Absorber(alpha)],
            ),
        ),
    )
    light = Node(
        name="light",
        parent=world,
        light=Light(wavelength=ConstantWavelengthMask(555.0)),
    )
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def lsc_scene(scale_dye=1.0, scale_bg=1.0):
    x = np.arange(400, 801, dtype=float)
    world = Node(
        name="world",
        geometry=Sphere(radius=25.0, material=Material(refractive_index=1.0)),
    )
    Node(
        name="lsc",
        parent=world,
        geometry=Box(
            (5.0, 5.0, 1.0),
            material=Material(
                refractive_index=1.5,
                components=[
                    Luminophore(
                        np.column_stack(
                            (x, scale_dye * 10 * lumogen_f_red_305.absorption(x))
                        ),
                        emission=np.column_stack(
                            (x, lumogen_f_red_305.emission(x))
                        ),
                        quantum_yield=0.9,
                    ),
                    Absorber(0.3 * scale_bg),
                ],
            ),
        ),
    )
    light = Node(
        name="light",
        parent=world,
        light=Light(
            direction=functools.partial(cone, np.radians(20)),
            wavelength=ConstantWavelengthMask(555.0),
        ),
    )
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def test_score_gradient_matches_analytic_slab():
    alpha, L = 0.8, 1.0
    N = 120_000
    fractions, gradients = fate_gradients(
        slab_scene(alpha), N, seed=7, dtype=np.float64
    )
    p_abs = 1.0 - np.exp(-alpha * L)
    dp_dlog = alpha * L * np.exp(-alpha * L)  # d/d log(scale) at scale=1

    sigma_p = np.sqrt(p_abs * (1 - p_abs) / N)
    assert abs(fractions[Event.NONRADIATIVE] - p_abs) < 5 * sigma_p

    # Score estimator variance for the single-pass slab is O(1)/N
    assert abs(gradients[Event.NONRADIATIVE][0] - dp_dlog) < 0.02
    assert abs(gradients[Event.EXIT][0] + dp_dlog) < 0.02


@pytest.mark.slow
def test_score_gradient_matches_finite_differences_lsc():
    N = 150_000
    _, gradients = fate_gradients(lsc_scene(), N, seed=5, dtype=np.float64)

    # Central FD on log-scale of the BACKGROUND absorber (largest,
    # least-noisy gradient), common random numbers.
    delta = 0.1
    fp, _ = fate_gradients(
        lsc_scene(scale_bg=np.exp(delta)), N, seed=5, dtype=np.float64
    )
    fm, _ = fate_gradients(
        lsc_scene(scale_bg=np.exp(-delta)), N, seed=5, dtype=np.float64
    )
    for event in (Event.EXIT, Event.NONRADIATIVE):
        fd = (fp[event] - fm[event]) / (2 * delta)
        assert abs(gradients[event][1] - fd) < 0.03, (event, fd)

    # Gradients over all fates sum to ~0 (total probability is 1)
    total = sum(g for g in gradients.values())
    assert np.all(np.abs(total) < 0.02)


def test_score_zero_for_unscaled_paths():
    # A photon that never enters the absorbing node carries zero score:
    # fate NO_HIT / EXIT-without-absorber contributions must not leak.
    scene = slab_scene(1e-9)  # essentially transparent
    fractions, gradients = fate_gradients(scene, 20_000, seed=1,
                                          dtype=np.float64)
    assert fractions[Event.EXIT] > 0.99
    assert np.all(np.abs(gradients[Event.EXIT]) < 1e-6)


def fresnel_slab_scene(n_slab=1.5, alpha=0.5):
    """Collimated normal-incidence light on a Fresnel slab with an
    absorber: every surface coin is R = ((n-1)/(n+1))^2 and the path
    geometry is independent of n, so d(fate)/dn is analytic."""
    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    Node(
        name="slab",
        parent=world,
        geometry=Box(
            (2.0, 2.0, 1.0),
            material=Material(
                refractive_index=n_slab,
                components=[Absorber(alpha)],
            ),
        ),
    )
    light = Node(
        name="light",
        parent=world,
        light=Light(wavelength=ConstantWavelengthMask(555.0)),
    )
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def test_refractive_index_gradient_matches_analytic():
    """d P(NONRADIATIVE) / d n_slab on the normal-incidence slab.

    P(R) = (1-R)(1-T)/(1-RT) with T = exp(-alpha L); every coin is
    R(n) = ((n-1)/(n+1))^2, so dP/dn = dP/dR * dR/dn exactly (the
    transmitted geometry is n-independent at normal incidence)."""
    n_slab, alpha, L = 1.5, 0.5, 1.0
    N = 200_000
    fractions, grads = fate_gradients(
        fresnel_slab_scene(n_slab, alpha), N, seed=3,
        wrt="refractive_index", dtype=np.float64,
    )
    R = ((n_slab - 1) / (n_slab + 1)) ** 2
    T = np.exp(-alpha * L)
    p_abs = (1 - R) * (1 - T) / (1 - R * T)
    dR_dn = 4 * (n_slab - 1) / (n_slab + 1) ** 3
    dP_dR = -((1 - T) ** 2) / (1 - R * T) ** 2
    expect = dP_dR * dR_dn

    sigma = np.sqrt(p_abs * (1 - p_abs) / N)
    assert abs(fractions[Event.NONRADIATIVE] - p_abs) < 5 * sigma

    # channel layout: one channel per node, preorder (world, slab, light)
    got = grads[Event.NONRADIATIVE][1]
    assert abs(got - expect) < 0.005, (got, expect)
    # EXIT picks up the opposite sign (probabilities sum to 1)
    assert abs(grads[Event.EXIT][1] + expect) < 0.005


def test_cylinder_chord_matches_analytic():
    """absorbed_fraction_fn supports cylinders: axial chord = length,
    radial chord through the axis = 2 * radius."""
    import jax.numpy as jnp

    from pvtrace_tpu.engine.compiler import compile_scene
    from pvtrace_tpu.diff.transport import absorbed_fraction_fn
    from pvtrace_tpu.geometry.cylinder import Cylinder

    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    Node(
        name="rod",
        parent=world,
        geometry=Cylinder(
            length=2.0, radius=0.5,
            material=Material(
                refractive_index=1.0, components=[Absorber(0.7)]
            ),
        ),
    )
    Node(name="light", parent=world, light=Light())
    compiled = compile_scene(Scene(world))
    weight = absorbed_fraction_fn(compiled)

    params = {"log_concentration": jnp.asarray(0.0)}
    pos = jnp.asarray(
        [[0.0, 0.0, -5.0],   # axial, through both caps
         [-5.0, 0.0, 0.0],   # radial, through the axis
         [-5.0, 0.0, 5.0]],  # misses entirely
        jnp.float32,
    )
    dirs = jnp.asarray(
        [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32
    )
    wav = jnp.asarray([555.0, 555.0, 555.0], jnp.float32)
    got = np.asarray(weight(params, pos, dirs, wav))
    expect = np.array(
        [1 - np.exp(-0.7 * 2.0), 1 - np.exp(-0.7 * 1.0), 0.0]
    )
    np.testing.assert_allclose(got, expect, atol=2e-4)


@pytest.mark.slow
def test_lsc_gradient_matches_finite_differences():
    """LSC.gradient (d optical-efficiency / d log dye concentration)
    vs central finite differences with common random numbers."""
    from pvtrace_tpu.device.lsc import LSC

    x = np.arange(400, 801, dtype=float)

    def make(scale):
        lsc = LSC((5.0, 5.0, 1.0))
        lsc.add_luminophore(
            "dye",
            np.column_stack(
                (x, scale * 5.0 * lumogen_f_red_305.absorption(x))
            ),
            np.column_stack((x, lumogen_f_red_305.emission(x))),
            quantum_yield=0.9,
        )
        lsc.add_absorber("bg", 0.1)
        lsc.add_solar_cell({"left", "right", "near", "far"})
        return lsc

    N = 150_000
    base = make(1.0).gradient(n=N, seed=11, component="dye")
    assert 0.0 < base["optical_efficiency"] < 1.0

    delta = 0.15
    hi = make(np.exp(delta)).gradient(n=N, seed=11, component="dye")
    lo = make(np.exp(-delta)).gradient(n=N, seed=11, component="dye")
    fd = (hi["optical_efficiency"] - lo["optical_efficiency"]) / (2 * delta)
    assert abs(base["gradient"] - fd) < 0.02, (base["gradient"], fd)


def test_absorbed_fraction_sums_over_absorbing_nodes():
    """Two index-matched slabs in series: the first-pass estimator's
    optical depth is the sum of both Beer-Lambert contributions."""
    import jax.numpy as jnp

    from pvtrace_tpu.diff.transport import absorbed_fraction_fn
    from pvtrace_tpu.engine.compiler import compile_scene

    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    for name, z, alpha in (("a", -1.0, 0.6), ("b", 1.0, 0.9)):
        slab = Node(
            name=name,
            parent=world,
            geometry=Box(
                (2.0, 2.0, 1.0),
                material=Material(
                    refractive_index=1.0,
                    surface=Surface(delegate=NullSurfaceDelegate()),
                    components=[Absorber(alpha)],
                ),
            ),
        )
        slab.translate((0.0, 0.0, z))
    Node(name="light", parent=world, light=Light())
    compiled = compile_scene(Scene(world))

    weight = absorbed_fraction_fn(compiled)
    params = {"log_concentration": jnp.asarray(0.0)}
    pos = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    wav = jnp.asarray([555.0], jnp.float32)
    got = float(weight(params, pos, dirs, wav)[0])
    expect = 1.0 - np.exp(-(0.6 * 1.0 + 0.9 * 1.0))
    assert abs(got - expect) < 2e-4, (got, expect)


def tilted_fresnel_slab(n_slab=1.5, alpha=0.5, tilt_deg=30.0):
    """Oblique incidence on a Fresnel absorber slab. Both the Fresnel
    coin AND the internal chord length depend on n (Snell bending), so
    d(fate)/dn requires the pathwise term the likelihood-only channel
    misses."""
    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    slab = Node(
        name="slab",
        parent=world,
        geometry=Box(
            (4.0, 4.0, 1.0),
            material=Material(
                refractive_index=n_slab, components=[Absorber(alpha)]
            ),
        ),
    )
    slab.rotate(np.radians(tilt_deg), (1, 0, 0))
    light = Node(
        name="light",
        parent=world,
        light=Light(wavelength=ConstantWavelengthMask(555.0)),
    )
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def _oblique_analytic(n, theta0, alpha, L):
    """P(absorb) and dP/dn for the tilted slab (multiple internal
    reflections at constant angle)."""
    s, c1 = np.sin(theta0), np.cos(theta0)

    def P(n):
        st = s / n
        ct = np.sqrt(1 - st * st)
        rs = ((c1 - n * ct) / (c1 + n * ct)) ** 2
        rp = ((ct - n * c1) / (ct + n * c1)) ** 2
        R = 0.5 * (rs + rp)
        T = np.exp(-alpha * L / ct)
        return (1 - R) * (1 - T) / (1 - R * T)

    h = 1e-6
    return P(n), (P(n + h) - P(n - h)) / (2 * h)


@pytest.mark.slow
def test_pathwise_n_gradient_oblique_incidence():
    """The hybrid pathwise channel recovers the FULL d(fate)/dn at 30
    degrees incidence — Fresnel coin term plus the Snell chord term
    (the likelihood-only 'refractive_index' channel gets only ~half)."""
    n_slab, alpha, L, tilt = 1.5, 0.5, 1.0, np.radians(30.0)
    p_true, dp_true = _oblique_analytic(n_slab, tilt, alpha, L)

    N = 100_000
    fr, gr = fate_gradients(
        tilted_fresnel_slab(n_slab, alpha, np.degrees(tilt)), N, seed=3,
        wrt="pathwise", pathwise=[("n", "slab")], dtype=np.float64,
    )
    sigma_p = np.sqrt(p_true * (1 - p_true) / N)
    assert abs(fr[Event.NONRADIATIVE] - p_true) < 5 * sigma_p
    assert abs(gr[Event.NONRADIATIVE][0] - dp_true) < 0.006, (
        gr[Event.NONRADIATIVE][0], dp_true,
    )
    # EXIT picks up the opposite derivative (fates sum to 1)
    assert abs(gr[Event.EXIT][0] + dp_true) < 0.008


def test_pathwise_geometry_gradient_matches_analytic():
    """d P(absorb) / d slab-thickness on the normal-incidence slab,
    index-matched (P = 1 - e^{-aL}) and Fresnel (geometric series)."""
    alpha, L = 0.8, 1.0
    N = 100_000

    def slab(fresnel):
        world = Node(
            name="world",
            geometry=Sphere(
                radius=10.0, material=Material(refractive_index=1.0)
            ),
        )
        mat = Material(
            refractive_index=(1.5 if fresnel else 1.0),
            surface=(
                Surface() if fresnel else Surface(delegate=NullSurfaceDelegate())
            ),
            components=[Absorber(alpha)],
        )
        Node(name="slab", parent=world, geometry=Box((2.0, 2.0, L), material=mat))
        light = Node(
            name="light",
            parent=world,
            light=Light(wavelength=ConstantWavelengthMask(555.0)),
        )
        light.translate((0.0, 0.0, 3.0))
        light.rotate(np.radians(180), (1, 0, 0))
        return Scene(world)

    _, gr = fate_gradients(
        slab(False), N, seed=3, wrt="pathwise",
        pathwise=[("size", "slab", 2)], dtype=np.float64,
    )
    expect = alpha * np.exp(-alpha * L)
    assert abs(gr[Event.NONRADIATIVE][0] - expect) < 0.005, (
        gr[Event.NONRADIATIVE][0], expect,
    )

    R = ((1.5 - 1) / (1.5 + 1)) ** 2
    T = np.exp(-alpha * L)
    expect_f = -((1 - R) ** 2) / (1 - R * T) ** 2 * (-alpha * T)
    _, gr2 = fate_gradients(
        slab(True), N, seed=3, wrt="pathwise",
        pathwise=[("size", "slab", 2)], dtype=np.float64,
    )
    assert abs(gr2[Event.NONRADIATIVE][0] - expect_f) < 0.005, (
        gr2[Event.NONRADIATIVE][0], expect_f,
    )


@pytest.mark.slow
def test_pathwise_gradients_survive_regeneration_and_streaming():
    """Pathwise channels are pure functions of (seed, photon id): lane
    regeneration and exact-union streaming must not change the
    estimate (same contract as the tallies)."""
    scene = tilted_fresnel_slab()
    N = 20_000
    kw = dict(
        wrt="pathwise", pathwise=[("n", "slab")], dtype=np.float64, seed=9,
    )
    f_full, g_full = fate_gradients(scene, N, bundle=None, **kw)
    f_regen, g_regen = fate_gradients(scene, N, bundle=None, lanes=2048, **kw)
    f_stream, g_stream = fate_gradients(scene, N, bundle=5_000, **kw)
    for event in (Event.EXIT, Event.NONRADIATIVE):
        assert f_full[event] == f_regen[event] == f_stream[event]
        np.testing.assert_allclose(
            g_regen[event], g_full[event], rtol=0, atol=1e-9
        )
        np.testing.assert_allclose(
            g_stream[event], g_full[event], rtol=0, atol=1e-9
        )


def test_score_centering_is_unbiased_on_analytic_slab():
    """Centering subtracts p_fate * mean(score) (zero expectation): the
    analytic slab gradient must be unchanged within noise but the
    EXIT/NONRADIATIVE rows must be exact negatives of each other."""
    alpha, L = 0.8, 1.0
    N = 60_000
    _, grads = fate_gradients(
        slab_scene(alpha), N, seed=7, dtype=np.float64, center=True
    )
    dp_dlog = alpha * L * np.exp(-alpha * L)
    assert abs(grads[Event.NONRADIATIVE][0] - dp_dlog) < 0.03
    # exact probability conservation after centering (two-fate scene)
    np.testing.assert_allclose(
        grads[Event.NONRADIATIVE][0], -grads[Event.EXIT][0], atol=1e-12
    )


def test_lsc_gradient_parameter_channels(monkeypatch):
    """LSC.gradient(wrt='n'/'thickness') must resolve the right hybrid
    pathwise channel and read the appended score column. Full-physics
    FD agreement is chip-validated (docs/VALIDATION.md Result 3b:
    8.4e-4 at 2e7 photons for d/dn); here the engine is stubbed so the
    wiring is checked without a device compile."""
    import pvtrace_tpu.engine.api as api_module
    from pvtrace_tpu.device.lsc import LSC
    from pvtrace_tpu.engine.compiler import compile_scene

    x = np.arange(400, 801, dtype=float)
    lsc = LSC((5.0, 5.0, 1.0))
    lsc.add_luminophore(
        "dye",
        np.column_stack((x, 5.0 * lumogen_f_red_305.absorption(x))),
        np.column_stack((x, lumogen_f_red_305.emission(x))),
        quantum_yield=0.9,
    )
    lsc.add_absorber("bg", 0.1)
    lsc.add_solar_cell({"left", "right", "near", "far"})

    captured = {}

    class FakeResult:
        pass

    def fake_simulate(scene, n_call, seed=None, index_offset=0,
                      record_every=0, score=False, pathwise=(), **kw):
        compiled = compile_scene(scene)
        captured["pathwise"] = pathwise
        captured["compiled"] = compiled
        result = FakeResult()
        result.compiled = compiled
        R = compiled.n_recorders
        CH = compiled.n_components + len(compiled.nodes) + len(pathwise)
        distinct = np.zeros(R)
        scores = np.zeros((R, CH))
        order = [spec.name for spec in compiled.recorder_specs]
        distinct[order.index("__incident")] = n_call
        cell = order.index("__cell_left")
        distinct[cell] = 0.25 * n_call
        # put a recognisable score only in the LAST (pathwise) column
        scores[cell, -1] = 0.125 * n_call
        result.data = {"rec_distinct": distinct, "rec_scores": scores}
        return result

    monkeypatch.setattr(api_module, "simulate", fake_simulate)
    import pvtrace_tpu.device.lsc as lsc_module
    out = lsc.gradient(n=10_000, seed=1, wrt="thickness")
    spec = captured["pathwise"]
    compiled = captured["compiled"]
    node = compiled.node_names.index("LSC")
    assert spec == (("geom", node, 2),)
    assert out["component"] == "thickness"
    # gradient = d_collected/incident (d_incident = 0 here)
    np.testing.assert_allclose(out["gradient"], 0.125)

    out = lsc.gradient(n=10_000, seed=1, wrt="n")
    assert captured["pathwise"] == (("n", node),)
