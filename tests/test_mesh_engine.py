"""Device-engine mesh tracing tests (beyond-reference capability).

The reference engine REJECTS meshes (``engine/compiler.py:53``) and
falls back to its slow per-ray tracer. pvtrace_tpu compiles them:
triangle tables are baked as constants and the wavefront intersects
them with a fixed-trip Möller–Trumbore loop. Validated here against
(1) the analytic Box result — a cube mesh must trace identically to a
Box up to MC error — and (2) the per-ray oracle tracer on the same
mesh scene.
"""
import numpy as np

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
from pvtrace_tpu.algorithm import photon_tracer
from pvtrace_tpu.geometry.mesh import Mesh
from pvtrace_tpu.light.event import Event
from pvtrace_tpu.light.light import ConstantWavelengthMask, RectangularMask


def cube_mesh(size=1.0):
    h = size / 2.0
    v = np.array(
        [
            [-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
            [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h],
        ]
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],  # y min
            [2, 3, 7], [2, 7, 6],  # y max
            [1, 2, 6], [1, 6, 5],  # x max
            [3, 0, 4], [3, 4, 7],  # x min
        ]
    )
    return v, f


def make_scene(geometry):
    world = Node(
        name="world",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    Node(name="slab", parent=world, geometry=geometry)
    light = Node(
        name="light",
        parent=world,
        light=Light(
            wavelength=ConstantWavelengthMask(555.0),
            position=RectangularMask(0.3, 0.3),
        ),
    )
    light.translate((0.0, 0.0, 2.0))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def material():
    return Material(refractive_index=1.5, components=[Absorber(0.8)])


def test_mesh_cube_matches_analytic_box():
    N = 40000
    v, f = cube_mesh(1.0)
    scene_mesh = make_scene(Mesh((v, f), material=material()))
    scene_box = make_scene(Box((1.0, 1.0, 1.0), material=material()))

    r_mesh = engine.simulate(scene_mesh, N, seed=5, record_every=0)
    r_box = engine.simulate(scene_box, N, seed=5, record_every=0)
    fm = r_mesh.fate_counts()
    fb = r_box.fate_counts()
    assert sum(fm.values()) == N
    # Identical key streams + identical geometry semantics: the cube
    # mesh IS the box, so fates must agree exactly up to grazing-edge
    # cases (shared triangle edges) — allow a tiny discrepancy.
    for event in (Event.EXIT, Event.NONRADIATIVE):
        assert abs(fm.get(event, 0) - fb.get(event, 0)) <= max(
            3, 0.001 * N
        ), (event, fm, fb)


def test_mesh_engine_matches_oracle():
    v, f = cube_mesh(1.0)
    scene = make_scene(Mesh((v, f), material=material()))
    N = 30000
    result = engine.simulate(scene, N, seed=9, record_every=0)
    fates = result.fate_counts()
    p_engine = fates.get(Event.NONRADIATIVE, 0) / N

    np.random.seed(2)
    n2 = 800
    absorbed = 0
    for ray in scene.emit(n2):
        history = photon_tracer.follow(scene, ray)
        if history[-1][1] == Event.NONRADIATIVE:
            absorbed += 1
    p_oracle = absorbed / n2
    p = (fates.get(Event.NONRADIATIVE, 0) + absorbed) / (N + n2)
    z = abs(p_engine - p_oracle) / np.sqrt(
        max(p * (1 - p) * (1 / N + 1 / n2), 1e-12)
    )
    assert z < 5, (p_engine, p_oracle, z)


def test_mesh_regeneration_and_recorders():
    from pvtrace_tpu.engine.recorder import Recorder

    v, f = cube_mesh(1.0)
    mesh = Mesh((v, f), material=material())
    scene = make_scene(mesh)
    slab = next(n for n in scene.root.iter_preorder() if n.name == "slab")
    slab.recorders = [
        Recorder("top-escape", event="escaping", facet=(0, 0, 1)),
        Recorder("lost", event="lost"),
    ]
    r1 = engine.simulate(scene, 16000, seed=4, record_every=0, lanes=4096)
    r2 = engine.simulate(scene, 16000, seed=4, record_every=0, lanes=None)
    assert r1.fate_counts() == r2.fate_counts()
    a, b = r1.recorders, r2.recorders
    assert a["lost"].rays == b["lost"].rays
    assert a["top-escape"].rays == b["top-escape"].rays
    assert a["top-escape"].rays > 0


def test_mesh_lsc_coated_device_vs_oracle():
    """BASELINE config #5 at test scale: hexagonal MESH plate with a
    back-surface mirror + six edge solar cells (facet overrides), dye
    re-absorption. Device fates must match the oracle tracer and the
    six cells must collect symmetrically."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from mesh_lsc import build_mesh_lsc

    from pvtrace_tpu.algorithm import photon_tracer

    scene = build_mesh_lsc()
    N = 12000
    result = engine.simulate(scene, N, seed=5, record_every=0)
    fates = result.fate_counts()
    assert set(fates) <= {Event.EXIT, Event.NONRADIATIVE, Event.KILL}
    p_engine = fates.get(Event.NONRADIATIVE, 0) / N

    n2 = 400
    np.random.seed(21)
    absorbed = 0
    for ray in scene.emit(n2):
        history = photon_tracer.follow(scene, ray)
        if history[-1][1] == Event.NONRADIATIVE:
            absorbed += 1
    p_oracle = absorbed / n2
    p = (fates.get(Event.NONRADIATIVE, 0) + absorbed) / (N + n2)
    z = abs(p_engine - p_oracle) / np.sqrt(
        max(p * (1 - p) * (1 / N + 1 / n2), 1e-12)
    )
    assert z < 5, (p_engine, p_oracle, z)

    # Six-fold symmetry of the edge collection (chi-square-ish bound)
    cells = np.array(
        [result.recorders[f"cell_{i}"].rays for i in range(6)], float
    )
    assert cells.sum() > 0
    expected = cells.sum() / 6.0
    assert np.all(np.abs(cells - expected) < 6 * np.sqrt(expected)), cells
    # The mirror means nothing escapes through the bottom: a bottom
    # 'escaping' recorder would be empty — covered implicitly by the
    # cells + incident bookkeeping.
    assert result.recorders["incident"].rays > 0.9 * N
