"""Per-node forward-hit tolerance regression test.

A scene-wide f32 eps scaled to the LARGEST node silently filtered real
hits on thin features (a lamp 0.01 cm above a slab inside a 100x world
sphere lost its first-surface Fresnel reflection entirely). Tolerances
must scale per node with that node's own local extent because
intersections are solved in local frames.
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
from pvtrace_tpu.light.event import Event
from pvtrace_tpu.light.light import ConstantWavelengthMask, RectangularMask


def thin_gap_scene():
    # Huge world (radius 240) with a thin slab and a lamp only 0.01
    # above the surface - the configuration that broke the global eps.
    world = Node(
        name="world",
        geometry=Sphere(radius=240.0, material=Material(refractive_index=1.0)),
    )
    Node(
        name="slab",
        parent=world,
        geometry=Box(
            (4.8, 1.8, 0.25),
            material=Material(refractive_index=1.5, components=[Absorber(0.02)]),
        ),
    )
    light = Node(
        name="light",
        parent=world,
        light=Light(
            wavelength=ConstantWavelengthMask(555.0),
            position=RectangularMask(2.4, 0.9),
        ),
    )
    light.translate((0.0, 0.0, 0.125 + 0.01))
    light.rotate(np.radians(180), (1, 0, 0))
    return Scene(world)


def test_per_node_eps_resolves_thin_features():
    compiled = engine.compile_scene(thin_gap_scene())
    eps = compiled.resolved_eps_per_node(np.float32)
    names = list(compiled.node_names)
    assert eps[names.index("slab")] < 0.01 / 10, eps
    assert eps[names.index("world")] > eps[names.index("slab")]


def test_first_surface_reflection_survives_f32():
    scene = thin_gap_scene()
    N = 100_000
    result = engine.simulate(scene, N, seed=3, record_every=0,
                             dtype=np.float32)
    fates = result.fate_counts()
    assert sum(fates.values()) == N
    # Normal incidence on n=1.5: R = 0.04. Count rays whose FIRST
    # interaction reflects them straight back out: they EXIT without
    # entering the slab, so exit fraction of a pure absorber slab =
    # R + (1-R)^2*T_through... here simply check R is present via the
    # reflected recorder.
    from pvtrace_tpu.engine.recorder import Recorder

    box = next(n for n in scene.root.iter_preorder() if n.name == "slab")
    box.recorders = [Recorder("r", event="reflected", facet=(0, 0, 1))]
    result = engine.simulate(scene, N, seed=3, record_every=0,
                             dtype=np.float32)
    frac = result.recorders["r"].rays / N
    sigma = np.sqrt(0.04 * 0.96 / N)
    assert abs(frac - 0.04) < 5 * sigma, frac
