"""Oracle tracer behaviour tests.

Mirrors reference tests/test_refractored_tracer.py: seeded scenes with
expected event sequences — but pinned to *distributions and event
logic*, not to the reference RNG stream.
"""
import numpy as np
import pytest

from pvtrace_tpu import (
    Absorber,
    Box,
    Event,
    Light,
    Luminophore,
    Material,
    Node,
    Reactor,
    Scatterer,
    Scene,
    Sphere,
    photon_tracer,
)
from pvtrace_tpu.material.surface import NullSurfaceDelegate, Surface


def make_embedded_scene(n1=1.5, size=1.0):
    world = Node(
        name="world (air)",
        geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
    )
    box = Node(
        name="box (glass)",
        geometry=Box((size, size, size), material=Material(refractive_index=n1)),
        parent=world,
    )
    light = Node(name="light", light=Light(), parent=world)
    light.translate((0.0, 0.0, -5.0))
    return Scene(world), world, box, light


def make_lossy_scene(absorption=10000.0):
    scene, world, box, light = make_embedded_scene()
    box.geometry.material.components.append(Absorber(absorption, name="absorber"))
    return scene, world, box, light


def make_reactor_scene(absorption=10000.0):
    scene, world, box, light = make_embedded_scene()
    box.geometry.material.components.append(Reactor(absorption, name="reactor"))
    return scene, world, box, light


class TestFindContainer:
    def test_single_intersection(self):
        scene, world, box, light = make_embedded_scene()
        hits = scene.intersections((0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
        # From inside the box: box exit + world exit
        container = photon_tracer.find_container(hits)
        assert container is box

    def test_outside_box(self):
        scene, world, box, light = make_embedded_scene()
        hits = scene.intersections((0.0, 0.0, -5.0), (0.0, 0.0, 1.0))
        container = photon_tracer.find_container(hits)
        assert container is world

    def test_touching_boxes(self):
        world = Node(
            name="world",
            geometry=Sphere(radius=50.0, material=Material(refractive_index=1.0)),
        )
        a = Node(
            name="a",
            geometry=Box((1, 1, 1), material=Material(refractive_index=1.5)),
            parent=world,
        )
        b = Node(
            name="b",
            geometry=Box((1, 1, 1), material=Material(refractive_index=1.5)),
            parent=world,
        )
        b.translate((0.0, 0.0, 1.0))
        scene = Scene(world)
        # Inside box a looking towards b
        hits = scene.intersections((0.0, 0.0, 0.0), (0.0, 0.0, 1.0))
        hits = [h for h in hits if h.distance > 1e-10]
        assert photon_tracer.find_container(hits) is a


class TestFollow:
    def test_transparent_box(self):
        np.random.seed(0)
        scene, world, box, light = make_embedded_scene()
        counts = {"EXIT": 0, "REFLECT": 0}
        for ray in scene.emit(50):
            events = [e.name for _, e in photon_tracer.follow(scene, ray)]
            assert events[0] == "GENERATE"
            assert events[-1] == "EXIT"
            for e in events:
                counts[e] = counts.get(e, 0) + 1
        # Normal incidence on glass: 4% reflections expected sometimes
        assert counts["EXIT"] == 50

    def test_lossy_box_ends_nonradiative(self):
        np.random.seed(0)
        scene, world, box, light = make_lossy_scene()
        for ray in scene.emit(20):
            history = photon_tracer.follow(scene, ray)
            events = [e.name for _, e in history]
            # Huge absorption: every ray entering is absorbed.
            if "TRANSMIT" in events:
                assert events[-1] == "NONRADIATIVE"
                assert "ABSORB" in events

    def test_absorption_depth_distribution(self):
        np.random.seed(0)
        alpha = 5.0
        scene, world, box, light = make_lossy_scene(absorption=alpha)
        depths = []
        for ray in scene.emit(600):
            history = list(photon_tracer.step_forward(scene, ray))
            for ray_, event, meta in history:
                if event == Event.ABSORB:
                    # depth from box entry at z=-0.5
                    depths.append(ray_.position[2] + 0.5)
        depths = np.array(depths)
        assert len(depths) > 300
        # Truncated exponential on [0, 1): E[d] = 1/a - e^-a/(1-e^-a)
        expected = 1 / alpha - np.exp(-alpha) / (1 - np.exp(-alpha))
        assert np.isclose(depths.mean(), expected, atol=3 * depths.std() / np.sqrt(len(depths)))

    def test_reactor_ends_react(self):
        np.random.seed(0)
        scene, world, box, light = make_reactor_scene()
        for ray in scene.emit(10):
            history = photon_tracer.follow(scene, ray)
            events = [e.name for _, e in history]
            if "TRANSMIT" in events:
                assert events[-1] == "REACT"

    def test_luminophore_emits(self):
        np.random.seed(0)
        scene, world, box, light = make_embedded_scene()
        x = np.linspace(400, 800, 200)
        lum = Luminophore(
            coefficient=np.column_stack((x, np.full_like(x, 1000.0))),
            emission=np.column_stack((x, np.exp(-(((600.0 - x) / 40.0) ** 2)))),
            quantum_yield=1.0,
            name="lum",
        )
        box.geometry.material.components.append(lum)
        emitted = 0
        for ray in scene.emit(20):
            events = [e.name for _, e in photon_tracer.follow(scene, ray)]
            if "EMIT" in events:
                emitted += 1
        assert emitted > 10

    def test_emitted_wavelength_redshifts(self):
        np.random.seed(0)
        scene, world, box, light = make_embedded_scene()
        x = np.linspace(400, 800, 200)
        lum = Luminophore(
            coefficient=np.column_stack((x, np.full_like(x, 1000.0))),
            emission=np.column_stack((x, np.exp(-(((600.0 - x) / 40.0) ** 2)))),
            quantum_yield=1.0,
            name="lum",
        )
        box.geometry.material.components.append(lum)
        for ray in scene.emit(20):
            history = list(photon_tracer.step_forward(scene, ray, emit_method="redshift"))
            prev_wavelength = None
            for ray_, event, meta in history:
                if event == Event.ABSORB:
                    prev_wavelength = ray_.wavelength
                if event == Event.EMIT and prev_wavelength is not None:
                    assert ray_.wavelength >= prev_wavelength - 1e-9

    def test_maxsteps_kills(self):
        np.random.seed(0)
        scene, world, box, light = make_embedded_scene()
        for ray in scene.emit(2):
            history = photon_tracer.follow(scene, ray, maxsteps=1)
            assert history[-1][1] == Event.KILL

    def test_null_surface_always_transmits(self):
        np.random.seed(0)
        scene, world, box, light = make_embedded_scene()
        box.geometry.material.surface = Surface(delegate=NullSurfaceDelegate())
        for ray in scene.emit(20):
            events = [e.name for _, e in photon_tracer.follow(scene, ray)]
            assert "REFLECT" not in events
            assert events[-1] == "EXIT"

    def test_time_of_flight(self):
        np.random.seed(0)
        scene, world, box, light = make_embedded_scene()
        box.geometry.material.surface = Surface(delegate=NullSurfaceDelegate())
        for ray in scene.emit(1):
            history = photon_tracer.follow(scene, ray)
            final = history[-1][0]
            # travelled: 5 - 0.5 into the box... full path light z=-5 to
            # world exit at z=+10 => 15 cm; 1 cm through glass n=1.5
            assert np.isclose(final.travelled, 15.0)
            c = 299792458.0 * 100.0
            expected = (14.0 * 1.0 + 1.0 * 1.5) / c
            assert np.isclose(final.duration, expected)
