"""Nested rotated coordinate frames (reference examples/nested_cylinders.py):
a cylinder inside a rotated cylinder inside a world sphere."""
import numpy as np

from pvtrace_tpu import (
    Cylinder,
    Light,
    Material,
    Node,
    Scene,
    photon_tracer,
    Sphere,
)

world = Node(
    name="world",
    geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
)
outer = Node(
    name="outer",
    geometry=Cylinder(length=2.0, radius=1.0, material=Material(refractive_index=1.5)),
    parent=world,
)
outer.rotate(np.radians(30), (1, 0, 0))
inner = Node(
    name="inner",
    geometry=Cylinder(length=1.0, radius=0.5, material=Material(refractive_index=1.6)),
    parent=outer,
)
inner.rotate(np.radians(20), (0, 1, 0))

light = Node(name="light", light=Light(), parent=world)
light.translate((0.0, 0.0, -5.0))

scene = Scene(world)
np.random.seed(1)
for ray in scene.emit(10):
    history = photon_tracer.follow(scene, ray)
    print([e.name for _, e in history])
