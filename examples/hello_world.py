"""Hello world: a glass ball in air, lit by a cone laser.

Counterpart of the reference's examples/hello_world.py — traces a few
rays with the oracle tracer and renders scene + paths to HTML.
"""
import functools

import numpy as np

from pvtrace_tpu import (
    Light,
    Material,
    Node,
    Scene,
    Sphere,
    cone,
    photon_tracer,
)
from pvtrace_tpu.scene.renderer import SceneRenderer

world = Node(
    name="world (air)",
    geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
)
ball_lens = Node(
    name="ball-lens (glass)",
    geometry=Sphere(radius=1.0, material=Material(refractive_index=1.5)),
    parent=world,
)
green_laser = Node(
    name="green-laser",
    light=Light(direction=functools.partial(cone, np.pi / 8), name="green-laser"),
    parent=world,
)
green_laser.translate((0.0, 0.0, -5.0))

scene = Scene(world)
renderer = SceneRenderer()
renderer.render(scene)

np.random.seed(0)
for ray in scene.emit(20):
    history = photon_tracer.follow(scene, ray)
    print([event.name for _, event in history])
    renderer.add_history(history)

path = renderer.save("hello_world.html")
print(f"Rendered to {path}")
