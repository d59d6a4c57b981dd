"""Glass box illuminated at an angle — the reference's hello_box
(examples/hello_box.py) on the per-ray oracle tracer."""
import numpy as np

from pvtrace_tpu import Box, Light, Material, Node, Scene, Sphere
from pvtrace_tpu.algorithm import photon_tracer

world = Node(
    name="world (air)",
    geometry=Sphere(radius=50.0, material=Material(refractive_index=1.0)),
)
box = Node(
    name="box (glass)",
    geometry=Box((10.0, 10.0, 1.0), material=Material(refractive_index=1.5)),
    parent=world,
)
light = Node(name="Light (555nm)", light=Light(), parent=world)
light.rotate(np.radians(60), (1.0, 0.0, 0.0))

scene = Scene(world)
np.random.seed(0)
for ray in scene.emit(100):
    history = photon_tracer.follow(scene, ray)
    rays, events = zip(*history)
    print([e.name for e in events])
