"""Glass cylinder hit by a laser — the reference's cylinder example
(examples/cylinder.py), traced on the device engine with recorders."""
import numpy as np

from pvtrace_tpu import (
    Cylinder,
    Light,
    Material,
    Node,
    Scene,
    Sphere,
    engine,
)
from pvtrace_tpu.engine.recorder import Histogram, Recorder
from pvtrace_tpu.light.light import ConstantWavelengthMask

world = Node(
    name="world (air)",
    geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
)
cylinder = Node(
    name="cylinder (glass)",
    geometry=Cylinder(
        length=1.0, radius=1.0, material=Material(refractive_index=1.5)
    ),
    parent=world,
)
cylinder.recorders = [
    Recorder(
        "entering",
        event="entering",
        histograms=[Histogram("angle", 0.0, np.pi / 2, 18)],
    ),
    Recorder("escaping", event="escaping"),
]
laser = Node(
    name="laser (555nm)",
    light=Light(wavelength=ConstantWavelengthMask(555.0)),
    parent=world,
)
laser.translate((0.0, 0.0, 2.0))
laser.rotate(np.radians(180), (1, 0, 0))

scene = Scene(world)
result = engine.simulate(scene, 100_000, seed=0, record_every=0)
print("fates:", dict(result.fate_counts()))
for name, recorder in result.recorders.items():
    print(f"{name}: {recorder.rays} rays, {recorder.crossings} crossings")
