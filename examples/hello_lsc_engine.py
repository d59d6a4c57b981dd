"""An LSC slab traced with the device engine: recorders + fate counts.

Shows the production path: millions of photons, lossless device-side
tallies, no per-ray host work.
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
    lumogen_f_red_305,
)
from pvtrace_tpu.engine import Heatmap, Histogram, Recorder
from pvtrace_tpu.light.light import ConstantWavelengthMask

x = np.arange(400, 801, dtype=float)
world = Node(
    name="world",
    geometry=Sphere(radius=25.0, material=Material(refractive_index=1.0)),
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
                        (x, lumogen_f_red_305.absorption(x) * 10.0)
                    ),
                    emission=np.column_stack((x, lumogen_f_red_305.emission(x))),
                    quantum_yield=0.9,
                    name="dye",
                ),
                Absorber(0.3, name="background"),
            ],
        ),
    ),
    parent=world,
)
lsc.recorders = [
    Recorder(
        "edge-east",
        event="escaping",
        facet=(1, 0, 0),
        histograms=[
            Histogram("wavelength", 400, 800, 100),
            Heatmap("y", "z", (-2.5, 2.5, 25), (-0.5, 0.5, 10)),
        ],
    ),
    Recorder("lost", event="lost"),
]
light = Node(
    name="light",
    light=Light(wavelength=ConstantWavelengthMask(555.0)),
    parent=world,
)
light.translate((0.0, 0.0, 3.0))
light.rotate(np.radians(180), (1, 0, 0))

scene = Scene(world)
result = engine.simulate(scene, 1_000_000, seed=1, record_every=0)
print(f"{result.num_rays} photons in {result.elapsed:.2f}s "
      f"({result.num_rays / result.elapsed:,.0f} photons/s)")
print("fates:", dict(result.fate_counts()))
east = result.recorders["edge-east"]
print(f"east edge: {east.rays} rays, mean wavelength "
      f"{east.mean('wavelength'):.1f} nm")
