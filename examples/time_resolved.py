"""Time-resolved photoluminescence — the reference's time-resolved
example notebook (examples/time-resolved/) on the device engine.

A luminophore with a radiative lifetime re-emits after exponentially
distributed delays; photons accumulate time-of-flight at c/n along
every segment. A duration recorder on the world node histograms the
arrival times of escaping photons — the simulated TRPL decay.
"""
import numpy as np

from pvtrace_tpu import (
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
from pvtrace_tpu.engine.recorder import Histogram, Recorder
from pvtrace_tpu.light.light import ConstantWavelengthMask

TAU_RAD = 5e-9  # 5 ns radiative lifetime

x = np.arange(400, 801, dtype=float)
world = Node(
    name="world",
    geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
)
world.recorders = [
    Recorder(
        "arrivals",
        event="exit",
        histograms=[Histogram("duration", 0.0, 5 * TAU_RAD, 50)],
    )
]
slab = Node(
    name="slab",
    parent=world,
    geometry=Box(
        (2.0, 2.0, 0.5),
        material=Material(
            refractive_index=1.5,
            components=[
                Luminophore(
                    np.column_stack(
                        (x, 20.0 * lumogen_f_red_305.absorption(x))
                    ),
                    emission=np.column_stack(
                        (x, lumogen_f_red_305.emission(x))
                    ),
                    quantum_yield=0.98,
                    tau_rad=TAU_RAD,
                ),
            ],
        ),
    ),
)
laser = Node(
    name="pulse",
    parent=world,
    light=Light(wavelength=ConstantWavelengthMask(488.0)),
)
laser.translate((0.0, 0.0, 2.0))
laser.rotate(np.radians(180), (1, 0, 0))

scene = Scene(world)
result = engine.simulate(scene, 200_000, seed=0, record_every=0)
arrivals = result.recorders["arrivals"]
edges, counts = arrivals.histogram()
centres = 0.5 * (edges[:-1] + edges[1:])

# Fit the decay tail: counts ~ exp(-t / tau)
tail = counts > 5
mask = tail & (centres > TAU_RAD)
fit = np.polyfit(centres[mask], np.log(counts[mask]), 1)
print(f"photons recorded: {arrivals.rays}")
print(f"mean arrival time: {arrivals.mean('duration')*1e9:.2f} ns")
print(
    f"fitted decay lifetime: {-1.0/fit[0]*1e9:.2f} ns "
    f"(intrinsic tau_rad {TAU_RAD*1e9:.1f} ns — re-absorption and "
    "re-emission lengthen the observed decay, the classic LSC "
    "photon-recycling effect)"
)
for t, c in zip(centres[::5], counts[::5]):
    bar = "#" * int(60 * c / max(counts.max(), 1))
    print(f"{t*1e9:6.2f} ns {bar}")
