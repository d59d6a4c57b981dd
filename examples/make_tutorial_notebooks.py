"""Regenerate the numbered tutorial notebooks (002-006).

Mirrors the reference's numbered tutorials (``/root/reference/examples/
002 Materials.ipynb`` ... ``006 Coatings.ipynb``) as executable
notebooks over this package's API; the prose/code is written against
``docs/TUTORIALS.md``. Run ``python examples/make_tutorial_notebooks.py``
after editing the cell sources below; ``tests/test_notebooks.py``
executes every notebook end-to-end in CI.
"""
import os

import nbformat

HERE = os.path.dirname(os.path.abspath(__file__))


def build(path, cells):
    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3", "language": "python",
    }
    for kind, source in cells:
        if kind == "md":
            nb.cells.append(nbformat.v4.new_markdown_cell(source))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(source))
    nbformat.write(nb, os.path.join(HERE, path))
    print("wrote", path)


# ---------------------------------------------------------------- 002
MATERIALS = [
    ("md", """\
# 002 — Materials

Volume physics lives on `Material.components` (parity with the
reference's `002 Materials.ipynb`). A component converts path length
into interaction probability via its attenuation coefficient; what
happens on absorption depends on the component type:

| Component | On absorption |
|---|---|
| `Absorber` | photon lost (NONRADIATIVE) |
| `Scatterer` | direction resampled from a phase function |
| `Luminophore` | re-emitted at a wavelength sampled from an emission spectrum (quantum yield permitting) |
| `Reactor` | drives a photochemical reaction (REACT) |
"""),
    ("code", """\
import numpy as np
from pvtrace_tpu import (
    Absorber, Scatterer, Luminophore, Reactor, Material,
)

material = Material(
    refractive_index=1.5,
    components=[
        Absorber(0.1, name="background"),   # constant 0.1 cm^-1
        Scatterer(1.0, quantum_yield=1.0, name="scat"),
    ],
)
# Total attenuation at any wavelength sums the components:
print("alpha(555 nm) =", material.total_attenutation_coefficient(555.0))
assert np.isclose(material.total_attenutation_coefficient(555.0), 1.1)
"""),
    ("md", """\
## Spectra from arrays

Coefficients can be `(wavelength, value)` arrays. The built-in Lumogen
F Red 305 dye ships as analytic fits:
"""),
    ("code", """\
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from pvtrace_tpu.data import lumogen_f_red_305

x = np.arange(400.0, 801.0)
absorption = lumogen_f_red_305.absorption(x)   # normalised to peak 1
emission = lumogen_f_red_305.emission(x)

dye = Luminophore(
    coefficient=np.column_stack((x, 5.0 * absorption)),  # peak 5 cm^-1
    emission=np.column_stack((x, emission)),
    quantum_yield=0.95,
    name="dye",
)
plt.plot(x, absorption, label="absorption")
plt.plot(x, emission, label="emission")
plt.xlabel("wavelength (nm)"); plt.legend(); plt.title("Lumogen F Red 305")
plt.savefig("/tmp/lumogen.png")
print("dye alpha(555) =", dye.coefficient(555.0))
"""),
    ("md", """\
## Tracing through a luminescent material

Emission is redshifted relative to absorption (the `kT` emission method
forbids more than ~3/2 kT of thermal energy gain), so photons leaving
the slab have longer wavelengths than the 555 nm they entered with:
"""),
    ("code", """\
from pvtrace_tpu import Box, Event, Light, Node, Scene, Sphere, photon_tracer
from pvtrace_tpu.light.light import ConstantWavelengthMask

world = Node(name="world", geometry=Sphere(
    radius=10.0, material=Material(refractive_index=1.0)))
Node(name="slab", parent=world, geometry=Box(
    (5.0, 5.0, 1.0),
    material=Material(refractive_index=1.5, components=[dye, Absorber(0.05)]),
))
light = Node(name="light", parent=world,
             light=Light(wavelength=ConstantWavelengthMask(555.0)))
light.translate((0.0, 0.0, 3.0))
light.rotate(np.radians(180.0), (1.0, 0.0, 0.0))
scene = Scene(world)

np.random.seed(1)
exit_wavelengths = []
for ray in scene.emit(300):
    history = photon_tracer.follow(scene, ray)
    final_ray, event = history[-1]
    if event == Event.EXIT and final_ray.wavelength != 555.0:
        exit_wavelengths.append(final_ray.wavelength)

print(len(exit_wavelengths), "luminescent exits,",
      "mean", np.mean(exit_wavelengths), "nm")
assert np.mean(exit_wavelengths) > 570.0  # redshifted
"""),
]

# ---------------------------------------------------------------- 003
LIGHTS = [
    ("md", """\
# 003 — Lights

A `Light` is three samplers — wavelength, position, direction — each
replaceable with a mask object or any callable (parity with the
reference's `003 Lights.ipynb`). The default light is a 555 nm point
source firing along +z.
"""),
    ("code", """\
import functools
import numpy as np
from pvtrace_tpu import Distribution, Light, cone
from pvtrace_tpu.light.light import (
    CircularMask, ConstantWavelengthMask, CubeMask, RectangularMask,
    SpectrumWavelengthMask,
)

np.random.seed(2)
laser = Light(wavelength=ConstantWavelengthMask(555.0))
rays = [next(laser.emit(1)) for _ in range(5)]
print([r.wavelength for r in rays])
assert all(r.wavelength == 555.0 for r in rays)
"""),
    ("md", "## Sampling directions — cone divergence"),
    ("code", """\
spot = Light(direction=functools.partial(cone, np.radians(20.0)))
directions = np.array([r.direction for r in spot.emit(2000)])
# Every direction within 20 degrees of +z:
angles = np.degrees(np.arccos(directions[:, 2]))
print("max half-angle:", angles.max())
assert angles.max() <= 20.0 + 1e-6
"""),
    ("md", "## Sampling positions — rectangular / circular apertures"),
    ("code", """\
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

panel = Light(position=RectangularMask(2.4, 0.9))  # HALF-widths
pts = np.array([r.position for r in panel.emit(2000)])
assert np.abs(pts[:, 0]).max() <= 2.4 and np.abs(pts[:, 1]).max() <= 0.9

disc = Light(position=CircularMask(1.0))
dpts = np.array([r.position for r in disc.emit(2000)])
assert (np.hypot(dpts[:, 0], dpts[:, 1]) <= 1.0 + 1e-9).all()

fig, (a, b) = plt.subplots(1, 2, figsize=(8, 3))
a.plot(pts[:, 0], pts[:, 1], ".", ms=1); a.set_title("rectangular")
b.plot(dpts[:, 0], dpts[:, 1], ".", ms=1); b.set_title("circular")
fig.savefig("/tmp/apertures.png")
"""),
    ("md", """\
## Sampling a spectrum

`SpectrumWavelengthMask` inverse-samples a `Distribution`; any
spectrum array works:
"""),
    ("code", """\
from pvtrace_tpu.data import lumogen_f_red_305

x = np.arange(400.0, 801.0)
dist = Distribution(x, lumogen_f_red_305.emission(x))
lamp = Light(wavelength=SpectrumWavelengthMask(dist))
wavelengths = np.array([r.wavelength for r in lamp.emit(4000)])
print("mean sampled wavelength:", wavelengths.mean())
assert 580.0 < wavelengths.mean() < 680.0  # red emission band
"""),
]

# ---------------------------------------------------------------- 004
NODES = [
    ("md", """\
# 004 — Nodes

Nodes form a tree of rigid coordinate frames (parity with the
reference's `004 Nodes.ipynb`): each node carries a pose relative to
its parent, and rays, points and vectors convert between frames through
the tree.
"""),
    ("code", """\
import numpy as np
from pvtrace_tpu import Box, Material, Node, Scene, Sphere

world = Node(name="world", geometry=Sphere(
    radius=10.0, material=Material(refractive_index=1.0)))
box = Node(name="box", parent=world, geometry=Box(
    (1.0, 1.0, 1.0), material=Material(refractive_index=1.5)))
box.translate((2.0, 0.0, 0.0))
scene = Scene(world)

# The box's origin sits at x=2 in the world frame:
print(box.point_to_node((0.0, 0.0, 0.0), world))
assert np.allclose(box.point_to_node((0.0, 0.0, 0.0), world), (2, 0, 0))
"""),
    ("md", "## Rotations compose about the node's current location"),
    ("code", """\
box.rotate(np.radians(90.0), (0.0, 0.0, 1.0))
# A point one unit along the box's local +x now maps to world +y:
p = box.point_to_node((1.0, 0.0, 0.0), world)
print(p)
assert np.allclose(p, (2.0, 1.0, 0.0), atol=1e-12)
"""),
    ("md", """\
## Nested frames

Children inherit their parent's frame; conversions walk the tree in
both directions:
"""),
    ("code", """\
inner = Node(name="inner", parent=box, geometry=Box(
    (0.2, 0.2, 0.2), material=Material(refractive_index=1.5)))
inner.translate((0.0, 0.0, 0.25))
world_origin = inner.point_to_node((0.0, 0.0, 0.0), world)
print(world_origin)
assert np.allclose(world_origin, (2.0, 0.0, 0.25), atol=1e-12)
# And back again (round trip):
back = world.point_to_node(tuple(world_origin), inner)
assert np.allclose(back, (0.0, 0.0, 0.0), atol=1e-12)
"""),
    ("md", "## look_at points a node's +z at a target direction"),
    ("code", """\
light_node = Node(name="pointer", parent=world)
light_node.translate((0.0, 0.0, 3.0))
light_node.look_at((0.0, 0.0, -1.0))
v = light_node.vector_to_node((0.0, 0.0, 1.0), world)
print(v)
assert np.allclose(v, (0.0, 0.0, -1.0), atol=1e-12)
"""),
]

# ---------------------------------------------------------------- 005
GEOMETRY = [
    ("md", """\
# 005 — Geometry

Four geometry types (parity with the reference's `005 Geometry.ipynb`):
`Sphere`, `Cylinder`, `Box` and `Mesh`. All four trace on the device
engine — including meshes, which the reference's compiled engine
rejects.
"""),
    ("code", """\
import numpy as np
from pvtrace_tpu import (
    Box, Cylinder, Event, Light, Material, Node, Scene, Sphere, engine,
)

glass = lambda: Material(refractive_index=1.5)
air = lambda: Material(refractive_index=1.0)

def trace(make_geometry, n=2000):
    world = Node(name="world", geometry=Sphere(radius=10.0, material=air()))
    Node(name="target", parent=world, geometry=make_geometry())
    light = Node(name="light", parent=world, light=Light())
    light.translate((0.0, 0.0, -3.0))
    result = engine.simulate(Scene(world), n, seed=7, record_every=0)
    fates = {Event(i).name: int(v)
             for i, v in enumerate(result.data["fates"]) if v}
    return fates

print("sphere  :", trace(lambda: Sphere(radius=1.0, material=glass())))
print("cylinder:", trace(lambda: Cylinder(2.0, 0.75, material=glass())))
print("box     :", trace(lambda: Box((1.0, 1.0, 1.0), material=glass())))
"""),
    ("md", """\
## Meshes

`Mesh` accepts an STL path, a trimesh object, or raw
`(vertices, faces)` arrays — here a closed triangular prism:
"""),
    ("code", """\
from pvtrace_tpu.geometry.mesh import Mesh

def prism():
    lo, hi = -0.5, 0.5
    tri = np.array([[0.0, 1.0], [0.87, -0.5], [-0.87, -0.5]])
    vertices = np.array(
        [[x, y, lo] for x, y in tri] + [[x, y, hi] for x, y in tri]
    )
    faces = [[0, 2, 1], [3, 4, 5]]          # caps
    for i in range(3):                       # sides (two triangles each)
        j = (i + 1) % 3
        faces += [[i, j, 3 + i], [j, 3 + j, 3 + i]]
    return Mesh((vertices, np.array(faces)), material=glass())

fates = trace(prism)
print("mesh    :", fates)
assert fates.get("EXIT", 0) > 0
"""),
]

# ---------------------------------------------------------------- 006
COATINGS = [
    ("md", """\
# 006 — Coatings

Interface physics is a delegate on `Material.surface` (parity with the
reference's `006 Coatings.ipynb`). The default is unpolarised Fresnel;
`FacetOverrideSurfaceDelegate` expresses coatings per face — perfect
mirrors, ideal index-matched solar cells, Lambertian reflectors — and
still compiles onto the device engine.
"""),
    ("code", """\
import numpy as np
from pvtrace_tpu import (
    Absorber, Box, Event, Light, Material, Node, Scene, Sphere, engine,
)
from pvtrace_tpu.engine.recorder import Recorder
from pvtrace_tpu.light.light import ConstantWavelengthMask
from pvtrace_tpu.material.surface import (
    OVERRIDE_MIRROR, FacetOverride, FacetOverrideSurfaceDelegate, Surface,
)

def slab_scene(mirror_bottom):
    world = Node(name="world", geometry=Sphere(
        radius=10.0, material=Material(refractive_index=1.0)))
    surface = None
    if mirror_bottom:
        surface = Surface(delegate=FacetOverrideSurfaceDelegate(
            [FacetOverride((0.0, 0.0, -1.0), OVERRIDE_MIRROR)]))
    material = Material(refractive_index=1.5, components=[Absorber(0.02)],
                        surface=surface)
    slab = Node(name="slab", parent=world, geometry=Box(
        (5.0, 5.0, 1.0), material=material))
    slab.recorders = [
        Recorder("bottom-escape", event="escaping", facet=(0, 0, -1)),
    ]
    light = Node(name="light", parent=world,
                 light=Light(wavelength=ConstantWavelengthMask(555.0)))
    light.translate((0.0, 0.0, 3.0))
    light.rotate(np.radians(180.0), (1.0, 0.0, 0.0))
    return Scene(world)

plain = engine.simulate(slab_scene(False), 4000, seed=3, record_every=0)
coated = engine.simulate(slab_scene(True), 4000, seed=3, record_every=0)
plain_bottom = plain.recorders["bottom-escape"].rays
coated_bottom = coated.recorders["bottom-escape"].rays
print("bottom-face escapes:", plain_bottom, "->", coated_bottom)
assert coated_bottom == 0       # perfect mirror: nothing leaves below
assert plain_bottom > 100       # un-coated slab leaks plenty downward
"""),
    ("md", """\
## Coatings through the LSC device API

`LSC` wires the same facet overrides for you:
`add_back_surface_mirror()` (perfect bottom mirror),
`add_solar_cell({...})` (index-matched ideal cells on edge facets),
`add_air_gap_mirror()` (specular or Lambertian air-gap reflector).
"""),
    ("code", """\
from pvtrace_tpu.device.lsc import LSC

lsc = LSC((5.0, 5.0, 1.0))
lsc.add_solar_cell({"left", "right", "near", "far"})
lsc.add_back_surface_mirror()
lsc.simulate(2000, seed=4)
summary = lsc.summary()
print(summary[["Optical Efficiency", "Waveguide Efficiency"]])
assert 0.0 < summary["Optical Efficiency"] <= 1.0
"""),
]


if __name__ == "__main__":
    build("002_materials.ipynb", MATERIALS)
    build("003_lights.ipynb", LIGHTS)
    build("004_nodes.ipynb", NODES)
    build("005_geometry.ipynb", GEOMETRY)
    build("006_coatings.ipynb", COATINGS)
