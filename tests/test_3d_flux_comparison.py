"""Cross-code physics validation: the FULLSPECTRUM comparison.

Reproduces the reference's tests/test_3D_flux_comparison.py: an LSC
matching the Bose thesis sample (4.8 x 1.8 x 0.26 cm, Fluro Red dye
qy=0.95, host n=1.5, background 0.02 cm^-1) illuminated by a filtered
lamp spectrum. Expected fate fractions from Chatten's 3D thermodynamic
flux model and two independent ray tracers (BASELINE.md):

    edge emission   0.25 +/- 0.04
    escape (faces)  0.64 +/- 0.04
    lost            0.11 +/- 0.04

The reference needs ~20 minutes with its Python tracer and marks this
slow; the device engine runs it in seconds.
"""
import numpy as np
import pytest

from pvtrace_tpu import Distribution, fluro_red
from pvtrace_tpu.device.lsc import LSC
from pvtrace_tpu.light.light import rectangular_mask, SpectrumWavelengthMask
from pvtrace_tpu.light.light import RectangularMask


def lamp_spectrum(x):
    """Fit to an experimentally measured lamp spectrum with a long
    wavelength filter (reference device/lsc.py:649-662)."""

    def g(x, a, p, w):
        return a * np.exp(-(((p - x) / w) ** 2))

    return g(x, 0.53025700136646192, 512.91400020614333, 93.491838802960473) + g(
        x, 0.63578999789955015, 577.63100003089369, 66.031706473985736
    )


@pytest.mark.slow
def test_fate_fractions_match_3d_flux_model():
    np.random.seed(0)
    x = np.arange(400, 801, dtype=float)
    size = (l, w, d) = (4.8, 1.8, 0.250)
    lsc = LSC(size, wavelength_range=x)

    lsc.add_luminophore(
        "Fluro Red",
        np.column_stack((x, fluro_red.absorption(x) * 11.387815)),
        np.column_stack((x, fluro_red.emission(x))),
        quantum_yield=0.95,
    )
    lsc.add_absorber("PMMA", 0.02)

    lamp_dist = Distribution(x, lamp_spectrum(x))
    lsc.add_light(
        "Oriel Lamp + Filter",
        (0.0, 0.0, 0.5 * d + 0.01),
        rotation=(np.radians(180), (1, 0, 0)),
        wavelength=SpectrumWavelengthMask(lamp_dist),
        position=RectangularMask(l / 2, w / 2),
    )

    throw = 4000
    lsc.simulate(throw, emit_method="redshift", seed=7)

    edge = lsc.spectrum(facets={"left", "right", "near", "far"}, source="all")
    escape = lsc.spectrum(facets={"top", "bottom"}, source="all")
    lost = lsc.spectrum(
        source="all", events={"absorb", "nonradiative", "react", "kill"},
        kind="last",
    )
    incident = lsc.spectrum(
        source={"Oriel Lamp + Filter"}, kind="first", facets={"top"}
    )
    hitting = len(incident)
    assert hitting > 0.9 * throw

    edge_fraction = len(edge) / hitting
    escape_fraction = len(escape) / hitting
    lost_fraction = len(lost) / hitting

    # Expected values and tolerances from the reference test
    assert np.isclose(edge_fraction, 0.25, atol=0.04), edge_fraction
    assert np.isclose(escape_fraction, 0.64, atol=0.04), escape_fraction
    assert np.isclose(lost_fraction, 0.11, atol=0.04), lost_fraction
    # All photons accounted for
    assert np.isclose(
        edge_fraction + escape_fraction + lost_fraction, 1.0, atol=0.05
    )
