"""LSC device API tests (reference device/lsc.py workflow)."""
import numpy as np
import pytest

from pvtrace_tpu.device.lsc import LSC


@pytest.fixture(scope="module")
def simulated_lsc():
    np.random.seed(0)
    lsc = LSC((5.0, 5.0, 1.0))
    lsc.simulate(400, seed=7)
    return lsc


class TestLSC:
    def test_dataframe_columns(self, simulated_lsc):
        df = simulated_lsc._df
        for col in (
            "kind", "event", "wavelength", "position_x", "position_y",
            "position_z", "direction_x", "facet", "source",
        ):
            assert col in df.columns

    def test_counts_table(self, simulated_lsc):
        counts = simulated_lsc.counts()
        assert set(counts.index) == {
            "left", "right", "near", "far", "top", "bottom"
        }
        # Light shines on the top facet
        assert counts["Solar In"]["top"] > 300

    def test_summary(self, simulated_lsc):
        summary = simulated_lsc.summary()
        assert 0.0 <= summary["Waveguide Efficiency"] <= 1.0 or np.isnan(
            summary["Waveguide Efficiency"]
        )
        expected = 1.5 ** 2 / (25.0 / 20.0 + 1.5 ** 2)
        assert np.isclose(
            summary["Waveguide Efficiency (Thermodynamic Prediction)"], expected
        )

    def test_spectrum_filters(self, simulated_lsc):
        lsc = simulated_lsc
        edge = lsc.spectrum(facets={"left", "right", "near", "far"})
        top_bottom = lsc.spectrum(facets={"top", "bottom"})
        assert len(edge) + len(top_bottom) <= len(lsc._df)
        with pytest.raises(ValueError):
            lsc.spectrum(source={"nope"})

    def test_luminescent_output_redshifted(self, simulated_lsc):
        lsc = simulated_lsc
        lum = lsc.spectrum(source={"Lumogen F Red 305"}, kind="last")
        if len(lum) > 10:
            assert lum.mean() > 570.0

    @pytest.mark.slow
    def test_solar_cells_and_mirror(self):
        np.random.seed(1)
        lsc = LSC((5.0, 5.0, 1.0))
        lsc.add_solar_cell({"left", "right", "near", "far"})
        lsc.add_back_surface_mirror()
        lsc.simulate(300, seed=11)
        summary = lsc.summary()
        assert summary["Optical Efficiency"] > 0.05
        counts = lsc.counts()
        # Mirror: nothing escapes the bottom facet
        assert counts["Solar Out"]["bottom"] == 0
        assert counts["Luminescent Out"]["bottom"] == 0


class TestRenderer:
    def test_render_and_save(self, tmp_path):
        from pvtrace_tpu.scene.renderer import SceneRenderer

        np.random.seed(0)
        lsc = LSC((5.0, 5.0, 1.0))
        lsc._make_scene()
        renderer = SceneRenderer()
        renderer.render(lsc._scene)
        assert len(renderer.segments) > 10
        from pvtrace_tpu import photon_tracer

        scene = lsc._scene
        for ray in scene.emit(3):
            renderer.add_history(photon_tracer.follow(scene, ray))
        path = renderer.save(str(tmp_path / "scene.html"))
        text = open(path).read()
        assert "SEGMENTS" in text and "canvas" in text
        assert len(text) > 2000
