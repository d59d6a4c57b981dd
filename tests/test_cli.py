"""YAML parsing, CLI, and SQLite persistence tests.

Mirrors reference tests/test_cli.py: schema validation, YAML-vs-Python
scene equivalence (by tracing statistics), DB query semantics.
"""
import os
import sqlite3

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestParse:
    def test_parse_scene(self):
        from pvtrace_tpu.cli.parse import parse

        scene = parse(os.path.join(DATA, "lsc.yml"))
        names = {n.name for n in scene.root.iter_preorder()}
        assert names == {"world", "lsc", "green-laser"}
        lsc = [n for n in scene.root.iter_preorder() if n.name == "lsc"][0]
        comps = lsc.geometry.material.components
        assert {c.name for c in comps} == {"my-lumogen-dye", "background"}
        # record: true expands to auto recorders + explicit one
        rec_names = {r.name for r in lsc.recorders}
        assert "edge-escape" in rec_names
        assert "lsc-lost" in rec_names
        assert "lsc-top" in rec_names

    def test_schema_rejects_bad_spec(self, tmp_path):
        import jsonschema
        from pvtrace_tpu.cli.parse import parse

        bad = tmp_path / "bad.yml"
        bad.write_text("version: '1.0'\nnodes:\n  world:\n    box: {}\n")
        with pytest.raises(jsonschema.ValidationError):
            parse(str(bad))

    @pytest.mark.slow
    def test_yaml_vs_python_equivalence(self):
        """YAML scene and the equivalent Python-built scene produce
        statistically identical fate fractions (the reference pins the
        ray histories bit-for-bit for a shared RNG; we pin the
        distributions since engines differ)."""
        import functools

        from pvtrace_tpu import (
            Absorber,
            Box,
            Light,
            Luminophore,
            Material,
            Node,
            Scene,
            Sphere,
            cone,
            engine,
            lumogen_f_red_305,
        )
        from pvtrace_tpu.cli.parse import parse
        from pvtrace_tpu.light.light import ConstantWavelengthMask

        scene_yaml = parse(os.path.join(DATA, "lsc.yml"))

        x = np.arange(500, 1002, 2, dtype=float)
        absorption = lumogen_f_red_305.absorption(x)
        absorption = absorption / absorption.max() * 5.0
        world = Node(
            name="world",
            geometry=Sphere(radius=12.0, material=Material(refractive_index=1.0)),
        )
        Node(
            name="lsc",
            location=(0, 0, 0.5),
            geometry=Box(
                (5, 5, 1),
                material=Material(
                    refractive_index=1.5,
                    components=[
                        Luminophore(
                            coefficient=np.column_stack((x, absorption)),
                            emission=np.column_stack(
                                (x, lumogen_f_red_305.emission(x))
                            ),
                            quantum_yield=0.95,
                            name="my-lumogen-dye",
                        ),
                        Absorber(0.05, name="background"),
                    ],
                ),
            ),
            parent=world,
        )
        laser = Node(
            name="green-laser",
            light=Light(
                wavelength=ConstantWavelengthMask(555.0),
                direction=functools.partial(cone, np.radians(22.5)),
            ),
            parent=world,
        )
        laser.location = (0, 0, 3.0)
        laser.look_at((0, 0, -1))
        scene_py = Scene(world)

        n = 400
        np.random.seed(1)
        r1 = engine.simulate(scene_yaml, n, seed=5, record_every=0)
        np.random.seed(1)
        r2 = engine.simulate(scene_py, n, seed=5, record_every=0)
        f1 = {k: v for k, v in r1.fate_counts().items()}
        f2 = {k: v for k, v in r2.fate_counts().items()}
        for fate in set(f1) | set(f2):
            k1, k2 = f1.get(fate, 0), f2.get(fate, 0)
            p = (k1 + k2) / (2 * n)
            se = np.sqrt(p * (1 - p) * 2 / n)
            assert abs(k1 - k2) / n < 5 * max(se, 1e-9), (fate, f1, f2)

    def test_csv_spectrum(self, tmp_path):
        from pvtrace_tpu.cli.parse import _SpecParser

        parser = _SpecParser(DATA)
        spec = parser.load_csv_spectrum("mock-spectrum.csv")
        assert spec.shape == (5, 2)
        assert spec[0, 0] == 400.0
        assert spec[2, 1] == 1.0


class TestCLI:
    def test_simulate_and_query(self, tmp_path):
        from pvtrace_tpu.cli.main import app

        db_path = str(tmp_path / "scene.sqlite3")
        rc = app(
            [
                "simulate",
                os.path.join(DATA, "lsc.yml"),
                "--rays", "60",
                "--seed", "3",
                "--database", db_path,
                "--tracer", "python",
            ]
        )
        assert rc == 0
        assert os.path.exists(db_path)

        connection = sqlite3.connect(db_path)
        n_rays = connection.execute(
            "SELECT COUNT(DISTINCT throw_id) FROM ray"
        ).fetchone()[0]
        assert n_rays == 60
        kinds = {
            row[0]
            for row in connection.execute("SELECT DISTINCT kind FROM event")
        }
        assert "GENERATE" in kinds
        connection.close()

        import io
        from contextlib import redirect_stdout

        out = io.StringIO()
        with redirect_stdout(out):
            rc = app(["count", db_path, "lsc", "entering"])
        assert rc == 0
        entering = int(out.getvalue().strip())
        assert 0 < entering <= 60

        out = io.StringIO()
        with redirect_stdout(out):
            rc = app(
                ["spectrum", db_path, "lsc", "escaping", "--output", "csv"]
            )
        assert rc == 0
        lines = out.getvalue().strip().splitlines()
        assert lines[0] == "wavelength"

        out = io.StringIO()
        with redirect_stdout(out):
            rc = app(["time", db_path, "lsc", "escaping", "--output", "json"])
        assert rc == 0

    def test_show_writes_html(self, tmp_path):
        from pvtrace_tpu.cli.main import app

        out_path = str(tmp_path / "scene.html")
        rc = app(
            [
                "show",
                os.path.join(DATA, "lsc.yml"),
                "--output", out_path,
                "--rays", "2",
                "--seed", "1",
            ]
        )
        assert rc == 0
        text = open(out_path).read()
        assert "canvas" in text

    def test_count_facet_filter(self, tmp_path):
        """Facet-normal filters follow the CLI --nx/--ny/--nz semantics."""
        from pvtrace_tpu.cli.main import app

        db_path = str(tmp_path / "scene.sqlite3")
        app(
            [
                "simulate",
                os.path.join(DATA, "lsc.yml"),
                "--rays", "80",
                "--seed", "3",
                "--database", db_path,
                "--tracer", "python",
            ]
        )
        import io
        from contextlib import redirect_stdout

        def count(extra):
            out = io.StringIO()
            with redirect_stdout(out):
                app(["count", db_path, "lsc", "escaping"] + extra)
            return int(out.getvalue().strip())

        total = count([])
        top = count(["--nz", "1.0"])
        bottom = count(["--nz", "-1.0"])
        assert top + bottom <= total
        assert top > 0
