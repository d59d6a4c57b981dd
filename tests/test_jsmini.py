"""Unit tests for the bundled JS interpreter (tests/jsmini.py).

The interpreter's only other coverage is end-to-end through app.js
(tests/test_frontend.py); these pin the language semantics it relies
on, so an interpreter regression fails fast with a precise signal
instead of a confusing frontend failure.
"""
import math

import pytest

from jsmini import (
    Interpreter, JSError, JSObject, NULL, UNDEF, from_python, js_str,
    to_python,
)


def run(source):
    interp = Interpreter()
    interp.run(source)
    return interp


def final(source, name="result"):
    return run(source).get(name)


class TestExpressions:
    def test_arithmetic_and_precedence(self):
        assert final("const result = 2 + 3 * 4 - 6 / 2;") == 11.0
        assert final("const result = (2 + 3) * 4 % 6;") == 2.0
        assert final("const result = 2 ** 3 ** 2;") == 512.0
        assert final("const result = -3 + +2;") == -1.0

    def test_string_coercion(self):
        assert final('const result = "n=" + 5;') == "n=5"
        assert final('const result = "10" / 2;') == 5.0
        assert final('const result = 1.5 + "";') == "1.5"
        assert final('const result = 5 + "";') == "5"

    def test_comparisons_and_equality(self):
        assert final("const result = 1 < 2 && 2 <= 2 && 3 > 2 && 2 >= 2;")
        assert final('const result = "a" < "b";') is True
        assert final("const result = 1 === 1.0;") is True
        assert final('const result = 1 === "1";') is False
        assert final("const result = null == undefined;") is True
        assert final("const result = null === undefined;") is False
        assert final("const result = NaN === NaN;") is False

    def test_truthiness(self):
        src = """
        const values = [0, "", null, undefined, NaN, 1, "x", [], {}];
        const result = values.map((v) => !!v);
        """
        assert final(src) == [False, False, False, False, False,
                              True, True, True, True]

    def test_ternary_logic_shortcut(self):
        assert final('const result = 0 || "fallback";') == "fallback"
        assert final("const result = 1 && 2;") == 2.0
        assert final("const result = true ? 1 : 2;") == 1.0

    def test_template_literals(self):
        assert final(
            "const a = 2; const result = `a=${a} b=${a * 2}`;"
        ) == "a=2 b=4"

    def test_bitwise(self):
        assert final("const result = 5 | 2;") == 7.0
        assert final("const result = 7 & 12;") == 4.0
        assert final("const result = 1 << 4;") == 16.0

    def test_typeof(self):
        assert final("const result = typeof 1;") == "number"
        assert final('const result = typeof "s";') == "string"
        assert final("const result = typeof undefined;") == "undefined"
        assert final("const result = typeof (() => 0);") == "function"


class TestBindingAndScope:
    def test_closures(self):
        src = """
        function counter() {
          let n = 0;
          return () => { n += 1; return n; };
        }
        const c = counter();
        c(); c();
        const result = c();
        """
        assert final(src) == 3.0

    def test_destructuring(self):
        src = """
        const [a, , b = 9] = [1, 2];
        const { x, y: z, w = 4 } = { x: 1, y: 2 };
        const [[p], [q]] = [[5], [6]];
        const result = [a, b, x, z, w, p, q];
        """
        assert final(src) == [1.0, 9.0, 1.0, 2.0, 4.0, 5.0, 6.0]

    def test_param_patterns_defaults_rest(self):
        src = """
        const f = ([a, b], { k }, d = 10, ...rest) => a + b + k + d +
          rest.length;
        const result = f([1, 2], { k: 3 }, undefined, 9, 9, 9);
        """
        assert final(src) == 19.0

    def test_function_hoisting(self):
        src = """
        const result = later();
        function later() { return 42; }
        """
        assert final(src) == 42.0

    def test_undeclared_throws(self):
        with pytest.raises(JSError, match="not defined"):
            run("missing_name + 1;")


class TestControlFlow:
    def test_loops(self):
        src = """
        let sum = 0;
        for (let i = 0; i < 5; i++) sum += i;
        for (const v of [10, 20]) sum += v;
        let n = 3;
        while (n--) sum += 100;
        const result = sum;
        """
        assert final(src) == 340.0

    def test_break_continue(self):
        src = """
        let out = [];
        for (const v of [1, 2, 3, 4, 5]) {
          if (v === 2) continue;
          if (v === 5) break;
          out.push(v);
        }
        const result = out;
        """
        assert final(src) == [1.0, 3.0, 4.0]

    def test_try_catch_finally(self):
        src = """
        let steps = [];
        try {
          steps.push("a");
          throw new Error("boom");
        } catch (e) {
          steps.push(e.message);
        } finally {
          steps.push("z");
        }
        const result = steps;
        """
        assert final(src) == ["a", "boom", "z"]

    def test_uncaught_throw_reaches_python(self):
        with pytest.raises(JSError, match="kaput"):
            run('throw new Error("kaput");')


class TestBuiltins:
    def test_math(self):
        interp = run(
            "const result = [Math.max(1, 5, 3), Math.hypot(3, 4), "
            "Math.round(2.5), Math.floor(-1.5), Math.abs(-2)];"
        )
        assert interp.get("result") == [5.0, 5.0, 3.0, -2.0, 2.0]

    def test_json_round_trip(self):
        src = """
        const obj = { a: [1, 2], b: "x", c: null };
        const result = JSON.parse(JSON.stringify(obj));
        """
        assert to_python(final(src)) == {"a": [1, 2], "b": "x", "c": None}

    def test_array_methods(self):
        src = """
        const a = [3, 1, 2];
        const result = {
          sorted: a.slice().sort((x, y) => x - y),
          mapped: a.map((v, i) => v * 10 + i),
          found: a.find((v) => v > 2),
          reduced: a.reduce((s, v) => s + v, 0),
          joined: a.join("-"),
          spread: Math.max(...a),
          flat: [[1], [2, 3]].flat(),
        };
        """
        result = to_python(final(src))
        assert result == {
            "sorted": [1, 2, 3], "mapped": [30, 11, 22], "found": 3,
            "reduced": 6, "joined": "3-1-2", "spread": 3, "flat": [1, 2, 3],
        }

    def test_string_methods(self):
        src = """
        const s = "rgb(12,34,56)";
        const result = {
          digits: s.match(/\\d+/g),
          upper: "ab".toUpperCase(),
          pieces: "a,b,c".split(","),
          replaced: "x&y&z".replace(/&/g, "+"),
          padded: "7".padStart(3, "0"),
          includes: s.includes("34"),
        };
        """
        result = to_python(final(src))
        assert result == {
            "digits": ["12", "34", "56"], "upper": "AB",
            "pieces": ["a", "b", "c"], "replaced": "x+y+z",
            "padded": "007", "includes": True,
        }

    def test_object_entries(self):
        src = """
        const result = Object.entries({ u: 1, v: 2 })
          .map(([k, v]) => k + v).join(",");
        """
        assert final(src) == "u1,v2"

    def test_map_and_set(self):
        src = """
        const m = new Map();
        m.set("a", 1).set("b", 2);
        const s = new Set([1, 1, 2]);
        const result = [m.get("a"), m.has("c"), m.size, s.size, s.has(2)];
        """
        assert final(src) == [1.0, False, 2.0, 2.0, True]

    def test_number_formatting(self):
        assert final("const result = (1234567.0).toLocaleString();") \
            == "1,234,567"
        assert final("const result = (1.23456).toFixed(2);") == "1.23"
        assert js_str(final("const result = 0.5;")) == "0.5"
        assert js_str(final("const result = 3.0;")) == "3"


class TestAsync:
    def test_await_resolves_synchronously(self):
        src = """
        async function inner() { return 5; }
        async function outer() {
          const v = await inner();
          return v + 1;
        }
        const result = outer();
        """
        assert final(src) == 6.0


class TestHostBoundary:
    def test_python_functions_clamp_extra_args(self):
        interp = Interpreter()
        interp.globals.declare("host", lambda v: v * 2)
        interp.run("const result = [1, 2].map(host);")  # (v, i, arr)
        assert interp.get("result") == [2.0, 4.0]

    def test_conversions(self):
        assert to_python(from_python({"a": [1, None, True]})) == {
            "a": [1, None, True]
        }
        assert from_python(1) == 1.0
        assert from_python(None) is NULL
        assert to_python(UNDEF) is None

    def test_step_budget_stops_infinite_loops(self):
        interp = Interpreter(max_steps=50_000)
        with pytest.raises(RuntimeError, match="step budget"):
            interp.run("while (true) {}")
