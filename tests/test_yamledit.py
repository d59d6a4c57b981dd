"""Comment-preserving YAML patches.

Parity: the reference round-trips GUI patches through ruamel so user
comments survive (``/root/reference/pvtrace/studio/server.py:330-471``).
Here the same guarantee comes from span-based text splices
(``pvtrace_tpu/studio/yamledit.py``): these tests drive the primitives
directly and then the full studio ``patch_document`` vocabulary over a
commented scene document, asserting every comment survives every op.
"""
import os

import pytest
import yaml

import pvtrace_tpu.studio.server as studio_server
from pvtrace_tpu.studio import yamledit

DATA = os.path.join(os.path.dirname(__file__), "data")

DOC = """\
# my scene file
version: "1.0"  # spec version
nodes:
  # the world sphere
  world:
    sphere:
      radius: 10.0   # world radius
      material: {refractive_index: 1.0}
  lsc:  # the concentrator
    box:
      size: [5, 5, 1]
      material:
        refractive_index: 1.5
        components: [dye]
    location: [0, 0, 0]  # sits at origin
components:
  dye:
    absorber:
      coefficient: 5.0
"""

COMMENTS = (
    "# my scene file",
    "# spec version",
    "# the world sphere",
    "# world radius",
    "# the concentrator",
)


def assert_comments(text, *extra):
    for comment in COMMENTS + extra:
        assert comment in text, comment


class TestPrimitives:
    def test_set_scalar_keeps_line_comment(self):
        text = yamledit.set_value(
            DOC, ["nodes", "world", "sphere", "radius"], 12.5
        )
        assert "radius: 12.5   # world radius" in text
        assert_comments(text, "# sits at origin")
        assert yamledit.get_value(
            text, ["nodes", "world", "sphere", "radius"]
        ) == 12.5

    def test_set_flow_list_keeps_trailing_comment(self):
        text = yamledit.set_value(
            DOC, ["nodes", "lsc", "location"], [1.0, 2.0, 3.5]
        )
        assert "location: [1.0, 2.0, 3.5]  # sits at origin" in text
        assert_comments(text)

    def test_set_inside_flow_mapping(self):
        text = yamledit.set_value(
            DOC, ["nodes", "world", "sphere", "material",
                  "refractive_index"], 1.33
        )
        assert "{refractive_index: 1.33}" in text
        assert_comments(text, "# sits at origin")

    def test_create_missing_section_and_nested_keys(self):
        text = yamledit.set_value(DOC, ["recorders", "top"], {
            "node": "lsc", "event": "escaping",
            "histograms": {"wavelength": [400, 900, 80]},
        })
        assert yamledit.get_value(
            text, ["recorders", "top", "histograms", "wavelength"]
        ) == [400, 900, 80]
        assert_comments(text, "# sits at origin")
        # And a scalar through a missing intermediate mapping:
        text = yamledit.set_value(text, ["recorders", "top", "atol"], 1e-3)
        assert yamledit.get_value(text, ["recorders", "top", "atol"]) == 1e-3

    def test_delete_key_and_refill_empty_section(self):
        text = yamledit.delete_key(DOC, ["components", "dye"])
        assert yamledit.get_value(text, ["components"]) == {}
        assert_comments(text, "# sits at origin")
        text = yamledit.set_value(
            text, ["components", "abs-1"], {"absorber": {"coefficient": 1.0}}
        )
        assert yamledit.get_value(
            text, ["components", "abs-1", "absorber", "coefficient"]
        ) == 1.0
        assert_comments(text)

    def test_delete_one_of_many(self):
        text = yamledit.delete_key(DOC, ["nodes", "lsc"])
        nodes = yamledit.get_value(text, ["nodes"])
        assert "lsc" not in nodes and "world" in nodes
        assert "# the world sphere" in text

    def test_delete_missing_raises(self):
        with pytest.raises(KeyError):
            yamledit.delete_key(DOC, ["nodes", "nope"])

    def test_replace_non_mapping_leaf_with_nested_spec(self):
        # `location` is a list; setting a path THROUGH it replaces it.
        text = yamledit.set_value(
            DOC, ["nodes", "lsc", "location", "x"], 1.0
        )
        assert yamledit.get_value(
            text, ["nodes", "lsc", "location"]
        ) == {"x": 1.0}
        assert_comments(text)


@pytest.fixture(scope="module")
def studio():
    """A Studio on the standard test scene with user comments added."""
    with open(os.path.join(DATA, "lsc_scene_studio.yml")) as fp:
        document = fp.read()
    document = document.replace(
        'version: "1.0"', 'version: "1.0"  # scene spec version'
    )
    document = document.replace(
        "\nnodes:", "\n# --- geometry ---\nnodes:", 1
    )
    document = document.replace(
        "    location: [0, 0, 0.5]",
        "    location: [0, 0, 0.5]  # half a slab above the table",
    )
    document = document.replace(
        "\ncomponents:", "\n# --- materials ---\ncomponents:", 1
    )
    studio = studio_server.Studio(
        document, document_path=os.path.join(DATA, "lsc_scene_studio.yml")
    )
    studio.apply(document)
    return studio


STUDIO_COMMENTS = (
    "# scene spec version",
    "# --- geometry ---",
    "# --- materials ---",
)


class TestPatchDocumentPreservesComments:
    """A commented document survives every GUI patch op with its
    comments intact — the reference's ruamel behavior."""

    def test_gizmo_move(self, studio):
        text = studio_server.patch_document(studio, {
            "op": "move", "node": "lsc",
            "world_position": [0.2, 0.0, 0.75],
        })
        for comment in STUDIO_COMMENTS:
            assert comment in text
        assert "# half a slab above the table" in text
        assert yaml.safe_load(text)["nodes"]["lsc"]["location"] == [
            0.2, 0.0, 0.75
        ]
        studio.apply(text)  # still a valid, compilable scene

    def test_set_add_update_delete_cycle(self, studio):
        text = studio_server.patch_document(studio, {
            "op": "set",
            "path": ["nodes", "world", "sphere", "radius"],
            "value": 14.0,
        })
        studio.apply(text)
        text = studio_server.patch_document(
            studio, {"op": "add-recorder", "node": "lsc"}
        )
        studio.apply(text)
        text = studio_server.patch_document(studio, {
            "op": "update-recorder", "recorder": "lsc-escaping-1",
            "changes": {"atol": 1e-3},
        })
        studio.apply(text)
        text = studio_server.patch_document(
            studio, {"op": "add-component"}
        )
        studio.apply(text)
        text = studio_server.patch_document(
            studio, {"op": "delete-component", "component": "absorber-1"}
        )
        studio.apply(text)
        text = studio_server.patch_document(
            studio, {"op": "delete-recorder", "recorder": "lsc-escaping-1"}
        )
        studio.apply(text)
        for comment in STUDIO_COMMENTS:
            assert comment in studio.document
        assert "# half a slab above the table" in studio.document
        spec = yaml.safe_load(studio.document)
        assert spec["nodes"]["world"]["sphere"]["radius"] == 14.0
        assert "absorber-1" not in (spec.get("components") or {})
        assert "lsc-escaping-1" not in (spec.get("recorders") or {})

    def test_add_and_delete_node(self, studio):
        text = studio_server.patch_document(
            studio, {"op": "add-node", "kind": "sphere"}
        )
        assert yaml.safe_load(text)["nodes"]["sphere-1"]
        studio.apply(text)
        text = studio_server.patch_document(
            studio, {"op": "delete-node", "node": "sphere-1"}
        )
        assert "sphere-1" not in yaml.safe_load(text)["nodes"]
        for comment in STUDIO_COMMENTS:
            assert comment in text
        studio.apply(text)

    def test_delete_component_rewrites_node_lists(self, studio):
        text = studio_server.patch_document(
            studio, {"op": "delete-component", "component": "background"}
        )
        spec = yaml.safe_load(text)
        assert "background" not in spec["components"]
        comps = spec["nodes"]["lsc"]["box"]["material"]["components"]
        assert comps == ["my-lumogen-dye"]
        for comment in STUDIO_COMMENTS:
            assert comment in text
        # NOT applied: the scene stays valid for other tests.


class TestFlowMappings:
    """Splices inside `{...}` mappings must keep siblings and stay
    parseable (regression: inserts rewrote the mapping as only the new
    entry; deletes spliced line-wise through the flow syntax)."""

    DOC = (
        "nodes:\n"
        "  world:\n"
        "    sphere:\n"
        "      radius: 10.0\n"
        "      material: {refractive_index: 1.0, color: red}  # inline\n"
    )
    PATH = ["nodes", "world", "sphere", "material"]

    def test_insert_keeps_siblings(self):
        text = yamledit.set_value(self.DOC, self.PATH + ["absorption"], 0.5)
        material = yamledit.get_value(text, self.PATH)
        assert material == {
            "refractive_index": 1.0, "color": "red", "absorption": 0.5
        }
        assert "# inline" in text

    def test_insert_dict_value_stays_inline(self):
        text = yamledit.set_value(
            self.DOC, self.PATH + ["extra"], {"a": 1.0}
        )
        assert yamledit.get_value(text, self.PATH + ["extra"]) == {"a": 1.0}

    def test_replace_dict_value_stays_inline(self):
        text = yamledit.set_value(
            self.DOC, self.PATH, {"refractive_index": 1.5}
        )
        assert yamledit.get_value(text, self.PATH) == {
            "refractive_index": 1.5
        }
        assert yamledit.get_value(text, self.PATH[:-1] + ["radius"]) == 10.0

    def test_delete_middle_key_keeps_siblings(self):
        text = yamledit.delete_key(self.DOC, self.PATH + ["refractive_index"])
        assert yamledit.get_value(text, self.PATH) == {"color": "red"}
        assert "# inline" in text

    def test_delete_last_key_keeps_siblings(self):
        text = yamledit.delete_key(self.DOC, self.PATH + ["color"])
        assert yamledit.get_value(text, self.PATH) == {
            "refractive_index": 1.0
        }

    def test_delete_only_key_leaves_inline_empty_mapping(self):
        doc = self.DOC.replace(
            "{refractive_index: 1.0, color: red}", "{refractive_index: 1.0}"
        )
        text = yamledit.delete_key(doc, self.PATH + ["refractive_index"])
        assert yamledit.get_value(text, self.PATH) == {}
        # Still one line; the sphere mapping is intact.
        assert yamledit.get_value(text, self.PATH[:-1] + ["radius"]) == 10.0


class TestFlowRenderingEdgeCases:
    def test_dict_nested_in_list_inside_flow_mapping(self):
        text = yamledit.set_value(
            "m: {a: 1}\n", ["m", "b"], {"layers": [{"t": 1.0, "n": 2.0}]}
        )
        assert yaml.safe_load(text)["m"] == {
            "a": 1, "b": {"layers": [{"t": 1.0, "n": 2.0}]}
        }

    def test_insert_after_trailing_comma(self):
        text = yamledit.set_value("m: {a: 1,}\n", ["m", "b"], 2.0)
        assert yaml.safe_load(text)["m"] == {"a": 1, "b": 2.0}

    def test_dict_in_list_in_block_context(self):
        text = yamledit.set_value(
            "top: 1\n", ["items"], [{"k": 1.0}, {"k": 2.0}]
        )
        assert yaml.safe_load(text)["items"] == [{"k": 1.0}, {"k": 2.0}]
