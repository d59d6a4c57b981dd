"""Studio server tests.

Parity: reference studio semantics (``pvtrace/studio/server.py``) — the
YAML document is the single source of truth, ``/api/patch`` applies
structured edits, and a run streams recorder tallies + sampled ray
paths. The transport here is stdlib HTTP + Server-Sent Events instead
of FastAPI + websockets.
"""
import json
import os
import threading
import urllib.request

import pytest

import pvtrace_tpu.studio.server as studio_server

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def server():
    document = os.path.join(DATA, "lsc_scene_studio.yml")
    httpd = studio_server.create_server(document, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    yield base, httpd
    httpd.shutdown()
    httpd.server_close()
    thread.join(timeout=5)


def request(base, method, path, payload=None):
    data = None if payload is None else json.dumps(payload).encode()
    req = urllib.request.Request(
        base + path,
        data=data,
        method=method,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as response:
            return response.status, json.loads(response.read())
    except urllib.error.HTTPError as error:
        return error.code, json.loads(error.read())


def test_document_roundtrip_and_payload(server):
    base, httpd = server
    status, data = request(base, "GET", "/api/document")
    assert status == 200
    text = data["text"]
    assert "lsc" in text

    status, data = request(base, "PUT", "/api/document", {"text": text})
    assert status == 200
    payload = data["scene"]
    names = {node["name"] for node in payload["nodes"]}
    assert {"world", "lsc"} <= names
    lsc = next(n for n in payload["nodes"] if n["name"] == "lsc")
    assert lsc["type"] == "box"
    assert len(lsc["matrix"]) == 16
    assert payload["lights"], "light nodes should be reported"
    assert payload["recorders"], "record: true should create auto recorders"
    assert any(r["auto"] for r in payload["recorders"])


def test_invalid_document_is_rejected(server):
    base, _ = server
    status, data = request(
        base, "PUT", "/api/document", {"text": "version: '1.0'\nnodes: {}"}
    )
    assert status == 422
    assert "error" in data


def test_patch_add_and_delete_node(server):
    base, _ = server
    status, data = request(base, "POST", "/api/patch",
                           {"op": "add-node", "kind": "sphere"})
    assert status == 200
    assert "sphere-1" in data["text"]
    assert any(n["name"] == "sphere-1" for n in data["scene"]["nodes"])

    status, data = request(base, "POST", "/api/patch",
                           {"op": "delete-node", "node": "sphere-1"})
    assert status == 200
    assert not any(n["name"] == "sphere-1" for n in data["scene"]["nodes"])


def test_patch_set_location_and_move(server):
    base, httpd = server
    status, data = request(
        base, "POST", "/api/patch",
        {"op": "set", "path": ["nodes", "lsc", "location"],
         "value": [0.0, 0.0, 0.5]},
    )
    assert status == 200
    lsc = next(n for n in data["scene"]["nodes"] if n["name"] == "lsc")
    assert abs(lsc["matrix"][11] - 0.5) < 1e-9  # z translation, row-major

    # move: world position converted to parent-frame location
    status, data = request(
        base, "POST", "/api/patch",
        {"op": "move", "node": "lsc", "world_position": [0.0, 0.0, 0.0]},
    )
    assert status == 200
    assert httpd.studio.spec["nodes"]["lsc"]["location"] == [0.0, 0.0, 0.0]


def test_patch_recorders_and_components(server):
    base, httpd = server
    status, data = request(base, "POST", "/api/patch",
                           {"op": "add-recorder", "node": "lsc"})
    assert status == 200
    assert "lsc-escaping-1" in httpd.studio.spec["recorders"]

    status, data = request(base, "POST", "/api/patch",
                           {"op": "add-face-recorders", "node": "lsc"})
    assert status == 200
    for label in ("top", "bottom", "east", "west", "north", "south"):
        assert f"lsc-{label}" in httpd.studio.spec["recorders"]
    top = httpd.studio.spec["recorders"]["lsc-top"]
    assert top["facet"] == [0, 0, 1]
    assert "position" in top["histograms"]

    status, data = request(
        base, "POST", "/api/patch",
        {"op": "update-recorder", "recorder": "lsc-top",
         "changes": {"atol": 1e-3}},
    )
    assert status == 200
    assert httpd.studio.spec["recorders"]["lsc-top"]["atol"] == 1e-3

    status, data = request(base, "POST", "/api/patch",
                           {"op": "delete-recorder", "recorder": "lsc-top"})
    assert status == 200
    assert "lsc-top" not in httpd.studio.spec["recorders"]

    status, data = request(base, "POST", "/api/patch",
                           {"op": "add-component"})
    assert status == 200
    assert "absorber-1" in httpd.studio.spec["components"]
    status, data = request(base, "POST", "/api/patch",
                           {"op": "delete-component", "component": "absorber-1"})
    assert status == 200
    assert "absorber-1" not in httpd.studio.spec.get("components", {})


def test_patch_unknown_operation(server):
    base, _ = server
    status, data = request(base, "POST", "/api/patch", {"op": "explode"})
    assert status == 422


@pytest.mark.slow
def test_run_streams_bundles_and_paths(server):
    base, _ = server
    url = base + "/api/run?rays=2000&bundle=1000&record_every=50&max_paths=20"
    messages = []
    with urllib.request.urlopen(url) as response:
        assert response.headers["Content-Type"].startswith("text/event-stream")
        for raw in response:
            line = raw.decode().strip()
            if line.startswith("data: "):
                messages.append(json.loads(line[len("data: "):]))
            if messages and messages[-1].get("type") == "done":
                break
    kinds = [m["type"] for m in messages]
    assert kinds[0] == "started"
    assert kinds[-1] == "done"
    bundles = [m for m in messages if m["type"] == "bundle"]
    assert len(bundles) == 2
    final = bundles[-1]
    assert final["traced"] == 2000
    assert final["rays_per_second"] > 0
    # Recorder tallies accumulate across bundles
    assert any(r["rays"] > 0 for r in final["recorders"].values())
    # Sampled ray polylines carry per-vertex wavelengths
    paths = [p for m in bundles for p in m["paths"]]
    assert paths
    assert len(paths[0]["points"]) == len(paths[0]["wavelengths"])
    assert len(paths[0]["points"][0]) == 3


def test_histogram_meta_carries_facets():
    """Facet-filtered recorders expose their facet in the run metadata
    so the frontend can paint heatmap bins onto the geometry face.
    Fresh server: the shared fixture's document mutates across tests."""
    document = os.path.join(DATA, "lsc_scene_studio.yml")
    httpd = studio_server.create_server(document, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:%d" % httpd.server_address[1]
    try:
        status, _ = request(
            base, "POST", "/api/patch",
            {"op": "add-face-recorders", "node": "lsc"},
        )
        assert status == 200
        compiled = studio_server.engine.compile_scene(httpd.studio.scene)
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=5)
    meta = studio_server._histogram_meta(compiled)
    faceted = [m for m in meta.values() if m["facet"]]
    assert faceted, "face recorders should carry facet normals"
    heatmaps = [
        h
        for m in faceted
        for h in m["histograms"]
        if h["kind"] == "heatmap"
    ]
    assert heatmaps, "face recorders should carry position heatmaps"
    for h in heatmaps:
        assert h["prop_a"] in ("x", "y", "z")
        assert "edges_a" in h and "edges_b" in h


# The frontend itself (gizmo drag, WebGL viewport, SSE plots) is now
# EXECUTED end-to-end against this server by tests/test_frontend.py via
# the jsmini interpreter — the grep-based source asserts that used to
# live here are gone.


def test_mesh_triangles_in_scene_payload(tmp_path):
    """Mesh nodes ship their real triangle soup to the viewport."""
    import numpy as np

    from pvtrace_tpu import Material, Node, Scene, Sphere
    from pvtrace_tpu.engine.compiler import compile_scene
    from pvtrace_tpu.geometry.mesh import Mesh

    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float
    )
    f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    world = Node(
        name="world",
        geometry=Sphere(radius=5.0, material=Material(refractive_index=1.0)),
    )
    Node(
        name="tetra",
        parent=world,
        geometry=Mesh((v, f), material=Material(refractive_index=1.5)),
    )
    studio = studio_server.Studio()
    studio.scene = Scene(world)
    studio.spec = {}
    payload = studio.scene_payload(compile_scene(studio.scene))
    tetra = next(n for n in payload["nodes"] if n["name"] == "tetra")
    assert tetra["type"] == "mesh"
    assert tetra["triangles"] is not None
    assert len(tetra["triangles"]) == 4 * 9  # 4 faces x 3 verts x xyz
    box = next(n for n in payload["nodes"] if n["name"] == "world")
    assert box["triangles"] is None


def test_watch_sse_broadcast(server):
    """CLI `simulate --watch` parity: an external producer pushes run
    messages through server.watch_broadcast and every /api/watch client
    receives them as SSE (reference's live monitor thread,
    reference cli/main.py:85-161)."""
    import time

    base, httpd = server
    messages = []

    def consume():
        req = urllib.request.urlopen(f"{base}/api/watch", timeout=10)
        for raw in req:
            line = raw.decode().strip()
            if line.startswith("data: "):
                payload = json.loads(line[6:])
                messages.append(payload)
                if payload.get("type") == "done":
                    break

    thread = threading.Thread(target=consume, daemon=True)
    thread.start()
    time.sleep(0.5)  # let the client register
    httpd.watch_broadcast({"type": "started", "total": 10, "histograms": {}})
    httpd.watch_broadcast(
        {"type": "bundle", "traced": 10, "total": 10,
         "rays_per_second": 1.0, "recorders": {}, "paths": []}
    )
    httpd.watch_broadcast({"type": "done", "elapsed": 0.1})
    thread.join(timeout=10)
    kinds = [m["type"] for m in messages]
    assert kinds == ["started", "bundle", "done"], kinds


def test_frontend_watch_mode():
    app = os.path.join(
        os.path.dirname(studio_server.__file__), "static", "app.js"
    )
    with open(app) as fh:
        source = fh.read()
    assert 'attachRunStream("/api/watch")' in source
    assert 'get("watch")' in source
