/* pvtrace_tpu studio frontend.
 *
 * Hand-written viewport (canvas 2D, orbit camera, wireframe geometry,
 * wavelength-coloured ray paths), YAML editor, inspector panels and
 * live recorder plots. Results stream over Server-Sent Events.
 */
"use strict";

// ---------------------------------------------------------------- state

const state = {
  scene: null,        // payload from the server
  paths: [],          // sampled ray polylines from the current run
  selected: null,     // selected node name
  running: false,
  histMeta: null,     // histogram metadata for the current run
  recorders: null,    // latest recorder tallies
  gizmo: null,        // live drag-to-move state {name, world}
};

const $ = (id) => document.getElementById(id);

// ---------------------------------------------------------------- api

async function api(method, url, body) {
  const response = await fetch(url, {
    method,
    headers: { "Content-Type": "application/json" },
    body: body === undefined ? undefined : JSON.stringify(body),
  });
  const data = await response.json();
  if (!response.ok) throw new Error(data.error || response.statusText);
  return data;
}

async function applyDocument(text) {
  const error = $("editor-error");
  error.textContent = "";
  try {
    const data = await api("PUT", "/api/document", { text });
    state.scene = data.scene;
    state.paths = [];
    fitCameraToScene();
    renderAll();
  } catch (exception) {
    error.textContent = exception.message;
  }
}

async function patch(payload) {
  const error = $("editor-error");
  error.textContent = "";
  try {
    const data = await api("POST", "/api/patch", payload);
    state.scene = data.scene;
    $("editor").value = data.text;
    renderAll();
  } catch (exception) {
    error.textContent = exception.message;
  }
}

// ---------------------------------------------------------------- math

function mat4Apply(m, p) {
  // m: row-major 16-array, p: [x, y, z] -> transformed point
  return [
    m[0] * p[0] + m[1] * p[1] + m[2] * p[2] + m[3],
    m[4] * p[0] + m[5] * p[1] + m[6] * p[2] + m[7],
    m[8] * p[0] + m[9] * p[1] + m[10] * p[2] + m[11],
  ];
}

function wavelengthToRGB(nm) {
  // Visible-spectrum approximation (matches pvtrace_tpu.light.utils).
  let r = 0, g = 0, b = 0;
  if (nm < 380) { r = 0.3; b = 0.6; }
  else if (nm < 440) { r = -(nm - 440) / 60; b = 1; }
  else if (nm < 490) { g = (nm - 440) / 50; b = 1; }
  else if (nm < 510) { g = 1; b = -(nm - 510) / 20; }
  else if (nm < 580) { r = (nm - 510) / 70; g = 1; }
  else if (nm < 645) { r = 1; g = -(nm - 645) / 65; }
  else if (nm <= 780) { r = 1; }
  else { r = 0.5; }
  const k = 255;
  return `rgb(${Math.round(r * k)},${Math.round(g * k)},${Math.round(b * k)})`;
}

// Wireframe edge lists in the local frame ---------------------------------

function circlePoints(radius, z, n, axis) {
  const points = [];
  for (let i = 0; i <= n; i++) {
    const t = (2 * Math.PI * i) / n;
    const u = radius * Math.cos(t), v = radius * Math.sin(t);
    if (axis === "z") points.push([u, v, z]);
    else if (axis === "y") points.push([u, z, v]);
    else points.push([z, u, v]);
  }
  return points;
}

function polylineEdges(points) {
  const edges = [];
  for (let i = 0; i + 1 < points.length; i++) edges.push([points[i], points[i + 1]]);
  return edges;
}

function geometryEdges(node) {
  const p = node.params;
  if (node.type === "box" || node.type === "mesh") {
    // Meshes render as their bounding box (server sends extents).
    const [a, b, c] = [p[0] / 2, p[1] / 2, p[2] / 2];
    const v = [];
    for (const sx of [-1, 1]) for (const sy of [-1, 1]) for (const sz of [-1, 1])
      v.push([sx * a, sy * b, sz * c]);
    const index = [[0,1],[2,3],[4,5],[6,7],[0,2],[1,3],[4,6],[5,7],[0,4],[1,5],[2,6],[3,7]];
    return index.map(([i, j]) => [v[i], v[j]]);
  }
  if (node.type === "sphere") {
    const r = p[0];
    let edges = [];
    for (const axis of ["x", "y", "z"])
      edges = edges.concat(polylineEdges(circlePoints(r, 0, 32, axis)));
    edges = edges.concat(polylineEdges(circlePoints(r * 0.7071, r * 0.7071, 32, "z")));
    edges = edges.concat(polylineEdges(circlePoints(r * 0.7071, -r * 0.7071, 32, "z")));
    return edges;
  }
  if (node.type === "cylinder") {
    const [length, r] = [p[0], p[1]];
    let edges = [];
    edges = edges.concat(polylineEdges(circlePoints(r, length / 2, 32, "z")));
    edges = edges.concat(polylineEdges(circlePoints(r, -length / 2, 32, "z")));
    for (const t of [0, Math.PI / 2, Math.PI, (3 * Math.PI) / 2]) {
      const x = r * Math.cos(t), y = r * Math.sin(t);
      edges.push([[x, y, -length / 2], [x, y, length / 2]]);
    }
    return edges;
  }
  return [];
}

// ---------------------------------------------------------------- camera

const camera = { yaw: 0.7, pitch: 0.5, dist: 20, target: [0, 0, 0], fov: 500 };

function cameraBasis() {
  const cy = Math.cos(camera.yaw), sy = Math.sin(camera.yaw);
  const cp = Math.cos(camera.pitch), sp = Math.sin(camera.pitch);
  // Z-up world; camera looks at target.
  const forward = [cp * cy, cp * sy, sp];        // target -> camera
  const right = [-sy, cy, 0];
  const up = [-sp * cy, -sp * sy, cp];
  return { forward, right, up };
}

function project(point, width, height) {
  const { forward, right, up } = cameraBasis();
  const eye = [
    camera.target[0] + forward[0] * camera.dist,
    camera.target[1] + forward[1] * camera.dist,
    camera.target[2] + forward[2] * camera.dist,
  ];
  const d = [point[0] - eye[0], point[1] - eye[1], point[2] - eye[2]];
  const z = -(d[0] * forward[0] + d[1] * forward[1] + d[2] * forward[2]);
  if (z <= 0.05) return null; // behind the camera
  const x = d[0] * right[0] + d[1] * right[1] + d[2] * right[2];
  const y = d[0] * up[0] + d[1] * up[1] + d[2] * up[2];
  const s = camera.fov / z;
  return [width / 2 + x * s, height / 2 - y * s, z];
}

function fitCameraToScene() {
  if (!state.scene) return;
  let radius = 1;
  for (const node of state.scene.nodes) {
    if (node.root) continue; // world container is usually huge
    const extent = Math.max(...node.params.map(Math.abs), 0.5);
    const center = mat4Apply(node.matrix, [0, 0, 0]);
    radius = Math.max(radius, Math.hypot(...center) + extent);
  }
  camera.dist = radius * 3.2;
}

// ---------------------------------------------------------------- viewport

function drawViewport() {
  const canvas = $("viewport");
  const rect = canvas.parentElement.getBoundingClientRect();
  if (canvas.width !== rect.width || canvas.height !== rect.height) {
    canvas.width = rect.width;
    canvas.height = rect.height;
  }
  const context = canvas.getContext("2d");
  const { width, height } = canvas;
  context.clearRect(0, 0, width, height);

  const line = (a, b, style, lineWidth) => {
    const pa = project(a, width, height), pb = project(b, width, height);
    if (!pa || !pb) return;
    context.strokeStyle = style;
    context.lineWidth = lineWidth || 1;
    context.beginPath();
    context.moveTo(pa[0], pa[1]);
    context.lineTo(pb[0], pb[1]);
    context.stroke();
  };

  // axes
  line([0, 0, 0], [1, 0, 0], "#7a3030", 1.5);
  line([0, 0, 0], [0, 1, 0], "#2f6b2f", 1.5);
  line([0, 0, 0], [0, 0, 1], "#2d5e95", 1.5);

  // recorder heatmaps painted on geometry faces, under everything else
  drawFaceHeatmaps(context, width, height);

  // ray paths first so geometry reads on top
  context.globalAlpha = 0.75;
  for (const path of state.paths) {
    for (let i = 0; i + 1 < path.points.length; i++) {
      line(path.points[i], path.points[i + 1],
           wavelengthToRGB(path.wavelengths[i + 1]), 1);
    }
  }
  context.globalAlpha = 1;

  if (!state.scene) return;
  for (const node of state.scene.nodes) {
    const selected = node.name === state.selected;
    const style = selected ? "#4da3ff" : node.root ? "#3a4150" : "#9aa3b0";
    for (const [a, b] of geometryEdges(node))
      line(mat4Apply(node.matrix, a), mat4Apply(node.matrix, b), style,
           selected ? 1.8 : 1);
  }
  for (const light of state.scene.lights) {
    const origin = mat4Apply(light.matrix, [0, 0, 0]);
    const tip = mat4Apply(light.matrix, [0, 0, -1]);
    line(origin, tip, "#ffd75e", 2);
    const p = project(origin, width, height);
    if (p) {
      context.fillStyle = "#ffd75e";
      context.beginPath();
      context.arc(p[0], p[1], 4, 0, 2 * Math.PI);
      context.fill();
    }
  }

  drawGizmo(context, width, height);
}

// Transform gizmo: a handle at the selected node's origin. Dragging it
// moves the node in the camera-parallel plane through its origin and
// posts an `op: move` patch (the server converts the world position to
// the parent frame and round-trips the YAML document).

function selectedNode() {
  if (!state.scene || !state.selected) return null;
  const node = state.scene.nodes.find((n) => n.name === state.selected);
  return node && !node.root ? node : null;
}

function nodeOrigin(node) {
  return [node.matrix[3], node.matrix[7], node.matrix[11]];
}

function drawGizmo(context, width, height) {
  const node = selectedNode();
  if (!node) return;
  const origin = nodeOrigin(node);
  const p = project(origin, width, height);
  if (!p) return;
  context.strokeStyle = state.gizmo ? "#ffb14d" : "#4da3ff";
  context.lineWidth = 2;
  context.beginPath();
  context.arc(p[0], p[1], GIZMO_RADIUS, 0, 2 * Math.PI);
  context.stroke();
  context.beginPath();
  context.moveTo(p[0] - GIZMO_RADIUS - 4, p[1]);
  context.lineTo(p[0] + GIZMO_RADIUS + 4, p[1]);
  context.moveTo(p[0], p[1] - GIZMO_RADIUS - 4);
  context.lineTo(p[0], p[1] + GIZMO_RADIUS + 4);
  context.stroke();
}

const GIZMO_RADIUS = 10;

function gizmoHit(node, clientX, clientY, canvas) {
  const rect = canvas.getBoundingClientRect();
  const p = project(nodeOrigin(node), canvas.width, canvas.height);
  if (!p) return null;
  const dx = clientX - rect.left - p[0];
  const dy = clientY - rect.top - p[1];
  if (Math.hypot(dx, dy) > GIZMO_RADIUS + 6) return null;
  return { depth: p[2] };
}

function gizmoDrag(dx, dy, depth) {
  // Screen delta -> world delta in the camera-parallel plane at depth.
  const { right, up } = cameraBasis();
  const k = depth / camera.fov;
  const node = selectedNode();
  if (!node) return;
  for (let i = 0; i < 3; i++) {
    const d = (dx * right[i] - dy * up[i]) * k;
    state.gizmo.world[i] += d;
  }
  // Live preview: shift the node's matrix translation.
  node.matrix[3] = state.gizmo.world[0];
  node.matrix[7] = state.gizmo.world[1];
  node.matrix[11] = state.gizmo.world[2];
}

// Recorder heatmaps painted on geometry faces: a facet-filtered
// escaping recorder with a 2D position heatmap colours its box face by
// bin count during live runs (viridis, peak-normalised per recorder).

const POSITION_AXES = { x: 0, y: 1, z: 2 };

function drawFaceHeatmaps(context, width, height) {
  if (!state.scene || !state.histMeta || !state.recorders) return;
  for (const [name, meta] of Object.entries(state.histMeta)) {
    if (!meta.facet) continue;
    const tallies = state.recorders[name];
    const node = state.scene.nodes.find((n) => n.name === meta.node);
    if (!tallies || !node || node.type !== "box") continue;
    meta.histograms.forEach((hist, index) => {
      if (hist.kind !== "heatmap") return;
      const axisA = POSITION_AXES[hist.prop_a];
      const axisB = POSITION_AXES[hist.prop_b];
      if (axisA === undefined || axisB === undefined) return;
      const entry = tallies.histograms[index];
      if (!entry) return;
      paintFace(context, width, height, node, meta.facet, hist, entry,
                axisA, axisB);
    });
  }
}

function paintFace(context, width, height, node, facet, hist, entry,
                   axisA, axisB) {
  // The fixed local coordinate: the face the facet normal points out of.
  const fixedAxis = facet.findIndex((v) => Math.abs(v) > 0.5);
  if (fixedAxis < 0 || fixedAxis === axisA || fixedAxis === axisB) return;
  const offset = facet[fixedAxis] * (node.params[fixedAxis] / 2);
  const [na, nb] = entry.shape;
  const peak = Math.max(1, ...entry.values);
  const corner = (a, b) => {
    const local = [0, 0, 0];
    local[axisA] = a;
    local[axisB] = b;
    local[fixedAxis] = offset;
    return project(mat4Apply(node.matrix, local), width, height);
  };
  context.globalAlpha = 0.85;
  for (let i = 0; i < na; i++) {
    for (let j = 0; j < nb; j++) {
      const value = entry.values[i * nb + j];
      if (!value) continue;
      const quad = [
        corner(hist.edges_a[i], hist.edges_b[j]),
        corner(hist.edges_a[i + 1], hist.edges_b[j]),
        corner(hist.edges_a[i + 1], hist.edges_b[j + 1]),
        corner(hist.edges_a[i], hist.edges_b[j + 1]),
      ];
      if (quad.some((p) => !p)) continue;
      const [r, g, b] = heatColor(value / peak);
      context.fillStyle = `rgb(${r},${g},${b})`;
      context.beginPath();
      context.moveTo(quad[0][0], quad[0][1]);
      for (let k = 1; k < 4; k++) context.lineTo(quad[k][0], quad[k][1]);
      context.closePath();
      context.fill();
    }
  }
  context.globalAlpha = 1;
}

function setupViewportControls() {
  const canvas = $("viewport");
  let dragging = null;
  canvas.addEventListener("mousedown", (event) => {
    const node = selectedNode();
    const hit = node && gizmoHit(node, event.clientX, event.clientY, canvas);
    if (hit) {
      state.gizmo = {
        name: node.name,
        world: nodeOrigin(node),
        depth: hit.depth,
      };
      dragging = { x: event.clientX, y: event.clientY, gizmo: true };
      drawViewport();
      return;
    }
    dragging = { x: event.clientX, y: event.clientY, pan: event.shiftKey };
  });
  window.addEventListener("mouseup", () => {
    if (state.gizmo) {
      const { name, world } = state.gizmo;
      state.gizmo = null;
      patch({ op: "move", node: name, world_position: world });
    }
    dragging = null;
  });
  window.addEventListener("mousemove", (event) => {
    if (!dragging) return;
    const dx = event.clientX - dragging.x;
    const dy = event.clientY - dragging.y;
    dragging.x = event.clientX;
    dragging.y = event.clientY;
    if (dragging.gizmo && state.gizmo) {
      gizmoDrag(dx, dy, state.gizmo.depth);
    } else if (dragging.pan) {
      const { right, up } = cameraBasis();
      const k = camera.dist / camera.fov;
      for (let i = 0; i < 3; i++)
        camera.target[i] += (-dx * right[i] + dy * up[i]) * k;
    } else {
      camera.yaw -= dx * 0.008;
      camera.pitch = Math.min(1.5, Math.max(-1.5, camera.pitch + dy * 0.008));
    }
    drawViewport();
  });
  canvas.addEventListener("wheel", (event) => {
    event.preventDefault();
    camera.dist *= Math.exp(event.deltaY * 0.0012);
    drawViewport();
  }, { passive: false });
  new ResizeObserver(drawViewport).observe(canvas.parentElement);
}

// ---------------------------------------------------------------- inspector

function nodeRow(node) {
  const row = document.createElement("div");
  row.className = "node-row" + (node.name === state.selected ? " selected" : "");

  const name = document.createElement("div");
  name.className = "name";
  name.textContent = node.name + (node.root ? " (root)" : "");
  name.onclick = () => {
    state.selected = node.name === state.selected ? null : node.name;
    renderAll();
  };
  row.appendChild(name);

  const meta = document.createElement("div");
  meta.className = "meta";
  meta.textContent = `${node.type} · n=${node.refractive_index.toFixed(3)}`;
  row.appendChild(meta);

  if (node.name === state.selected && !node.root) {
    const location = (node.spec && node.spec.location) || [0, 0, 0];
    const edit = document.createElement("div");
    edit.className = "vec-edit";
    const inputs = location.map((v) => {
      const input = document.createElement("input");
      input.type = "number";
      input.step = "0.1";
      input.value = v;
      edit.appendChild(input);
      return input;
    });
    const moveButton = document.createElement("button");
    moveButton.textContent = "move";
    moveButton.onclick = () =>
      patch({
        op: "set",
        path: ["nodes", node.name, "location"],
        value: inputs.map((i) => parseFloat(i.value) || 0),
      });
    edit.appendChild(moveButton);
    row.appendChild(edit);

    const actions = document.createElement("div");
    actions.className = "actions";
    const addRecorder = document.createElement("button");
    addRecorder.textContent = "+ recorder";
    addRecorder.onclick = () => patch({ op: "add-recorder", node: node.name });
    actions.appendChild(addRecorder);
    if (node.type === "box") {
      const faces = document.createElement("button");
      faces.textContent = "+ face heatmaps";
      faces.onclick = () => patch({ op: "add-face-recorders", node: node.name });
      actions.appendChild(faces);
    }
    const remove = document.createElement("button");
    remove.textContent = "delete";
    remove.onclick = () => patch({ op: "delete-node", node: node.name });
    actions.appendChild(remove);
    row.appendChild(actions);
  }
  return row;
}

function recorderRow(recorder) {
  const row = document.createElement("div");
  row.className = "rec-row";
  const name = document.createElement("div");
  name.textContent = recorder.name + (recorder.auto ? " (auto)" : "");
  row.appendChild(name);
  const meta = document.createElement("div");
  meta.className = "meta";
  const facet = recorder.facet ? ` · facet [${recorder.facet}]` : "";
  meta.textContent = `${recorder.event} @ ${recorder.node}${facet}`;
  row.appendChild(meta);
  if (!recorder.auto) {
    const actions = document.createElement("div");
    actions.className = "actions";
    const remove = document.createElement("button");
    remove.textContent = "delete";
    remove.onclick = () => patch({ op: "delete-recorder", recorder: recorder.name });
    actions.appendChild(remove);
    row.appendChild(actions);
  }
  return row;
}

function renderInspector() {
  const nodes = $("nodes");
  const recorders = $("recorders");
  nodes.textContent = "";
  recorders.textContent = "";
  if (!state.scene) return;
  for (const node of state.scene.nodes) nodes.appendChild(nodeRow(node));
  for (const recorder of state.scene.recorders)
    recorders.appendChild(recorderRow(recorder));
}

// ---------------------------------------------------------------- plots

const VIRIDIS = [
  [68, 1, 84], [71, 44, 122], [59, 81, 139], [44, 113, 142], [33, 144, 141],
  [39, 173, 129], [92, 200, 99], [170, 220, 50], [253, 231, 37],
];

function heatColor(t) {
  const x = Math.min(0.9999, Math.max(0, t)) * (VIRIDIS.length - 1);
  const i = Math.floor(x), f = x - i;
  const a = VIRIDIS[i], b = VIRIDIS[i + 1];
  return [
    Math.round(a[0] + (b[0] - a[0]) * f),
    Math.round(a[1] + (b[1] - a[1]) * f),
    Math.round(a[2] + (b[2] - a[2]) * f),
  ];
}

function drawPlots() {
  const container = $("plots");
  container.textContent = "";
  if (!state.histMeta || !state.recorders) return;
  for (const [name, meta] of Object.entries(state.histMeta)) {
    const tallies = state.recorders[name];
    if (!tallies) continue;
    meta.histograms.forEach((hist, index) => {
      const entry = tallies.histograms[index];
      if (!entry) return;
      const plot = document.createElement("div");
      plot.className = "plot";
      const title = document.createElement("div");
      title.className = "title";
      title.textContent = `${name} · ${tallies.rays} rays`;
      plot.appendChild(title);
      const canvas = document.createElement("canvas");
      canvas.width = 220;
      canvas.height = 140;
      plot.appendChild(canvas);
      const context = canvas.getContext("2d");
      if (hist.kind === "heatmap") {
        const [na, nb] = entry.shape;
        const peak = Math.max(1, ...entry.values);
        const image = context.createImageData(nb, na);
        for (let i = 0; i < na; i++)
          for (let j = 0; j < nb; j++) {
            const value = entry.values[i * nb + j];
            const [r, g, b] = heatColor(value / peak);
            // flip vertically: histogram row 0 is the low edge
            const k = ((na - 1 - i) * nb + j) * 4;
            image.data[k] = r; image.data[k + 1] = g;
            image.data[k + 2] = b; image.data[k + 3] = 255;
          }
        const off = document.createElement("canvas");
        off.width = nb; off.height = na;
        off.getContext("2d").putImageData(image, 0, 0);
        context.imageSmoothingEnabled = false;
        context.drawImage(off, 0, 0, canvas.width, canvas.height);
      } else {
        const values = entry.values;
        const peak = Math.max(1, ...values);
        const barWidth = canvas.width / values.length;
        const isWavelength = hist.prop === "wavelength";
        for (let i = 0; i < values.length; i++) {
          const h = (values[i] / peak) * (canvas.height - 8);
          context.fillStyle = isWavelength
            ? wavelengthToRGB((hist.edges[i] + hist.edges[i + 1]) / 2)
            : "#4da3ff";
          context.fillRect(i * barWidth, canvas.height - h, barWidth - 0.5, h);
        }
      }
      container.appendChild(plot);
    });
  }
}

// ---------------------------------------------------------------- run

let eventSource = null;

function setRunning(running) {
  state.running = running;
  $("run").disabled = running;
  $("stop").disabled = !running;
}

function run() {
  if (!state.scene) return;
  const params = new URLSearchParams({
    rays: $("rays").value,
    bundle: $("bundle").value,
    record_every: "1000",
    max_paths: "200",
  });
  if ($("seed").value) params.set("seed", $("seed").value);
  state.paths = [];
  setRunning(true);
  eventSource = new EventSource(`/api/run?${params}`);
  eventSource.onmessage = (event) => {
    const message = JSON.parse(event.data);
    if (message.type === "started") {
      state.histMeta = message.histograms;
      state.recorders = null;
    } else if (message.type === "bundle") {
      state.recorders = message.recorders;
      if (message.paths.length) state.paths.push(...message.paths);
      $("rate").textContent =
        `${Math.round(message.rays_per_second).toLocaleString()} rays/s`;
      $("progress").textContent =
        `${message.traced.toLocaleString()} / ${message.total.toLocaleString()}`;
      drawViewport();
      drawPlots();
    } else if (message.type === "done") {
      eventSource.close();
      eventSource = null;
      setRunning(false);
      $("status").textContent =
        `done in ${message.elapsed.toFixed(2)} s`;
    }
  };
  eventSource.onerror = () => {
    if (eventSource) eventSource.close();
    eventSource = null;
    setRunning(false);
  };
}

async function stop() {
  await api("POST", "/api/stop", {});
}

// ---------------------------------------------------------------- boot

function renderAll() {
  drawViewport();
  renderInspector();
}

async function boot() {
  setupViewportControls();
  $("apply").onclick = () => applyDocument($("editor").value);
  $("editor").addEventListener("keydown", (event) => {
    if ((event.ctrlKey || event.metaKey) && event.key === "Enter")
      applyDocument($("editor").value);
  });
  $("run").onclick = run;
  $("stop").onclick = stop;
  $("save").onclick = async () => {
    try {
      const data = await api("POST", "/api/save", {});
      $("status").textContent = `saved ${data.saved}`;
    } catch (exception) {
      $("status").textContent = exception.message;
    }
  };
  for (const button of document.querySelectorAll("[data-add]"))
    button.onclick = () => patch({ op: "add-node", kind: button.dataset.add });
  document.querySelector("[data-add-component]").onclick = () =>
    patch({ op: "add-component" });

  const data = await api("GET", "/api/document");
  $("editor").value = data.text;
  if (data.text) await applyDocument(data.text);
}

boot();
