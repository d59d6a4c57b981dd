"""Browser host environment for executing the studio frontend.

Supplies everything ``studio/static/app.js`` reaches for — a DOM built
from the real ``index.html`` (ids, data-add buttons, input defaults), a
recording 2D canvas context, a recording WebGL stub (so the shaded
viewport path executes), ``fetch`` wired to a REAL studio HTTP server
over urllib (resolved synchronously — jsmini's ``await`` unwraps it
inline), an ``EventSource`` that consumes the server's actual SSE
stream when pumped, plus URLSearchParams / typed arrays /
ResizeObserver. The returned harness records draw calls and network
traffic for assertions.
"""
import json as jsonlib
import re
import urllib.error
import urllib.request

from jsmini import (
    JSObject, NULL, UNDEF, from_python, js_num, js_str, to_python,
)


class Element(JSObject):
    """A DOM element: plain JS object + recording behaviors."""

    def __init__(self, harness, tag, element_id=""):
        super().__init__()
        self._harness = harness
        self["tagName"] = tag.upper()
        self["id"] = element_id
        self["className"] = ""
        self["textContent"] = ""
        self["value"] = ""
        self["disabled"] = False
        self["children"] = []
        self["style"] = JSObject()
        self["dataset"] = JSObject()
        self["parentElement"] = NULL
        self["width"] = 800.0
        self["height"] = 600.0
        self._listeners = {}
        self["appendChild"] = self._append_child
        self["removeChild"] = self._remove_child
        self["addEventListener"] = self._add_event_listener
        self["getBoundingClientRect"] = self._rect
        self["setAttribute"] = self._set_attribute
        self["getAttribute"] = self._get_attribute
        self["focus"] = lambda: UNDEF
        self["preventDefault"] = lambda: UNDEF
        if tag == "canvas":
            self["getContext"] = self._get_context
            self._context2d = None
            self._gl = None

    def on_set(self, name, _value):
        # Real-DOM semantics: assigning textContent replaces all
        # children (the inspector re-renders via `nodes.textContent =
        # ""` — stale rows must not accumulate).
        if name == "textContent":
            for child in self["children"]:
                if isinstance(child, Element):
                    child["parentElement"] = NULL
            self["children"] = []

    # -- behaviors ------------------------------------------------------
    def _append_child(self, child):
        self["children"].append(child)
        if isinstance(child, Element):
            child["parentElement"] = self
        return child

    def _remove_child(self, child):
        if child in self["children"]:
            self["children"].remove(child)
        return child

    def _add_event_listener(self, event_type, handler, _opts=UNDEF):
        self._listeners.setdefault(js_str(event_type), []).append(handler)
        return UNDEF

    def dispatch(self, event_type, event=None):
        """Fire listeners + the on<type> property (Python-side API)."""
        event = event if event is not None else make_event(event_type)
        for handler in self._listeners.get(event_type, []):
            self._harness.interp.call_any(handler, [event])
        prop = self.get("on" + event_type)
        if prop not in (None, UNDEF, NULL):
            self._harness.interp.call_any(prop, [event])
        return event

    def _rect(self):
        rect = JSObject()
        rect["width"] = self["width"]
        rect["height"] = self["height"]
        rect["left"] = 0.0
        rect["top"] = 0.0
        rect["right"] = self["width"]
        rect["bottom"] = self["height"]
        return rect

    def _set_attribute(self, name, value):
        self[js_str(name)] = value
        return UNDEF

    def _get_attribute(self, name):
        return self.get(js_str(name), NULL)

    def _get_context(self, kind, _opts=UNDEF):
        kind = js_str(kind)
        if kind == "2d":
            if self._context2d is None:
                self._context2d = Context2D(self._harness)
            return self._context2d
        if kind == "webgl":
            if self._harness.webgl_enabled:
                if self._gl is None:
                    self._gl = WebGLContext(self._harness)
                return self._gl
            return NULL
        return NULL


def make_event(event_type, **fields):
    event = JSObject()
    event["type"] = event_type
    event["clientX"] = 0.0
    event["clientY"] = 0.0
    event["deltaY"] = 0.0
    event["shiftKey"] = False
    event["ctrlKey"] = False
    event["metaKey"] = False
    event["key"] = ""
    event["preventDefault"] = lambda: UNDEF
    for key, value in fields.items():
        event[key] = float(value) if isinstance(value, int) else value
    return event


class Context2D(JSObject):
    """Recording canvas-2D context; every method call is logged."""

    METHODS = (
        "clearRect", "beginPath", "moveTo", "lineTo", "stroke", "fill",
        "closePath", "arc", "fillRect", "strokeRect", "putImageData",
        "drawImage", "save", "restore", "translate", "scale", "rotate",
        "fillText", "setLineDash",
    )

    def __init__(self, harness):
        super().__init__()
        self._harness = harness
        self.calls = []
        self["strokeStyle"] = "#000"
        self["fillStyle"] = "#000"
        self["lineWidth"] = 1.0
        self["globalAlpha"] = 1.0
        self["imageSmoothingEnabled"] = True
        self["font"] = ""
        for name in self.METHODS:
            self[name] = self._recorder(name)
        self["createImageData"] = self._create_image_data

    def _recorder(self, name):
        def record(*args):
            self.calls.append((name, args))
            self._harness.canvas_calls.append(name)
            return UNDEF
        return record

    def _create_image_data(self, width, height):
        image = JSObject()
        image["width"] = js_num(width)
        image["height"] = js_num(height)
        image["data"] = [0.0] * int(js_num(width) * js_num(height) * 4)
        return image

    def count(self, name):
        return sum(1 for call_name, _ in self.calls if call_name == name)


class WebGLContext(JSObject):
    """Recording WebGL stub: constants + every method app.js calls.

    Shader compilation/link always "succeed"; draw calls are recorded
    with their primitive + vertex count so tests can assert geometry
    actually reached the GPU interface.
    """

    CONSTANTS = {
        "ARRAY_BUFFER": 34962, "STATIC_DRAW": 35044,
        "DYNAMIC_DRAW": 35048, "FLOAT": 5126, "TRIANGLES": 4,
        "LINES": 1, "COLOR_BUFFER_BIT": 16384, "DEPTH_BUFFER_BIT": 256,
        "DEPTH_TEST": 2929, "BLEND": 3042, "SRC_ALPHA": 770,
        "ONE_MINUS_SRC_ALPHA": 771, "VERTEX_SHADER": 35633,
        "FRAGMENT_SHADER": 35632, "COMPILE_STATUS": 35713,
        "LINK_STATUS": 35714, "TEXTURE_2D": 3553, "RGBA": 6408,
        "UNSIGNED_BYTE": 5121, "TEXTURE_MIN_FILTER": 10241,
        "TEXTURE_MAG_FILTER": 10240, "TEXTURE_WRAP_S": 10242,
        "TEXTURE_WRAP_T": 10243, "NEAREST": 9728, "CLAMP_TO_EDGE": 33071,
    }

    def __init__(self, harness):
        super().__init__()
        self._harness = harness
        self.draw_calls = []
        self.buffer_uploads = []
        self.texture_uploads = []
        self.shader_sources = []
        self._location_counter = [0.0]
        for name, value in self.CONSTANTS.items():
            self[name] = float(value)

        def noop(*_args):
            return UNDEF

        for name in (
            "shaderSource", "compileShader", "attachShader", "linkProgram",
            "bindBuffer", "enableVertexAttribArray", "vertexAttribPointer",
            "useProgram", "uniformMatrix4fv", "uniformMatrix3fv",
            "uniform1f", "uniform1i", "uniform3f", "uniform4f", "viewport",
            "clearColor", "clear", "enable", "disable", "blendFunc",
            "depthMask", "bindTexture", "texParameteri", "deleteBuffer",
        ):
            self[name] = noop
        self["shaderSource"] = self._shader_source
        self["createShader"] = lambda kind: _handle("shader")
        self["createProgram"] = lambda: _handle("program")
        self["createBuffer"] = lambda: _handle("buffer")
        self["createTexture"] = lambda: _handle("texture")
        self["getShaderParameter"] = lambda shader, p: True
        self["getProgramParameter"] = lambda program, p: True
        self["getShaderInfoLog"] = lambda shader: ""
        self["getProgramInfoLog"] = lambda program: ""
        self["getAttribLocation"] = self._next_location
        self["getUniformLocation"] = lambda program, name: _handle(
            "uniform:" + js_str(name)
        )
        self["bufferData"] = self._buffer_data
        self["texImage2D"] = self._tex_image
        self["drawArrays"] = self._draw_arrays

    def _shader_source(self, shader, source):
        self.shader_sources.append(js_str(source))
        return UNDEF

    def _next_location(self, _program, _name):
        self._location_counter[0] += 1
        return self._location_counter[0]

    def _buffer_data(self, _target, data, _usage):
        self.buffer_uploads.append(len(data)
                                   if isinstance(data, list) else 0)
        return UNDEF

    def _tex_image(self, _t, _level, _ifmt, width, height, _b, _fmt,
                   _type, data):
        self.texture_uploads.append(
            (js_num(width), js_num(height),
             len(data) if isinstance(data, list) else 0)
        )
        return UNDEF

    def _draw_arrays(self, mode, first, count):
        self.draw_calls.append((js_num(mode), js_num(count)))
        return UNDEF


def _handle(kind):
    handle = JSObject()
    handle["__handle__"] = kind
    return handle


class URLSearchParams(JSObject):
    def __init__(self, init=UNDEF):
        super().__init__()
        self._params = {}
        if isinstance(init, JSObject) and not isinstance(init,
                                                         URLSearchParams):
            for key, value in init.items():
                if not key.startswith("_"):
                    self._params[key] = js_str(value)
        elif isinstance(init, str):
            query = init[1:] if init.startswith("?") else init
            for part in query.split("&"):
                if not part:
                    continue
                key, _, value = part.partition("=")
                self._params[key] = value
        self["set"] = self._set
        self["get"] = self._get
        self["has"] = lambda k: js_str(k) in self._params
        self["toString"] = self.__js_str__

    def _set(self, key, value):
        self._params[js_str(key)] = js_str(value)
        return UNDEF

    def _get(self, key):
        value = self._params.get(js_str(key))
        return value if value is not None else NULL

    def __js_str__(self):
        from urllib.parse import quote_plus

        return "&".join(
            f"{quote_plus(k)}={quote_plus(v)}"
            for k, v in self._params.items()
        )


class _URLSearchParamsCtor:
    name = "URLSearchParams"

    def js_construct(self, interp, args):
        return URLSearchParams(*args) if args else URLSearchParams()


class _TypedArrayCtor:
    def __init__(self, name):
        self.name = name

    def js_construct(self, interp, args):
        if not args:
            return []
        arg = args[0]
        if isinstance(arg, list):
            return [js_num(v) for v in arg]
        return [0.0] * int(js_num(arg))

    def js_instanceof(self, value):
        return isinstance(value, list)


class _ResizeObserverCtor:
    name = "ResizeObserver"

    def js_construct(self, interp, args):
        observer = JSObject()
        observer["observe"] = lambda _el=UNDEF: UNDEF
        observer["unobserve"] = lambda _el=UNDEF: UNDEF
        observer["disconnect"] = lambda: UNDEF
        return observer


class EventSourceStub(JSObject):
    """Registers with the harness; ``pump()`` reads the REAL SSE stream
    from the server and dispatches each event to ``onmessage``."""

    def __init__(self, harness, url):
        super().__init__()
        self._harness = harness
        self.url = js_str(url)
        self.closed = False
        self["url"] = self.url
        self["close"] = self._close
        self["onmessage"] = NULL
        self["onerror"] = NULL
        harness.event_sources.append(self)

    def _close(self):
        self.closed = True
        return UNDEF

    def pump(self, limit=None):
        """Consume the server's SSE stream, dispatching messages until
        the stream ends, `limit` messages arrive, or close() is called
        from inside a handler. Returns the number dispatched."""
        full = self._harness.base_url + self.url
        dispatched = 0
        with urllib.request.urlopen(full, timeout=600) as response:
            buffer = []
            for raw in response:
                line = raw.decode("utf-8").rstrip("\n").rstrip("\r")
                if line.startswith("data:"):
                    buffer.append(line[5:].lstrip())
                    continue
                if line == "" and buffer:
                    data = "\n".join(buffer)
                    buffer = []
                    dispatched += 1
                    handler = self.get("onmessage")
                    if handler not in (None, UNDEF, NULL):
                        event = JSObject()
                        event["data"] = data
                        self._harness.interp.call_any(handler, [event])
                    if self.closed or (limit and dispatched >= limit):
                        break
        return dispatched


class _EventSourceCtor:
    def __init__(self, harness):
        self.harness = harness
        self.name = "EventSource"

    def js_construct(self, interp, args):
        return EventSourceStub(self.harness, args[0] if args else "")


class BrowserHarness:
    """Everything the test needs to boot app.js against a live server."""

    def __init__(self, base_url, index_html, search="", webgl=True):
        self.base_url = base_url.rstrip("/")
        self.webgl_enabled = webgl
        self.interp = None  # set by install()
        self.canvas_calls = []
        self.event_sources = []
        self.network = []  # (method, url, status)
        self.console = []
        self.elements = {}
        self.document = self._build_document(index_html)
        self.search = search

    # -- DOM construction ----------------------------------------------
    def _build_document(self, index_html):
        document = JSObject()
        body = Element(self, "body")
        self.body = body

        # Elements with ids (tag inferred from the markup).
        for match in re.finditer(
            r"<(\w+)[^>]*\bid=\"([a-z-]+)\"[^>]*>", index_html
        ):
            tag, element_id = match.group(1), match.group(2)
            element = Element(self, tag, element_id)
            value = re.search(r"value=\"([^\"]*)\"", match.group(0))
            if value:
                element["value"] = value.group(1)
            self.elements[element_id] = element
            body["appendChild"](element)

        # data-add buttons.
        self.data_add_buttons = []
        for match in re.finditer(r"<button[^>]*data-add=\"(\w+)\"", index_html):
            button = Element(self, "button")
            button["dataset"]["add"] = match.group(1)
            self.data_add_buttons.append(button)
            body["appendChild"](button)
        self.component_button = None
        if re.search(r"<button[^>]*data-add-component", index_html):
            self.component_button = Element(self, "button")
            body["appendChild"](self.component_button)

        document["getElementById"] = self._get_element_by_id
        document["createElement"] = lambda tag: Element(self, js_str(tag))
        document["querySelectorAll"] = self._query_selector_all
        document["querySelector"] = self._query_selector
        document["body"] = body
        document["addEventListener"] = lambda *_a: UNDEF
        return document

    def _get_element_by_id(self, element_id):
        element = self.elements.get(js_str(element_id))
        if element is None:
            raise KeyError(
                f"index.html has no element with id={js_str(element_id)!r}"
            )
        return element

    def _query_selector_all(self, selector):
        if js_str(selector) == "[data-add]":
            return list(self.data_add_buttons)
        return []

    def _query_selector(self, selector):
        if js_str(selector) == "[data-add-component]":
            return self.component_button or NULL
        results = self._query_selector_all(selector)
        return results[0] if results else NULL

    # -- network --------------------------------------------------------
    def _fetch(self, url, opts=UNDEF):
        method = "GET"
        body = None
        if isinstance(opts, JSObject):
            if opts.get("method") not in (None, UNDEF):
                method = js_str(opts["method"])
            if opts.get("body") not in (None, UNDEF):
                body = js_str(opts["body"]).encode("utf-8")
        request = urllib.request.Request(
            self.base_url + js_str(url), data=body, method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(request, timeout=600) as response:
                status = response.status
                payload = response.read()
        except urllib.error.HTTPError as error:
            status = error.code
            payload = error.read()
        self.network.append((method, js_str(url), status))
        result = JSObject()
        result["ok"] = 200 <= status < 300
        result["status"] = float(status)
        result["statusText"] = f"HTTP {status}"
        parsed = from_python(jsonlib.loads(payload.decode("utf-8")))
        result["json"] = lambda: parsed
        result["text"] = lambda: payload.decode("utf-8")
        return result

    # -- harness API ----------------------------------------------------
    def install(self, interp):
        """Declare every browser global in the interpreter."""
        self.interp = interp
        g = interp.globals
        g.declare("document", self.document)

        self.window = Element(self, "window")
        g.declare("window", self.window)

        location = JSObject()
        location["search"] = self.search
        location["href"] = self.base_url + "/"
        g.declare("location", location)

        console = JSObject()
        for level in ("log", "warn", "error", "info", "debug"):
            console[level] = self._console(level)
        g.declare("console", console)

        g.declare("fetch", self._fetch)
        g.declare("EventSource", _EventSourceCtor(self))
        g.declare("URLSearchParams", _URLSearchParamsCtor())
        g.declare("Float32Array", _TypedArrayCtor("Float32Array"))
        g.declare("Float64Array", _TypedArrayCtor("Float64Array"))
        g.declare("Uint8Array", _TypedArrayCtor("Uint8Array"))
        g.declare("Int32Array", _TypedArrayCtor("Int32Array"))
        g.declare("ResizeObserver", _ResizeObserverCtor())
        g.declare("requestAnimationFrame", lambda cb: (
            interp.call_any(cb, [0.0]), 0.0
        )[1])
        g.declare("setTimeout", lambda cb, _ms=0.0, *a: (
            interp.call_any(cb, list(a)), 0.0
        )[1])
        g.declare("clearTimeout", lambda _id=UNDEF: UNDEF)
        g.declare("alert", lambda *_a: UNDEF)
        g.declare("performance", from_python({"now": 0}))
        return self

    def _console(self, level):
        def log(*args):
            self.console.append((level, [to_python(a) for a in args]))
            return UNDEF
        return log

    # convenience accessors for tests --------------------------------
    def el(self, element_id):
        return self.elements[element_id]

    def window_dispatch(self, event_type, **fields):
        event = make_event(event_type, **fields)
        self.window.dispatch(event_type, event)
        return event
