"""Property access + built-in methods for jsmini values.

Dispatches `obj.prop` / `obj[key]` for every value kind the studio
frontend touches: strings, numbers, arrays, plain objects, Map/Set,
regexes and host objects (which expose `js_get`). Array/string methods
bind their receiver via closures, so `arr.map` etc. work as first-class
values.
"""
import math

from jsmini import (
    JSError, JSFunction, JSMap, JSObject, JSRegex, JSSet, NULL, UNDEF,
    js_num, js_str, js_truthy, make_error,
)


def property_of(interp, obj, name):
    if not isinstance(name, str):
        if isinstance(name, float) and isinstance(obj, list):
            index = int(name)
            if 0 <= index < len(obj):
                return obj[index]
            return UNDEF
        name = js_str(name)

    if obj is UNDEF or obj is NULL:
        raise JSError(make_error(
            f"Cannot read properties of {js_str(obj)} (reading {name!r})",
            kind="TypeError",
        ))

    if isinstance(obj, JSObject):
        if name in obj:
            return obj[name]
        getter = getattr(obj, "js_get", None)
        if getter is not None:
            return getter(name)
        return UNDEF

    if isinstance(obj, list):
        return _array_property(interp, obj, name)

    if isinstance(obj, str):
        return _string_property(interp, obj, name)

    if isinstance(obj, bool):
        return UNDEF

    if isinstance(obj, float):
        return _number_property(obj, name)

    if isinstance(obj, JSMap):
        return _simple_methods(obj, name, ("get", "set", "has", "delete",
                                           "clear"),
                               {"size": lambda: obj.size,
                                "entries": obj.__js_iter__,
                                "keys": lambda: [k for k, _v in
                                                 obj.__js_iter__()],
                                "values": lambda: [v for _k, v in
                                                   obj.__js_iter__()],
                                "forEach": lambda cb: [
                                    interp.call_any(cb, [v, k, obj])
                                    for k, v in obj.__js_iter__()
                                ] and UNDEF})

    if isinstance(obj, JSSet):
        return _simple_methods(obj, name, ("add", "has", "delete"),
                               {"size": lambda: obj.size})

    if isinstance(obj, JSRegex):
        if name == "source":
            return obj.source
        if name == "flags":
            return obj.flags
        if name == "test":
            return lambda s: obj.re.search(js_str(s)) is not None
        return UNDEF

    getter = getattr(obj, "js_get", None)
    if getter is not None:
        value = getter(name)
        if value is not NotImplemented:
            return value

    attr = getattr(obj, name, None)
    if attr is not None and (callable(attr) or isinstance(
            attr, (float, str, bool, list, JSObject))):
        return attr
    return UNDEF


def _simple_methods(obj, name, method_names, extras):
    if name in method_names:
        return getattr(obj, name)
    if name in extras:
        value = extras[name]
        if name == "size":
            return value()
        return value
    return UNDEF


# ---------------------------------------------------------------- number


def _number_property(value, name):
    if name == "toFixed":
        def to_fixed(digits=0.0):
            return f"{value:.{int(js_num(digits))}f}"
        return to_fixed
    if name == "toLocaleString":
        def to_locale():
            if value == int(value) and math.isfinite(value):
                return f"{int(value):,}"
            return f"{value:,}"
        return to_locale
    if name == "toString":
        return lambda *a: js_str(value)
    if name == "toPrecision":
        return lambda p: f"{value:.{int(js_num(p))}g}"
    return UNDEF


# ---------------------------------------------------------------- string


def _string_property(interp, s, name):
    if name == "length":
        return float(len(s))
    try:
        index = int(name)
        if 0 <= index < len(s):
            return s[index]
    except ValueError:
        pass
    methods = {
        "charAt": lambda i=0.0: s[int(js_num(i))]
        if 0 <= int(js_num(i)) < len(s) else "",
        "charCodeAt": lambda i=0.0: float(ord(s[int(js_num(i))]))
        if 0 <= int(js_num(i)) < len(s) else float("nan"),
        "indexOf": lambda sub, start=0.0: float(
            s.find(js_str(sub), int(js_num(start)))
        ),
        "lastIndexOf": lambda sub: float(s.rfind(js_str(sub))),
        "includes": lambda sub: js_str(sub) in s,
        "startsWith": lambda sub: s.startswith(js_str(sub)),
        "endsWith": lambda sub: s.endswith(js_str(sub)),
        "slice": lambda a=0.0, b=UNDEF: _slice(s, a, b),
        "substring": lambda a=0.0, b=UNDEF: _substring(s, a, b),
        "toUpperCase": lambda: s.upper(),
        "toLowerCase": lambda: s.lower(),
        "trim": lambda: s.strip(),
        "padStart": lambda n, fill=" ": s.rjust(int(js_num(n)),
                                                js_str(fill)[0] or " "),
        "padEnd": lambda n, fill=" ": s.ljust(int(js_num(n)),
                                              js_str(fill)[0] or " "),
        "split": lambda sep=UNDEF, *_a: (
            list(s) if sep is UNDEF else s.split(js_str(sep))
        ),
        "repeat": lambda n: s * int(js_num(n)),
        "concat": lambda *parts: s + "".join(js_str(p) for p in parts),
        "replace": lambda pat, repl: _replace(s, pat, repl, first=True),
        "replaceAll": lambda pat, repl: _replace(s, pat, repl, first=False),
        "match": lambda pattern: _match(s, pattern),
        "toString": lambda: s,
    }
    return methods.get(name, UNDEF)


def _slice(s, a, b):
    start = int(js_num(a))
    end = len(s) if b is UNDEF else int(js_num(b))
    return s[slice(start, end)] if start >= 0 or end >= 0 else s[start:end]


def _substring(s, a, b):
    start = max(0, int(js_num(a)))
    end = len(s) if b is UNDEF else max(0, int(js_num(b)))
    if start > end:
        start, end = end, start
    return s[start:end]


def _replace(s, pattern, repl, first):
    repl_str = js_str(repl)
    if isinstance(pattern, JSRegex):
        count = 0 if ("g" in pattern.flags or not first) else 1
        return pattern.re.sub(repl_str.replace("\\", "\\\\"), s,
                              count=count)
    needle = js_str(pattern)
    return s.replace(needle, repl_str, 1 if first else -1)


def _match(s, pattern):
    if not isinstance(pattern, JSRegex):
        pattern = JSRegex(js_str(pattern), "")
    if "g" in pattern.flags:
        found = pattern.re.findall(s)
        return found if found else NULL
    m = pattern.re.search(s)
    if not m:
        return NULL
    return [m.group(0)] + [g if g is not None else UNDEF
                           for g in m.groups()]


# ---------------------------------------------------------------- array


def _array_property(interp, arr, name):
    if name == "length":
        return float(len(arr))
    try:
        index = int(name)
        if 0 <= index < len(arr):
            return arr[index]
        if index >= 0:
            return UNDEF
    except ValueError:
        pass

    call = interp.call_any

    def cb_args(cb, value, i):
        return call(cb, [value, float(i), arr])

    def js_map(cb):
        return [cb_args(cb, v, i) for i, v in enumerate(list(arr))]

    def js_filter(cb):
        return [v for i, v in enumerate(list(arr))
                if js_truthy(cb_args(cb, v, i))]

    def js_for_each(cb):
        for i, v in enumerate(list(arr)):
            cb_args(cb, v, i)
        return UNDEF

    def js_find(cb):
        for i, v in enumerate(list(arr)):
            if js_truthy(cb_args(cb, v, i)):
                return v
        return UNDEF

    def js_find_index(cb):
        for i, v in enumerate(list(arr)):
            if js_truthy(cb_args(cb, v, i)):
                return float(i)
        return -1.0

    def js_some(cb):
        return any(js_truthy(cb_args(cb, v, i))
                   for i, v in enumerate(list(arr)))

    def js_every(cb):
        return all(js_truthy(cb_args(cb, v, i))
                   for i, v in enumerate(list(arr)))

    def js_reduce(cb, *init):
        items = list(arr)
        if init:
            acc = init[0]
            start = 0
        else:
            if not items:
                raise JSError(make_error(
                    "Reduce of empty array with no initial value",
                    kind="TypeError",
                ))
            acc = items[0]
            start = 1
        for i in range(start, len(items)):
            acc = call(cb, [acc, items[i], float(i), arr])
        return acc

    def js_sort(cb=UNDEF):
        import functools

        if cb is UNDEF:
            arr.sort(key=js_str)
        else:
            def compare(a, b):
                result = js_num(call(cb, [a, b]))
                return -1 if result < 0 else (1 if result > 0 else 0)
            arr.sort(key=functools.cmp_to_key(compare))
        return arr

    def js_splice(start, delete_count=UNDEF, *items):
        i = int(js_num(start))
        if i < 0:
            i = max(0, len(arr) + i)
        count = len(arr) - i if delete_count is UNDEF \
            else int(js_num(delete_count))
        removed = arr[i:i + count]
        arr[i:i + count] = list(items)
        return removed

    def js_slice(a=0.0, b=UNDEF):
        start = int(js_num(a))
        end = len(arr) if b is UNDEF else int(js_num(b))
        return list(arr[start:end] if start >= 0 and end >= 0
                    else arr[slice(start, end)])

    def js_flat(depth=1.0):
        def flatten(items, d):
            out = []
            for v in items:
                if isinstance(v, list) and d > 0:
                    out.extend(flatten(v, d - 1))
                else:
                    out.append(v)
            return out
        return flatten(arr, int(js_num(depth)))

    methods = {
        "push": lambda *items: (arr.extend(items), float(len(arr)))[1],
        "pop": lambda: arr.pop() if arr else UNDEF,
        "shift": lambda: arr.pop(0) if arr else UNDEF,
        "unshift": lambda *items: (arr.__setitem__(
            slice(0, 0), list(items)), float(len(arr)))[1],
        "map": js_map,
        "filter": js_filter,
        "forEach": js_for_each,
        "find": js_find,
        "findIndex": js_find_index,
        "some": js_some,
        "every": js_every,
        "reduce": js_reduce,
        "sort": js_sort,
        "reverse": lambda: (arr.reverse(), arr)[1],
        "concat": lambda *others: sum(
            ([v for v in o] if isinstance(o, list) else [o]
             for o in others), list(arr)
        ),
        "slice": js_slice,
        "splice": js_splice,
        "join": lambda sep=",": js_str(sep).join(
            "" if v is UNDEF or v is NULL else js_str(v) for v in arr
        ),
        "indexOf": lambda item: next(
            (float(i) for i, v in enumerate(arr)
             if _same_value(v, item)), -1.0
        ),
        "includes": lambda item: any(_same_value(v, item) for v in arr),
        "fill": lambda value, *rest: (_fill(arr, value, rest), arr)[1],
        "flat": js_flat,
        "flatMap": lambda cb: [x for i, v in enumerate(list(arr))
                               for x in _as_list(cb_args(cb, v, i))],
        "keys": lambda: [float(i) for i in range(len(arr))],
        "entries": lambda: [[float(i), v] for i, v in enumerate(arr)],
        "toString": lambda: js_str(arr),
    }
    return methods.get(name, UNDEF)


def _as_list(value):
    return value if isinstance(value, list) else [value]


def _same_value(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    return a is b


def _fill(arr, value, rest):
    start = int(js_num(rest[0])) if len(rest) > 0 else 0
    end = int(js_num(rest[1])) if len(rest) > 1 else len(arr)
    for i in range(start, min(end, len(arr))):
        arr[i] = value
