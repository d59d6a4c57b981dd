"""A small JavaScript interpreter for executing the studio frontend.

No JS runtime exists in this environment (no node/bun/quickjs and no
Python JS engine), so ``tests/test_frontend.py`` executes
``studio/static/app.js`` with THIS: a lexer + recursive-descent parser
+ tree-walking evaluator for the ES2017 subset the frontend uses —
const/let, arrow + (async) functions with closures, destructuring
(declarations, for-of and parameters), spread in calls/arrays,
template literals, for/for-of/while, try/catch/throw, ternary,
compound assignment and ++/--, object/array literals, `new`, and a
minimal regex literal (via ``re``). ``await`` resolves synchronously —
the host's fetch talks to the real HTTP server inline — which is
exactly what a deterministic frontend test wants.

Host objects (DOM, WebGL, fetch, EventSource) live in
``tests/jsdom.py``; anything browser-specific enters through the global
scope the caller supplies. Not implemented (unused by app.js): classes,
generators, labels, switch, `this`, prototypes, getters/setters, loose
equality.
"""
import json
import math
import re


class JSError(Exception):
    """A thrown JS value crossing the Python boundary."""

    def __init__(self, value):
        self.value = value
        super().__init__(js_str(value_message(value)))


def value_message(value):
    if isinstance(value, JSObject) and "message" in value:
        return value["message"]
    return value


class _Undefined:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


class _Null:
    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "null"

    def __bool__(self):
        return False


UNDEF = _Undefined()
NULL = _Null()


class JSObject(dict):
    """A JS object: a dict with undefined for missing keys."""


class JSRegex:
    def __init__(self, pattern, flags):
        self.source = pattern
        self.flags = flags
        py_flags = re.IGNORECASE if "i" in flags else 0
        self.re = re.compile(pattern, py_flags)


# ---------------------------------------------------------------- lexer

KEYWORDS = {
    "function", "return", "if", "else", "for", "while", "do", "break",
    "continue", "const", "let", "var", "new", "typeof", "instanceof",
    "in", "of", "null", "true", "false", "throw", "try", "catch",
    "finally", "async", "await", "delete", "void", "undefined",
}

PUNCT = [
    "...", "===", "!==", "**=", "=>", "<<", ">>", "<=", ">=", "==",
    "!=", "&&", "||", "+=", "-=", "*=", "/=", "%=", "++", "--", "**",
    "{", "}",
    "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/", "%",
    "&", "|", "^", "!", "~", "?", ":", "=", ".", "`",
]

_ID_START = re.compile(r"[A-Za-z_$]")
_ID = re.compile(r"[A-Za-z0-9_$]*")
_NUM = re.compile(r"(?:0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)")


class Token:
    __slots__ = ("type", "value", "pos", "line")

    def __init__(self, type_, value, pos, line):
        self.type = type_
        self.value = value
        self.pos = pos
        self.line = line

    def __repr__(self):
        return f"Token({self.type}, {self.value!r}, line {self.line})"


def tokenize(source):
    tokens = []
    i = 0
    n = len(source)
    line = 1

    def prev_allows_regex():
        # A `/` starts a regex (not division) unless the previous token
        # could end an expression.
        if not tokens:
            return True
        t = tokens[-1]
        if t.type in ("num", "str", "template", "regex"):
            return False
        if t.type == "ident" and t.value not in KEYWORDS:
            return False
        if t.type == "ident" and t.value in ("null", "true", "false",
                                             "undefined"):
            return False
        if t.type == "punct" and t.value in (")", "]", "}"):
            return False
        return True

    while i < n:
        c = source[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if source.startswith("//", i):
            j = source.find("\n", i)
            i = n if j < 0 else j
            continue
        if source.startswith("/*", i):
            j = source.find("*/", i)
            if j < 0:
                raise SyntaxError(f"Unterminated comment at line {line}")
            line += source.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            j = i + 1
            out = []
            while j < n and source[j] != c:
                if source[j] == "\\":
                    out.append(_escape(source[j + 1]))
                    j += 2
                else:
                    out.append(source[j])
                    j += 1
            if j >= n:
                raise SyntaxError(f"Unterminated string at line {line}")
            tokens.append(Token("str", "".join(out), i, line))
            i = j + 1
            continue
        if c == "`":
            # Template literal: parts = list of ("str", s) / ("expr", src)
            parts = []
            buf = []
            j = i + 1
            while j < n and source[j] != "`":
                if source[j] == "\\":
                    buf.append(_escape(source[j + 1]))
                    j += 2
                elif source.startswith("${", j):
                    parts.append(("str", "".join(buf)))
                    buf = []
                    depth = 1
                    k = j + 2
                    while k < n and depth:
                        if source[k] == "{":
                            depth += 1
                        elif source[k] == "}":
                            depth -= 1
                        k += 1
                    parts.append(("expr", source[j + 2:k - 1]))
                    j = k
                else:
                    if source[j] == "\n":
                        line += 1
                    buf.append(source[j])
                    j += 1
            if j >= n:
                raise SyntaxError(f"Unterminated template at line {line}")
            parts.append(("str", "".join(buf)))
            tokens.append(Token("template", parts, i, line))
            i = j + 1
            continue
        if c == "/" and prev_allows_regex():
            j = i + 1
            in_class = False
            while j < n:
                ch = source[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                elif ch == "\n":
                    raise SyntaxError(f"Unterminated regex at line {line}")
                j += 1
            pattern = source[i + 1:j]
            k = j + 1
            while k < n and _ID_START.match(source[k]):
                k += 1
            flags = source[j + 1:k]
            tokens.append(Token("regex", (pattern, flags), i, line))
            i = k
            continue
        m = _NUM.match(source, i)
        if m and (c.isdigit() or (c == "." and i + 1 < n
                                  and source[i + 1].isdigit())):
            text = m.group(0)
            value = float(int(text, 16)) if text[:2].lower() == "0x" else (
                float(text)
            )
            tokens.append(Token("num", value, i, line))
            i = m.end()
            continue
        if _ID_START.match(c):
            m = _ID.match(source, i + 1)
            name = c + m.group(0)
            tokens.append(Token("ident", name, i, line))
            i = m.end()
            continue
        for p in PUNCT:
            if source.startswith(p, i):
                tokens.append(Token("punct", p, i, line))
                i += len(p)
                break
        else:
            raise SyntaxError(f"Unexpected character {c!r} at line {line}")
    tokens.append(Token("eof", None, n, line))
    return tokens


def _escape(c):
    return {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "0": "\0"}.get(c, c)


# ---------------------------------------------------------------- parser
#
# AST nodes are tuples: (kind, ...). Statement kinds: block, expr,
# decl, func, return, if, for, forof, forin, while, do, try, throw,
# break, continue, empty. Expression kinds: num, str, template, regex,
# ident, undef, null, bool, array, object, func, arrow, call, new,
# member, index, assign, binop, logic, unary, update, ternary, spread,
# seq.


class Parser:
    def __init__(self, source):
        self.tokens = tokenize(source)
        self.pos = 0

    # -- token helpers --------------------------------------------------
    def peek(self, offset=0):
        return self.tokens[min(self.pos + offset, len(self.tokens) - 1)]

    def next(self):
        token = self.tokens[self.pos]
        self.pos += 1
        return token

    def at_punct(self, *values):
        t = self.peek()
        return t.type == "punct" and t.value in values

    def at_ident(self, *names):
        t = self.peek()
        return t.type == "ident" and t.value in names

    def expect(self, value):
        t = self.next()
        if t.type != "punct" or t.value != value:
            raise SyntaxError(f"Expected {value!r}, got {t}")
        return t

    def expect_ident(self):
        t = self.next()
        if t.type != "ident":
            raise SyntaxError(f"Expected identifier, got {t}")
        return t.value

    def eat_semi(self):
        while self.at_punct(";"):
            self.next()

    # -- program --------------------------------------------------------
    def parse_program(self):
        body = []
        while self.peek().type != "eof":
            body.append(self.parse_statement())
        return ("block", body)

    # -- statements -----------------------------------------------------
    def parse_statement(self):
        t = self.peek()
        if t.type == "punct" and t.value == "{":
            return self.parse_block()
        if t.type == "punct" and t.value == ";":
            self.next()
            return ("empty",)
        if t.type == "ident":
            kw = t.value
            if kw in ("const", "let", "var"):
                stmt = self.parse_decl()
                self.eat_semi()
                return stmt
            if kw == "function":
                return self.parse_function_decl(is_async=False)
            if kw == "async" and self.peek(1).type == "ident" \
                    and self.peek(1).value == "function":
                self.next()
                return self.parse_function_decl(is_async=True)
            if kw == "return":
                self.next()
                if self.at_punct(";", "}") or self.peek().type == "eof":
                    value = ("undef",)
                else:
                    value = self.parse_expression()
                self.eat_semi()
                return ("return", value)
            if kw == "if":
                return self.parse_if()
            if kw == "for":
                return self.parse_for()
            if kw == "while":
                self.next()
                self.expect("(")
                test = self.parse_expression()
                self.expect(")")
                body = self.parse_statement()
                return ("while", test, body)
            if kw == "do":
                self.next()
                body = self.parse_statement()
                if not self.at_ident("while"):
                    raise SyntaxError("do without while")
                self.next()
                self.expect("(")
                test = self.parse_expression()
                self.expect(")")
                self.eat_semi()
                return ("do", test, body)
            if kw == "try":
                return self.parse_try()
            if kw == "throw":
                self.next()
                value = self.parse_expression()
                self.eat_semi()
                return ("throw", value)
            if kw == "break":
                self.next()
                self.eat_semi()
                return ("break",)
            if kw == "continue":
                self.next()
                self.eat_semi()
                return ("continue",)
        expr = self.parse_expression()
        self.eat_semi()
        return ("expr", expr)

    def parse_block(self):
        self.expect("{")
        body = []
        while not self.at_punct("}"):
            body.append(self.parse_statement())
        self.expect("}")
        return ("block", body)

    def parse_decl(self):
        kind = self.next().value  # const/let/var
        declarations = []
        while True:
            target = self.parse_binding_target()
            init = ("undef",)
            if self.at_punct("="):
                self.next()
                init = self.parse_assignment()
            declarations.append((target, init))
            if self.at_punct(","):
                self.next()
                continue
            break
        return ("decl", kind, declarations)

    def parse_binding_target(self):
        """ident | [a, b, ...rest] | {a, b: c}  (one level of nesting ok
        via recursion)."""
        if self.at_punct("["):
            self.next()
            elements = []
            while not self.at_punct("]"):
                if self.at_punct(","):
                    self.next()
                    elements.append(None)  # elision
                    continue
                if self.at_punct("..."):
                    self.next()
                    elements.append(("rest", self.parse_binding_target()))
                else:
                    target = self.parse_binding_target()
                    default = None
                    if self.at_punct("="):
                        self.next()
                        default = self.parse_assignment()
                    elements.append(("elem", target, default))
                if self.at_punct(","):
                    self.next()
            self.expect("]")
            return ("apat", elements)
        if self.at_punct("{"):
            self.next()
            props = []
            while not self.at_punct("}"):
                key = self.expect_ident()
                target = ("ident", key)
                if self.at_punct(":"):
                    self.next()
                    target = self.parse_binding_target()
                default = None
                if self.at_punct("="):
                    self.next()
                    default = self.parse_assignment()
                props.append((key, target, default))
                if self.at_punct(","):
                    self.next()
            self.expect("}")
            return ("opat", props)
        return ("ident", self.expect_ident())

    def parse_function_decl(self, is_async):
        self.next()  # function
        name = self.expect_ident()
        params = self.parse_params()
        body = self.parse_block()
        return ("func", name, params, body, is_async)

    def parse_params(self):
        self.expect("(")
        params = []
        while not self.at_punct(")"):
            if self.at_punct("..."):
                self.next()
                params.append(("rest", self.parse_binding_target(), None))
            else:
                target = self.parse_binding_target()
                default = None
                if self.at_punct("="):
                    self.next()
                    default = self.parse_assignment()
                params.append(("param", target, default))
            if self.at_punct(","):
                self.next()
        self.expect(")")
        return params

    def parse_if(self):
        self.next()
        self.expect("(")
        test = self.parse_expression()
        self.expect(")")
        then = self.parse_statement()
        other = None
        if self.at_ident("else"):
            self.next()
            other = self.parse_statement()
        return ("if", test, then, other)

    def parse_for(self):
        self.next()
        self.expect("(")
        init = None
        if self.at_punct(";"):
            self.next()
        else:
            if self.at_ident("const", "let", "var"):
                kind = self.next().value
                target = self.parse_binding_target()
                if self.at_ident("of"):
                    self.next()
                    iterable = self.parse_expression()
                    self.expect(")")
                    body = self.parse_statement()
                    return ("forof", kind, target, iterable, body)
                if self.at_ident("in"):
                    self.next()
                    obj = self.parse_expression()
                    self.expect(")")
                    body = self.parse_statement()
                    return ("forin", kind, target, obj, body)
                init_value = ("undef",)
                if self.at_punct("="):
                    self.next()
                    init_value = self.parse_assignment()
                declarations = [(target, init_value)]
                while self.at_punct(","):
                    self.next()
                    t2 = self.parse_binding_target()
                    v2 = ("undef",)
                    if self.at_punct("="):
                        self.next()
                        v2 = self.parse_assignment()
                    declarations.append((t2, v2))
                init = ("decl", kind, declarations)
            else:
                init = ("expr", self.parse_expression())
            self.expect(";")
        test = None
        if not self.at_punct(";"):
            test = self.parse_expression()
        self.expect(";")
        update = None
        if not self.at_punct(")"):
            update = self.parse_expression()
        self.expect(")")
        body = self.parse_statement()
        return ("for", init, test, update, body)

    def parse_try(self):
        self.next()
        block = self.parse_block()
        handler = None
        finalizer = None
        if self.at_ident("catch"):
            self.next()
            param = None
            if self.at_punct("("):
                self.next()
                param = self.parse_binding_target()
                self.expect(")")
            handler = (param, self.parse_block())
        if self.at_ident("finally"):
            self.next()
            finalizer = self.parse_block()
        return ("try", block, handler, finalizer)

    # -- expressions ----------------------------------------------------
    def parse_expression(self):
        expr = self.parse_assignment()
        if self.at_punct(","):
            exprs = [expr]
            while self.at_punct(","):
                self.next()
                exprs.append(self.parse_assignment())
            return ("seq", exprs)
        return expr

    def parse_assignment(self):
        arrow = self.try_parse_arrow()
        if arrow is not None:
            return arrow
        left = self.parse_ternary()
        if self.at_punct("=", "+=", "-=", "*=", "/=", "%=", "**="):
            op = self.next().value
            right = self.parse_assignment()
            return ("assign", op, left, right)
        return left

    def try_parse_arrow(self):
        """Detect `ident =>`, `async ident =>`, `(params) =>`,
        `async (params) =>` with bounded lookahead; returns None if the
        tokens are not an arrow function."""
        start = self.pos
        is_async = False
        if self.at_ident("async") and (
            self.peek(1).type == "ident"
            or (self.peek(1).type == "punct" and self.peek(1).value == "(")
        ):
            probe = self.pos + 1
        else:
            probe = self.pos
        t = self.tokens[probe]
        if t.type == "ident" and t.value not in KEYWORDS:
            nxt = self.tokens[probe + 1]
            if nxt.type == "punct" and nxt.value == "=>":
                if probe != self.pos:
                    self.next()  # async
                    is_async = True
                name = self.next().value
                self.next()  # =>
                return self.finish_arrow(
                    [("param", ("ident", name), None)], is_async
                )
            return None
        if t.type == "punct" and t.value == "(":
            depth = 0
            k = probe
            while k < len(self.tokens):
                tk = self.tokens[k]
                if tk.type == "punct" and tk.value == "(":
                    depth += 1
                elif tk.type == "punct" and tk.value == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            after = self.tokens[k + 1] if k + 1 < len(self.tokens) else None
            if after is not None and after.type == "punct" \
                    and after.value == "=>":
                if probe != self.pos:
                    self.next()
                    is_async = True
                params = self.parse_params()
                self.next()  # =>
                return self.finish_arrow(params, is_async)
        self.pos = start
        return None

    def finish_arrow(self, params, is_async):
        if self.at_punct("{"):
            body = self.parse_block()
            return ("arrow", params, body, False, is_async)
        body = self.parse_assignment()
        return ("arrow", params, body, True, is_async)

    def parse_ternary(self):
        test = self.parse_binary(0)
        if self.at_punct("?"):
            self.next()
            then = self.parse_assignment()
            self.expect(":")
            other = self.parse_assignment()
            return ("ternary", test, then, other)
        return test

    BINOPS = [
        (("||",), "logic"),
        (("&&",), "logic"),
        (("|",), "binop"),
        (("^",), "binop"),
        (("&",), "binop"),
        (("===", "!==", "==", "!="), "binop"),
        (("<", ">", "<=", ">=", "instanceof", "in"), "binop"),
        (("<<", ">>"), "binop"),
        (("+", "-"), "binop"),
        (("*", "/", "%"), "binop"),
        (("**",), "binop"),
    ]

    def parse_binary(self, level):
        if level >= len(self.BINOPS):
            return self.parse_unary()
        ops, kind = self.BINOPS[level]
        left = self.parse_binary(level + 1)
        while True:
            t = self.peek()
            matched = (
                (t.type == "punct" and t.value in ops)
                or (t.type == "ident" and t.value in ops)
            )
            if not matched:
                return left
            op = self.next().value
            # `**` is right-associative; everything else left.
            right = self.parse_binary(level if op == "**" else level + 1)
            left = (kind, op, left, right)
            if op == "**":
                return left

    def parse_unary(self):
        t = self.peek()
        if t.type == "punct" and t.value in ("!", "-", "+", "~"):
            self.next()
            return ("unary", t.value, self.parse_unary())
        if t.type == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, self.parse_unary(), True)
        if t.type == "ident" and t.value in ("typeof", "void", "delete",
                                             "await"):
            self.next()
            return ("unary", t.value, self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        expr = self.parse_call_member()
        if self.at_punct("++", "--"):
            op = self.next().value
            return ("update", op, expr, False)
        return expr

    def parse_call_member(self, allow_call=True):
        if self.at_ident("new"):
            self.next()
            callee = self.parse_call_member(allow_call=False)
            args = []
            if self.at_punct("("):
                args = self.parse_args()
            expr = ("new", callee, args)
        else:
            expr = self.parse_primary()
        while True:
            if self.at_punct("."):
                self.next()
                expr = ("member", expr, self.expect_ident())
            elif self.at_punct("["):
                self.next()
                index = self.parse_expression()
                self.expect("]")
                expr = ("index", expr, index)
            elif allow_call and self.at_punct("("):
                expr = ("call", expr, self.parse_args())
            elif self.peek().type == "template" and allow_call:
                raise SyntaxError("Tagged templates are not supported")
            else:
                return expr

    def parse_args(self):
        self.expect("(")
        args = []
        while not self.at_punct(")"):
            if self.at_punct("..."):
                self.next()
                args.append(("spread", self.parse_assignment()))
            else:
                args.append(self.parse_assignment())
            if self.at_punct(","):
                self.next()
        self.expect(")")
        return args

    def parse_primary(self):
        t = self.peek()
        if t.type == "num":
            self.next()
            return ("num", t.value)
        if t.type == "str":
            self.next()
            return ("str", t.value)
        if t.type == "regex":
            self.next()
            return ("regex", t.value[0], t.value[1])
        if t.type == "template":
            self.next()
            parts = []
            for kind, chunk in t.value:
                if kind == "str":
                    parts.append(("str", chunk))
                else:
                    parts.append(("expr", Parser(chunk).parse_expression()))
            return ("template", parts)
        if t.type == "punct":
            if t.value == "(":
                self.next()
                expr = self.parse_expression()
                self.expect(")")
                return expr
            if t.value == "[":
                self.next()
                elements = []
                while not self.at_punct("]"):
                    if self.at_punct("..."):
                        self.next()
                        elements.append(("spread", self.parse_assignment()))
                    else:
                        elements.append(self.parse_assignment())
                    if self.at_punct(","):
                        self.next()
                self.expect("]")
                return ("array", elements)
            if t.value == "{":
                return self.parse_object_literal()
        if t.type == "ident":
            name = t.value
            if name == "function":
                self.next()
                fn_name = None
                if self.peek().type == "ident":
                    fn_name = self.next().value
                params = self.parse_params()
                body = self.parse_block()
                return ("funcexpr", fn_name, params, body, False)
            if name == "async" and self.peek(1).type == "ident" \
                    and self.peek(1).value == "function":
                self.next()
                self.next()
                fn_name = None
                if self.peek().type == "ident":
                    fn_name = self.next().value
                params = self.parse_params()
                body = self.parse_block()
                return ("funcexpr", fn_name, params, body, True)
            if name == "null":
                self.next()
                return ("null",)
            if name == "undefined":
                self.next()
                return ("undef",)
            if name in ("true", "false"):
                self.next()
                return ("bool", name == "true")
            self.next()
            return ("ident", name)
        raise SyntaxError(f"Unexpected token {t}")

    def parse_object_literal(self):
        self.expect("{")
        props = []
        while not self.at_punct("}"):
            if self.at_punct("..."):
                self.next()
                props.append(("spread", self.parse_assignment()))
            else:
                t = self.peek()
                if t.type == "str":
                    key = self.next().value
                elif t.type == "num":
                    key = js_str(self.next().value)
                elif t.type == "punct" and t.value == "[":
                    self.next()
                    key = ("computed", self.parse_assignment())
                    self.expect("]")
                else:
                    key = self.expect_ident()
                if self.at_punct(":"):
                    self.next()
                    props.append(("prop", key, self.parse_assignment()))
                elif self.at_punct("("):
                    params = self.parse_params()
                    body = self.parse_block()
                    props.append(
                        ("prop", key, ("funcexpr", key, params, body, False))
                    )
                else:
                    props.append(("prop", key, ("ident", key)))
            if self.at_punct(","):
                self.next()
        self.expect("}")
        return ("object", props)


# ------------------------------------------------------------ evaluator


class Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        scope = self
        while scope is not None:
            if name in scope.vars:
                return scope.vars[name]
            scope = scope.parent
        raise JSError(make_error(f"{name} is not defined",
                                 kind="ReferenceError"))

    def has(self, name):
        scope = self
        while scope is not None:
            if name in scope.vars:
                return True
            scope = scope.parent
        return False

    def declare(self, name, value):
        self.vars[name] = value

    def assign(self, name, value):
        scope = self
        while scope is not None:
            if name in scope.vars:
                scope.vars[name] = value
                return
            scope = scope.parent
        raise JSError(make_error(f"{name} is not defined",
                                 kind="ReferenceError"))


class JSFunction:
    __slots__ = ("name", "params", "body", "closure", "is_expr_body",
                 "is_async", "interp")

    def __init__(self, interp, name, params, body, closure,
                 is_expr_body=False, is_async=False):
        self.interp = interp
        self.name = name or "<anonymous>"
        self.params = params
        self.body = body
        self.closure = closure
        self.is_expr_body = is_expr_body
        self.is_async = is_async

    def __call__(self, *args):
        return self.interp.call_function(self, list(args))


def _call_native(fn, args):
    """Call a Python host function with JS calling convention: extra
    arguments (e.g. map's (value, index, array)) are clamped to the
    function's positional arity; missing ones rely on defaults.

    No caching by id(): transient closures would alias recycled ids.
    """
    import inspect

    try:
        params = inspect.signature(fn).parameters.values()
    except (TypeError, ValueError):
        return fn(*args)
    arity = 0
    for p in params:
        if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
            return fn(*args)  # *args: pass everything
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            arity += 1
    return fn(*args[:arity])


def make_error(message, kind="Error"):
    err = JSObject()
    err["name"] = kind
    err["message"] = message
    err["__error__"] = True
    return err


class BreakSignal(Exception):
    pass


class ContinueSignal(Exception):
    pass


class ReturnSignal(Exception):
    def __init__(self, value):
        self.value = value


def js_truthy(value):
    if value is UNDEF or value is NULL:
        return False
    if isinstance(value, bool):
        return value
    if isinstance(value, float):
        return value != 0.0 and not math.isnan(value)
    if isinstance(value, str):
        return value != ""
    return True


def js_num(value):
    if isinstance(value, bool):
        return 1.0 if value else 0.0
    if isinstance(value, float):
        return value
    if isinstance(value, str):
        text = value.strip()
        if text == "":
            return 0.0
        try:
            return float(int(text, 16)) if text[:2].lower() == "0x" \
                else float(text)
        except ValueError:
            return float("nan")
    if value is NULL:
        return 0.0
    if value is UNDEF:
        return float("nan")
    if isinstance(value, list):
        if not value:
            return 0.0
        if len(value) == 1:
            return js_num(value[0])
    return float("nan")


def js_str(value):
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if math.isinf(value):
            return "Infinity" if value > 0 else "-Infinity"
        if value == int(value) and abs(value) < 1e21:
            return str(int(value))
        return repr(value)
    if isinstance(value, str):
        return value
    if value is UNDEF:
        return "undefined"
    if value is NULL:
        return "null"
    if isinstance(value, list):
        return ",".join(
            "" if v is UNDEF or v is NULL else js_str(v) for v in value
        )
    if hasattr(value, "__js_str__"):
        return value.__js_str__()
    if isinstance(value, JSObject):
        if value.get("__error__"):
            return f"{js_str(value.get('name', 'Error'))}: " \
                   f"{js_str(value.get('message', ''))}"
        return "[object Object]"
    if callable(value):
        return f"function {getattr(value, 'name', '')}() {{ ... }}"
    return str(value)


def js_equals_strict(a, b):
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if type(a) is not type(b) and not (
        a is UNDEF and b is UNDEF or a is NULL and b is NULL
    ):
        return False
    if isinstance(a, (str, bool)):
        return a == b
    return a is b or a == b if isinstance(a, (str, float)) else a is b


class Interpreter:
    def __init__(self, global_vars=None, max_steps=20_000_000):
        self.globals = Scope()
        self.steps = 0
        self.max_steps = max_steps
        self._install_builtins()
        if global_vars:
            for name, value in global_vars.items():
                self.globals.declare(name, value)

    # -- public ---------------------------------------------------------
    def run(self, source):
        ast = Parser(source).parse_program()
        self.exec_block(ast, self.globals, new_scope=False)

    def call(self, name, *args):
        """Call a global JS function from Python."""
        fn = self.globals.lookup(name)
        return self.call_any(fn, list(args))

    def get(self, name):
        return self.globals.lookup(name)

    # -- builtins -------------------------------------------------------
    def _install_builtins(self):
        g = self.globals
        g.declare("undefined", UNDEF)
        g.declare("NaN", float("nan"))
        g.declare("Infinity", float("inf"))
        g.declare("globalThis", UNDEF)

        math_obj = JSObject()
        for name in ("cos", "sin", "tan", "atan", "atan2", "sqrt", "exp",
                     "log", "floor", "hypot", "asin", "acos"):
            math_obj[name] = self._wrap_math(getattr(math, name))
        math_obj["abs"] = lambda x: abs(js_num(x))
        math_obj["ceil"] = lambda x: float(math.ceil(js_num(x)))
        math_obj["round"] = lambda x: float(math.floor(js_num(x) + 0.5))
        math_obj["max"] = lambda *a: max(
            (js_num(v) for v in a), default=float("-inf")
        )
        math_obj["min"] = lambda *a: min(
            (js_num(v) for v in a), default=float("inf")
        )
        math_obj["pow"] = lambda a, b: js_num(a) ** js_num(b)
        math_obj["sign"] = lambda x: math.copysign(1.0, js_num(x)) \
            if js_num(x) else 0.0
        math_obj["random"] = self._js_random
        math_obj["PI"] = math.pi
        math_obj["E"] = math.e
        g.declare("Math", math_obj)

        json_obj = JSObject()
        json_obj["stringify"] = self._json_stringify
        json_obj["parse"] = self._json_parse
        g.declare("JSON", json_obj)

        object_obj = JSObject()
        object_obj["entries"] = lambda o: [
            [k, v] for k, v in o.items() if not k.startswith("__")
        ]
        object_obj["keys"] = lambda o: [
            k for k in o.keys() if not k.startswith("__")
        ]
        object_obj["values"] = lambda o: [
            v for k, v in o.items() if not k.startswith("__")
        ]
        object_obj["assign"] = self._object_assign
        g.declare("Object", object_obj)

        array_obj = JSObject()
        array_obj["isArray"] = lambda v: isinstance(v, list)
        array_obj["from"] = lambda v, *fn: [
            self.call_any(fn[0], [x, float(i)]) if fn else x
            for i, x in enumerate(self._iterate(v))
        ]
        g.declare("Array", array_obj)

        number_obj = JSObject()
        number_obj["isFinite"] = lambda v: isinstance(v, float) \
            and math.isfinite(v)
        number_obj["isInteger"] = lambda v: isinstance(v, float) \
            and math.isfinite(v) and v == int(v)
        g.declare("Number", number_obj)

        g.declare("parseFloat", self._parse_float)
        g.declare("parseInt", self._parse_int)
        g.declare("isFinite", lambda v: math.isfinite(js_num(v)))
        g.declare("isNaN", lambda v: math.isnan(js_num(v)))
        g.declare("String", lambda v=UNDEF: js_str(v))
        g.declare("Boolean", lambda v=UNDEF: js_truthy(v))

        g.declare("Error", _ErrorCtor("Error"))
        g.declare("TypeError", _ErrorCtor("TypeError"))
        g.declare("Map", _MapCtor())
        g.declare("Set", _SetCtor())
        g.declare("Promise", UNDEF)

    def _wrap_math(self, fn):
        return lambda *a: float(fn(*[js_num(v) for v in a]))

    _random_state = 0x9E3779B9

    def _js_random(self):
        # Deterministic LCG: tests must be reproducible.
        self._random_state = (self._random_state * 1103515245 + 12345) \
            % (1 << 31)
        return self._random_state / float(1 << 31)

    def _parse_float(self, value=UNDEF):
        text = js_str(value).strip()
        m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", text)
        return float(m.group(0)) if m else float("nan")

    def _parse_int(self, value=UNDEF, base=UNDEF):
        text = js_str(value).strip()
        b = int(js_num(base)) if base is not UNDEF and js_num(base) else 10
        m = re.match(r"[+-]?[0-9a-fA-F]+" if b == 16 else r"[+-]?\d+", text)
        if not m:
            return float("nan")
        return float(int(m.group(0), b))

    def _object_assign(self, target, *sources):
        for src in sources:
            if isinstance(src, JSObject):
                target.update(src)
        return target

    def _json_stringify(self, value, _replacer=UNDEF, indent=UNDEF):
        py = to_python(value)
        kwargs = {}
        if isinstance(indent, float):
            kwargs["indent"] = int(indent)
        return json.dumps(py, **kwargs)

    def _json_parse(self, text):
        return from_python(json.loads(js_str(text)))

    # -- execution ------------------------------------------------------
    def _tick(self):
        self.steps += 1
        if self.steps > self.max_steps:
            raise RuntimeError("jsmini: step budget exhausted "
                               "(infinite loop?)")

    def exec_block(self, block, scope, new_scope=True):
        inner = Scope(scope) if new_scope else scope
        body = block[1]
        # Hoist function declarations (app.js calls boot() at the very
        # end but helpers reference each other freely).
        for stmt in body:
            if stmt[0] == "func":
                _, name, params, fn_body, is_async = stmt
                inner.declare(name, JSFunction(
                    self, name, params, fn_body, inner, is_async=is_async
                ))
        for stmt in body:
            self.exec_stmt(stmt, inner)

    def exec_stmt(self, stmt, scope):
        self._tick()
        kind = stmt[0]
        if kind == "expr":
            self.eval(stmt[1], scope)
        elif kind == "decl":
            for target, init in stmt[2]:
                value = self.eval(init, scope)
                self.bind_pattern(target, value, scope, declare=True)
        elif kind == "func":
            pass  # hoisted by exec_block
        elif kind == "block":
            self.exec_block(stmt, scope)
        elif kind == "if":
            if js_truthy(self.eval(stmt[1], scope)):
                self.exec_stmt(stmt[2], scope)
            elif stmt[3] is not None:
                self.exec_stmt(stmt[3], scope)
        elif kind == "return":
            raise ReturnSignal(self.eval(stmt[1], scope))
        elif kind == "while":
            while js_truthy(self.eval(stmt[1], scope)):
                self._tick()
                try:
                    self.exec_stmt(stmt[2], Scope(scope))
                except BreakSignal:
                    break
                except ContinueSignal:
                    continue
        elif kind == "do":
            while True:
                self._tick()
                try:
                    self.exec_stmt(stmt[2], Scope(scope))
                except BreakSignal:
                    break
                except ContinueSignal:
                    pass
                if not js_truthy(self.eval(stmt[1], scope)):
                    break
        elif kind == "for":
            init, test, update, body = stmt[1:]
            loop_scope = Scope(scope)
            if init is not None:
                self.exec_stmt(init, loop_scope)
            while test is None or js_truthy(self.eval(test, loop_scope)):
                self._tick()
                try:
                    self.exec_stmt(body, Scope(loop_scope))
                except BreakSignal:
                    break
                except ContinueSignal:
                    pass
                if update is not None:
                    self.eval(update, loop_scope)
        elif kind == "forof":
            _, _kw, target, iterable, body = stmt
            for item in self._iterate(self.eval(iterable, scope)):
                self._tick()
                iter_scope = Scope(scope)
                self.bind_pattern(target, item, iter_scope, declare=True)
                try:
                    self.exec_stmt(body, iter_scope)
                except BreakSignal:
                    break
                except ContinueSignal:
                    continue
        elif kind == "forin":
            _, _kw, target, obj_expr, body = stmt
            obj = self.eval(obj_expr, scope)
            keys = list(obj.keys()) if isinstance(obj, JSObject) else (
                [js_str(float(i)) for i in range(len(obj))]
                if isinstance(obj, list) else []
            )
            for key in keys:
                self._tick()
                iter_scope = Scope(scope)
                self.bind_pattern(target, key, iter_scope, declare=True)
                try:
                    self.exec_stmt(body, iter_scope)
                except BreakSignal:
                    break
                except ContinueSignal:
                    continue
        elif kind == "try":
            _, block, handler, finalizer = stmt
            try:
                self.exec_block(block, scope)
            except JSError as err:
                if handler is None:
                    raise
                param, catch_block = handler
                catch_scope = Scope(scope)
                if param is not None:
                    self.bind_pattern(param, err.value, catch_scope,
                                      declare=True)
                self.exec_block(catch_block, catch_scope, new_scope=False)
            finally:
                if finalizer is not None:
                    self.exec_block(finalizer, scope)
        elif kind == "throw":
            raise JSError(self.eval(stmt[1], scope))
        elif kind == "break":
            raise BreakSignal()
        elif kind == "continue":
            raise ContinueSignal()
        elif kind == "empty":
            pass
        else:  # pragma: no cover
            raise RuntimeError(f"Unknown statement kind {kind}")

    def _iterate(self, value):
        if isinstance(value, list):
            return list(value)
        if isinstance(value, str):
            return list(value)
        if hasattr(value, "__js_iter__"):
            return value.__js_iter__()
        if isinstance(value, JSObject):
            raise JSError(make_error("object is not iterable",
                                     kind="TypeError"))
        if value is UNDEF or value is NULL:
            raise JSError(make_error(
                f"{js_str(value)} is not iterable", kind="TypeError"
            ))
        return list(value)

    def bind_pattern(self, target, value, scope, declare):
        kind = target[0]
        if kind == "ident":
            if declare:
                scope.declare(target[1], value)
            else:
                scope.assign(target[1], value)
        elif kind == "apat":
            items = self._iterate(value)
            i = 0
            for element in target[1]:
                if element is None:
                    i += 1
                    continue
                if element[0] == "rest":
                    self.bind_pattern(element[1], list(items[i:]), scope,
                                      declare)
                    break
                item = items[i] if i < len(items) else UNDEF
                default = element[2] if len(element) > 2 else None
                if item is UNDEF and default is not None:
                    item = self.eval(default, scope)
                self.bind_pattern(element[1], item, scope, declare)
                i += 1
        elif kind == "opat":
            for key, sub_target, default in target[1]:
                item = self.get_property(value, key)
                if item is UNDEF and default is not None:
                    item = self.eval(default, scope)
                self.bind_pattern(sub_target, item, scope, declare)
        else:  # pragma: no cover
            raise RuntimeError(f"Unknown pattern {kind}")

    # -- function calls -------------------------------------------------
    def call_function(self, fn, args, this=UNDEF):
        scope = Scope(fn.closure)
        i = 0
        for param in fn.params:
            if param[0] == "rest":
                self.bind_pattern(param[1], list(args[i:]), scope,
                                  declare=True)
                break
            value = args[i] if i < len(args) else UNDEF
            if value is UNDEF and param[2] is not None:
                value = self.eval(param[2], scope)
            self.bind_pattern(param[1], value, scope, declare=True)
            i += 1
        scope.declare("arguments", list(args))
        try:
            if fn.is_expr_body:
                return self.eval(fn.body, scope)
            self.exec_block(fn.body, scope, new_scope=False)
        except ReturnSignal as signal:
            return signal.value
        return UNDEF

    def call_any(self, fn, args, this=UNDEF):
        if isinstance(fn, JSFunction):
            return self.call_function(fn, args, this)
        if callable(fn):
            return _call_native(fn, args)
        raise JSError(make_error(f"{js_str(fn)} is not a function",
                                 kind="TypeError"))

    # -- property access ------------------------------------------------
    def get_property(self, obj, name):
        from jsprops import property_of  # local import: avoids a cycle

        return property_of(self, obj, name)

    def set_property(self, obj, name, value):
        if isinstance(obj, JSObject):
            obj[name] = value
            if hasattr(obj, "on_set"):
                obj.on_set(name, value)
            return value
        if isinstance(obj, list):
            try:
                index = int(js_num(name))
            except (ValueError, OverflowError):
                raise JSError(make_error(
                    f"Cannot set {name!r} on array", kind="TypeError"
                ))
            if name == "length":
                length = int(js_num(value))
                del obj[length:]
                obj.extend([UNDEF] * (length - len(obj)))
                return value
            while len(obj) <= index:
                obj.append(UNDEF)
            obj[index] = value
            return value
        if hasattr(obj, "js_set"):
            obj.js_set(js_str(name) if not isinstance(name, str) else name,
                       value)
            return value
        if obj is UNDEF or obj is NULL:
            raise JSError(make_error(
                f"Cannot set properties of {js_str(obj)} "
                f"(setting {name!r})", kind="TypeError"
            ))
        raise JSError(make_error(
            f"Cannot set property {name!r} on {type(obj).__name__}",
            kind="TypeError"
        ))

    # -- expression evaluation ------------------------------------------
    def eval(self, node, scope):
        self._tick()
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "str":
            return node[1]
        if kind == "bool":
            return node[1]
        if kind == "undef":
            return UNDEF
        if kind == "null":
            return NULL
        if kind == "ident":
            return scope.lookup(node[1])
        if kind == "template":
            out = []
            for part_kind, part in node[1]:
                if part_kind == "str":
                    out.append(part)
                else:
                    out.append(js_str(self.eval(part, scope)))
            return "".join(out)
        if kind == "regex":
            return JSRegex(node[1], node[2])
        if kind == "array":
            out = []
            for element in node[1]:
                if element[0] == "spread":
                    out.extend(self._iterate(self.eval(element[1], scope)))
                else:
                    out.append(self.eval(element, scope))
            return out
        if kind == "object":
            obj = JSObject()
            for prop in node[1]:
                if prop[0] == "spread":
                    value = self.eval(prop[1], scope)
                    if isinstance(value, JSObject):
                        obj.update(value)
                    continue
                _, key, value_expr = prop
                if isinstance(key, tuple) and key[0] == "computed":
                    key = js_str(self.eval(key[1], scope))
                obj[key] = self.eval(value_expr, scope)
            return obj
        if kind in ("funcexpr",):
            _, name, params, body, is_async = node
            return JSFunction(self, name, params, body, scope,
                              is_async=is_async)
        if kind == "arrow":
            _, params, body, is_expr, is_async = node
            return JSFunction(self, None, params, body, scope,
                              is_expr_body=is_expr, is_async=is_async)
        if kind == "member":
            obj = self.eval(node[1], scope)
            return self.get_property(obj, node[2])
        if kind == "index":
            obj = self.eval(node[1], scope)
            key = self.eval(node[2], scope)
            return self.get_property(obj, key)
        if kind == "call":
            return self.eval_call(node, scope)
        if kind == "new":
            callee = self.eval(node[1], scope)
            args = self.eval_args(node[2], scope)
            if hasattr(callee, "js_construct"):
                return callee.js_construct(self, args)
            return self.call_any(callee, args)
        if kind == "assign":
            return self.eval_assign(node, scope)
        if kind == "logic":
            _, op, left_expr, right_expr = node
            left = self.eval(left_expr, scope)
            if op == "&&":
                return self.eval(right_expr, scope) if js_truthy(left) \
                    else left
            return left if js_truthy(left) else self.eval(right_expr, scope)
        if kind == "binop":
            _, op, left_expr, right_expr = node
            left = self.eval(left_expr, scope)
            right = self.eval(right_expr, scope)
            return self.binop(op, left, right)
        if kind == "unary":
            _, op, operand = node
            if op == "typeof":
                try:
                    value = self.eval(operand, scope)
                except JSError:
                    return "undefined"
                return js_typeof(value)
            value = self.eval(operand, scope)
            if op == "!":
                return not js_truthy(value)
            if op == "-":
                return -js_num(value)
            if op == "+":
                return js_num(value)
            if op == "~":
                return float(~_to_int32(value))
            if op == "void":
                return UNDEF
            if op == "await":
                if hasattr(value, "js_await"):
                    return value.js_await()
                return value
            if op == "delete":
                return True
            raise RuntimeError(f"Unknown unary {op}")
        if kind == "update":
            _, op, target, prefix = node
            old = js_num(self.eval(target, scope))
            new = old + (1.0 if op == "++" else -1.0)
            self.assign_to(target, new, scope)
            return new if prefix else old
        if kind == "ternary":
            return self.eval(node[2], scope) \
                if js_truthy(self.eval(node[1], scope)) \
                else self.eval(node[3], scope)
        if kind == "seq":
            value = UNDEF
            for expr in node[1]:
                value = self.eval(expr, scope)
            return value
        raise RuntimeError(f"Unknown expression kind {kind}")

    def eval_args(self, arg_nodes, scope):
        args = []
        for arg in arg_nodes:
            if arg[0] == "spread":
                args.extend(self._iterate(self.eval(arg[1], scope)))
            else:
                args.append(self.eval(arg, scope))
        return args

    def eval_call(self, node, scope):
        _, callee, arg_nodes = node
        if callee[0] == "member":
            obj = self.eval(callee[1], scope)
            fn = self.get_property(obj, callee[2])
            if fn is UNDEF:
                raise JSError(make_error(
                    f"{js_str(callee[2])} is not a function "
                    f"(on {js_str(obj)[:40]})", kind="TypeError"
                ))
            args = self.eval_args(arg_nodes, scope)
            return self.call_any(fn, args, this=obj)
        if callee[0] == "index":
            obj = self.eval(callee[1], scope)
            key = self.eval(callee[2], scope)
            fn = self.get_property(obj, key)
            args = self.eval_args(arg_nodes, scope)
            return self.call_any(fn, args, this=obj)
        fn = self.eval(callee, scope)
        args = self.eval_args(arg_nodes, scope)
        return self.call_any(fn, args)

    def eval_assign(self, node, scope):
        _, op, target, value_expr = node
        if op == "=":
            value = self.eval(value_expr, scope)
        else:
            current = self.eval(target, scope)
            operand = self.eval(value_expr, scope)
            value = self.binop(op[:-1], current, operand)
        self.assign_to(target, value, scope)
        return value

    def assign_to(self, target, value, scope):
        kind = target[0]
        if kind == "ident":
            scope.assign(target[1], value)
        elif kind == "member":
            obj = self.eval(target[1], scope)
            self.set_property(obj, target[2], value)
        elif kind == "index":
            obj = self.eval(target[1], scope)
            key = self.eval(target[2], scope)
            self.set_property(obj, key, value)
        elif kind == "array":
            # Destructuring assignment (not declaration)
            items = self._iterate(value)
            for i, element in enumerate(target[1]):
                item = items[i] if i < len(items) else UNDEF
                self.assign_to(element, item, scope)
        else:
            raise JSError(make_error("Invalid assignment target",
                                     kind="SyntaxError"))

    def binop(self, op, left, right):
        if op == "+":
            if isinstance(left, str) or isinstance(right, str):
                return js_str(left) + js_str(right)
            if isinstance(left, list) or isinstance(right, list):
                return js_str(left) + js_str(right)
            return js_num(left) + js_num(right)
        if op == "-":
            return js_num(left) - js_num(right)
        if op == "*":
            return js_num(left) * js_num(right)
        if op == "/":
            b = js_num(right)
            a = js_num(left)
            if b == 0.0:
                if a == 0.0 or math.isnan(a):
                    return float("nan")
                return math.copysign(float("inf"), a) * math.copysign(1, b)
            return a / b
        if op == "%":
            b = js_num(right)
            a = js_num(left)
            if b == 0.0 or math.isnan(a) or math.isinf(a):
                return float("nan")
            return math.fmod(a, b)
        if op == "**":
            return js_num(left) ** js_num(right)
        if op in ("===", "=="):
            if op == "==" and (
                (left is NULL and right is UNDEF)
                or (left is UNDEF and right is NULL)
            ):
                return True
            return js_equals_strict(left, right)
        if op in ("!==", "!="):
            return not self.binop("===" if op == "!==" else "==",
                                  left, right)
        if op in ("<", ">", "<=", ">="):
            if isinstance(left, str) and isinstance(right, str):
                a, b = left, right
            else:
                a, b = js_num(left), js_num(right)
                if isinstance(a, float) and math.isnan(a):
                    return False
                if isinstance(b, float) and math.isnan(b):
                    return False
            return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
        if op == "|":
            return float(_to_int32(left) | _to_int32(right))
        if op == "&":
            return float(_to_int32(left) & _to_int32(right))
        if op == "^":
            return float(_to_int32(left) ^ _to_int32(right))
        if op == "<<":
            return float(_wrap_int32(_to_int32(left)
                                     << (_to_int32(right) & 31)))
        if op == ">>":
            return float(_to_int32(left) >> (_to_int32(right) & 31))
        if op == "instanceof":
            if hasattr(right, "js_instanceof"):
                return right.js_instanceof(left)
            return False
        if op == "in":
            if isinstance(right, JSObject):
                return js_str(left) in right
            if isinstance(right, list):
                return 0 <= int(js_num(left)) < len(right)
            return False
        raise RuntimeError(f"Unknown operator {op}")


def js_typeof(value):
    if value is UNDEF:
        return "undefined"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, float):
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, JSFunction) or callable(value):
        return "function"
    return "object"


def _to_int32(value):
    n = js_num(value)
    if math.isnan(n) or math.isinf(n):
        return 0
    return _wrap_int32(int(n))


def _wrap_int32(n):
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


# ---------------------------------------------------------- conversions


def to_python(value):
    """JS value -> plain Python (for JSON / host APIs)."""
    if value is UNDEF or value is NULL:
        return None
    if isinstance(value, bool):
        return value
    if isinstance(value, float):
        return int(value) if value == int(value) and math.isfinite(value) \
            else value
    if isinstance(value, str):
        return value
    if isinstance(value, list):
        return [to_python(v) for v in value]
    if isinstance(value, JSObject):
        return {k: to_python(v) for k, v in value.items()
                if v is not UNDEF and not k.startswith("__")}
    if hasattr(value, "to_python"):
        return value.to_python()
    return value


def from_python(value):
    """Plain Python -> JS value."""
    if value is None:
        return NULL
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str):
        return value
    if isinstance(value, (list, tuple)):
        return [from_python(v) for v in value]
    if isinstance(value, dict):
        obj = JSObject()
        for k, v in value.items():
            obj[str(k)] = from_python(v)
        return obj
    return value


# ------------------------------------------------------------ host ctors


class _ErrorCtor:
    def __init__(self, kind):
        self.kind = kind
        self.name = kind

    def __call__(self, message=UNDEF):
        return make_error(
            js_str(message) if message is not UNDEF else "", self.kind
        )

    def js_construct(self, interp, args):
        return self(*args)

    def js_instanceof(self, value):
        return isinstance(value, JSObject) and value.get("__error__") is True


class JSMap:
    def __init__(self, entries=None):
        self.data = {}
        if entries:
            for pair in entries:
                self.data[_map_key(pair[0])] = (pair[0], pair[1])

    def get(self, key):
        entry = self.data.get(_map_key(key))
        return entry[1] if entry else UNDEF

    def set(self, key, value):
        self.data[_map_key(key)] = (key, value)
        return self

    def has(self, key):
        return _map_key(key) in self.data

    def delete(self, key):
        return self.data.pop(_map_key(key), None) is not None

    def clear(self):
        self.data.clear()

    @property
    def size(self):
        return float(len(self.data))

    def __js_iter__(self):
        return [[k, v] for k, v in
                ((entry[0], entry[1]) for entry in self.data.values())]


def _map_key(key):
    if isinstance(key, (str, bool, float)):
        return ("prim", js_str(key) if not isinstance(key, str) else key,
                type(key).__name__)
    return ("id", id(key))


class _MapCtor:
    name = "Map"

    def __call__(self, entries=UNDEF):
        return JSMap(entries if isinstance(entries, list) else None)

    def js_construct(self, interp, args):
        return self(*args) if args else self()

    def js_instanceof(self, value):
        return isinstance(value, JSMap)


class JSSet:
    def __init__(self, items=None):
        self.data = {}
        for item in items or []:
            self.data[_map_key(item)] = item

    def add(self, item):
        self.data[_map_key(item)] = item
        return self

    def has(self, item):
        return _map_key(item) in self.data

    def delete(self, item):
        return self.data.pop(_map_key(item), None) is not None

    @property
    def size(self):
        return float(len(self.data))

    def __js_iter__(self):
        return list(self.data.values())


class _SetCtor:
    name = "Set"

    def __call__(self, items=UNDEF):
        return JSSet(items if isinstance(items, list) else None)

    def js_construct(self, interp, args):
        return self(*args) if args else self()

    def js_instanceof(self, value):
        return isinstance(value, JSSet)
