"""Compact XPath 1.0 engine over :mod:`article_extractor_spark.core.dom`.

The reference delegates all its query language to libxml2's XPath 1.0
implementation (`/root/reference/src/util.rs:43-63`); both the internal
pipeline and the fivefilters site-config rules are XPath expressions.  This
is a from-scratch evaluator for the XPath 1.0 subset those rules use:

* axes: child, descendant(-or-self), self, parent, ancestor(-or-self),
  attribute, following(-sibling), preceding(-sibling)
* node tests: name, ``*``, ``text()``, ``comment()``, ``node()``
* predicates incl. positional, ``|`` unions, arithmetic/boolean operators
* core function library (contains/concat/normalize-space/substring*/
  starts-with/not/count/position/last/string/number/translate/...)

Node-set results come back in document order, deduplicated, matching
libxml2's ``xmlXPathNodeSetSort`` behaviour.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

from . import dom as dom_module
from .dom import (CDATA_NODE, COMMENT_NODE, ELEMENT_NODE, PI_NODE,
                  TEXT_NODE, Document, Node)


class XPathError(ValueError):
    pass


class AttrNode:
    """XPath attribute node (owner element + name/value)."""

    __slots__ = ("owner", "name", "value")
    type = 2  # XML_ATTRIBUTE_NODE

    def __init__(self, owner: Node, name: str, value: str):
        self.owner = owner
        self.name = name
        self.value = value

    def get_content(self) -> str:
        return self.value

    def get_name(self) -> str:
        return self.name

    # minimal Node-compat surface so callers that only read content work
    def get_type(self):
        return self.type

    def __repr__(self):  # pragma: no cover
        return f"<AttrNode {self.name}={self.value!r}>"


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<number>\d+(?:\.\d*)?|\.\d+)
    | (?P<literal>"[^"]*"|'[^']*')
    | (?P<dslash>//)
    | (?P<dcolon>::)
    | (?P<ddot>\.\.)
    | (?P<op><=|>=|!=|[=<>|/\[\]()@,*+\-.])
    | (?P<name>[A-Za-z_][\w.\-]*(?::[A-Za-z_][\w.\-]*)?)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str):
    tokens = []
    pos = 0
    n = len(s)
    while pos < n:
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            if s[pos:].strip() == "":
                break
            raise XPathError(f"bad token at {pos} in {s!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "literal":
            tokens.append(("literal", val[1:-1]))
        elif kind == "number":
            tokens.append(("number", float(val)))
        elif kind == "dslash":
            tokens.append(("op", "//"))
        elif kind == "dcolon":
            tokens.append(("op", "::"))
        elif kind == "ddot":
            tokens.append(("op", ".."))
        elif kind == "op":
            tokens.append(("op", val))
        else:
            tokens.append(("name", val))
    tokens.append(("eof", None))
    return tokens


AXES = {
    "child", "descendant", "descendant-or-self", "self", "parent",
    "ancestor", "ancestor-or-self", "attribute", "following-sibling",
    "preceding-sibling", "following", "preceding",
}
REVERSE_AXES = {"ancestor", "ancestor-or-self", "preceding", "preceding-sibling", "parent"}


# ---------------------------------------------------------------------------
# Parser (produces an AST of tuples)
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def peek2(self):
        return self.toks[self.i + 1] if self.i + 1 < len(self.toks) else ("eof", None)

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[0] != "op" or t[1] != val:
            raise XPathError(f"expected {val!r}, got {t}")

    # Expr
    def parse(self):
        e = self.or_expr()
        if self.peek()[0] != "eof":
            raise XPathError(f"trailing tokens: {self.peek()}")
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.peek() == ("name", "or"):
            self.next()
            e = ("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.eq_expr()
        while self.peek() == ("name", "and"):
            self.next()
            e = ("and", e, self.eq_expr())
        return e

    def eq_expr(self):
        e = self.rel_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("=", "!="):
            op = self.next()[1]
            e = ("cmp", op, e, self.rel_expr())
        return e

    def rel_expr(self):
        e = self.add_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("<", ">", "<=", ">="):
            op = self.next()[1]
            e = ("cmp", op, e, self.add_expr())
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = ("arith", op, e, self.mul_expr())
        return e

    def mul_expr(self):
        e = self.unary_expr()
        while True:
            t = self.peek()
            if t == ("op", "*"):
                self.next()
                e = ("arith", "*", e, self.unary_expr())
            elif t[0] == "name" and t[1] in ("div", "mod"):
                self.next()
                e = ("arith", t[1], e, self.unary_expr())
            else:
                break
        return e

    def unary_expr(self):
        neg = False
        while self.peek() == ("op", "-"):
            self.next()
            neg = not neg
        e = self.union_expr()
        return ("neg", e) if neg else e

    def union_expr(self):
        e = self.path_expr()
        while self.peek() == ("op", "|"):
            self.next()
            e = ("union", e, self.path_expr())
        return e

    def path_expr(self):
        t = self.peek()
        # FilterExpr cases: literal, number, function call, '(' expr ')'
        if t[0] in ("literal", "number"):
            self.next()
            e = ("const", t[1])
            return self._filter_tail(e)
        if t == ("op", "("):
            self.next()
            e = self.or_expr()
            self.expect(")")
            return self._filter_tail(e)
        if t[0] == "name" and self.peek2() == ("op", "(") and t[1] not in (
            "text", "comment", "node", "processing-instruction"
        ) and t[1] not in AXES:
            e = self.function_call()
            return self._filter_tail(e)
        return self.location_path()

    def _filter_tail(self, e):
        while self.peek() == ("op", "["):
            self.next()
            pred = self.or_expr()
            self.expect("]")
            e = ("filter", e, pred)
        if self.peek()[0] == "op" and self.peek()[1] in ("/", "//"):
            steps = []
            while self.peek()[0] == "op" and self.peek()[1] in ("/", "//"):
                sep = self.next()[1]
                if sep == "//":
                    steps.append(("step", "descendant-or-self", ("node",), []))
                steps.append(self.step())
            e = ("pathfrom", e, steps)
        return e

    def function_call(self):
        name = self.next()[1]
        self.expect("(")
        args = []
        if self.peek() != ("op", ")"):
            args.append(self.or_expr())
            while self.peek() == ("op", ","):
                self.next()
                args.append(self.or_expr())
        self.expect(")")
        return ("call", name, args)

    def location_path(self):
        steps = []
        t = self.peek()
        absolute = False
        if t[0] == "op" and t[1] in ("/", "//"):
            absolute = True
            sep = self.next()[1]
            if sep == "//":
                steps.append(("step", "descendant-or-self", ("node",), []))
            elif self.peek()[0] == "eof" or (
                self.peek()[0] == "op" and self.peek()[1] not in ("..", ".")
                and self.peek()[0] != "name" and self.peek()[1] not in ("@", "*")
            ):
                if self.peek()[0] not in ("name",) and self.peek() != ("op", "@") and self.peek() != ("op", "*") and self.peek() != ("op", ".") and self.peek() != ("op", ".."):
                    return ("path", True, [])
        steps.append(self.step())
        while self.peek()[0] == "op" and self.peek()[1] in ("/", "//"):
            sep = self.next()[1]
            if sep == "//":
                steps.append(("step", "descendant-or-self", ("node",), []))
            steps.append(self.step())
        return ("path", absolute, steps)

    def step(self):
        t = self.peek()
        if t == ("op", "."):
            self.next()
            return ("step", "self", ("node",), self._preds())
        if t == ("op", ".."):
            self.next()
            return ("step", "parent", ("node",), self._preds())
        axis = "child"
        if t == ("op", "@"):
            self.next()
            axis = "attribute"
            t = self.peek()
        elif t[0] == "name" and t[1] in AXES and self.peek2() == ("op", "::"):
            axis = self.next()[1]
            self.expect("::")
            t = self.peek()
        # node test
        if t == ("op", "*"):
            self.next()
            test = ("*",)
        elif t[0] == "name":
            name = t[1]
            if self.peek2() == ("op", "(") and name in (
                "text", "comment", "node", "processing-instruction"
            ):
                self.next()
                self.expect("(")
                if name == "processing-instruction" and self.peek()[0] == "literal":
                    self.next()
                self.expect(")")
                test = (name,)
            else:
                self.next()
                test = ("name", name)
        else:
            raise XPathError(f"bad step token {t}")
        return ("step", axis, test, self._preds())

    def _preds(self):
        preds = []
        while self.peek() == ("op", "["):
            self.next()
            preds.append(self.or_expr())
            self.expect("]")
        return preds


@lru_cache(maxsize=4096)
def _compile(expr: str):
    return _Parser(_tokenize(expr)).parse()


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def _string_value(n) -> str:
    if isinstance(n, AttrNode):
        return n.value
    if isinstance(n, Document):
        return n.root.get_content() if n.root else ""
    return n.get_content()


def _children(n):
    if isinstance(n, Document):
        return [n.root] if n.root is not None else []
    if isinstance(n, AttrNode):
        return []
    return n.children


def _parent(n, doc):
    if isinstance(n, AttrNode):
        return n.owner
    if isinstance(n, Document):
        return None
    if n.parent is None:
        if doc is not None and doc.root is n:
            return doc
        return None
    return n.parent


class _Ctx:
    __slots__ = ("doc", "_order")

    def __init__(self, doc):
        self.doc = doc
        self._order = None

    def order(self):
        if self._order is None:
            order = {}
            i = 0

            def visit(n):
                nonlocal i
                order[id(n)] = i
                i += 1
                if isinstance(n, Node) and n.type == ELEMENT_NODE:
                    for c in n.children:
                        visit(c)

            root = self.doc.root if isinstance(self.doc, Document) else self.doc
            if isinstance(self.doc, Document):
                order[id(self.doc)] = -1
            if root is not None:
                visit(root)
            self._order = order
        return self._order

    def sort_key(self, n):
        order = self.order()
        if isinstance(n, AttrNode):
            base = order.get(id(n.owner), 1 << 60)
            try:
                ai = list(n.owner.attrs).index(n.name)
            except ValueError:
                ai = 0
            return (base, 1, ai)
        return (order.get(id(n), 1 << 60), 0, 0)


def _doc_sort(nodes, ctx: _Ctx):
    seen = set()
    uniq = []
    for n in nodes:
        if id(n) not in seen:
            seen.add(id(n))
            uniq.append(n)
    uniq.sort(key=ctx.sort_key)
    return uniq


def _to_number(v) -> float:
    if isinstance(v, float):
        return v
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, str):
        try:
            return float(v.strip())
        except ValueError:
            return math.nan
    if isinstance(v, list):
        return _to_number(_to_string(v))
    return math.nan


def _to_string(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and not math.isinf(v):
            return str(int(v))
        return repr(v)
    if isinstance(v, list):
        return _string_value(v[0]) if v else ""
    return str(v)


def _to_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return v != 0 and not math.isnan(v)
    if isinstance(v, str):
        return len(v) > 0
    if isinstance(v, list):
        return len(v) > 0
    return bool(v)


def _node_test(n, test) -> bool:
    kind = test[0]
    if kind == "node":
        return True
    if isinstance(n, AttrNode):
        if kind == "*":
            return True
        if kind == "name":
            return n.name == test[1]
        return False
    t = n.type if isinstance(n, Node) else None
    if kind == "*":
        return t == ELEMENT_NODE
    if kind == "name":
        return t == ELEMENT_NODE and n.name == test[1]
    if kind == "text":
        return t == TEXT_NODE or t == CDATA_NODE
    if kind == "comment":
        return t == COMMENT_NODE
    if kind == "processing-instruction":
        return t == PI_NODE
    return False


def _axis_nodes(n, axis, ctx: _Ctx):
    doc = ctx.doc if isinstance(ctx.doc, Document) else None
    if axis == "child":
        return _children(n)
    if axis == "attribute":
        if isinstance(n, Node) and n.type == ELEMENT_NODE:
            return [AttrNode(n, k, "" if v is None else v) for k, v in n.attrs.items()]
        return []
    if axis == "self":
        return [n]
    if axis == "parent":
        p = _parent(n, doc)
        return [p] if p is not None else []
    if axis == "ancestor" or axis == "ancestor-or-self":
        out = [n] if axis == "ancestor-or-self" else []
        p = _parent(n, doc)
        while p is not None:
            out.append(p)
            p = _parent(p, doc)
        return out  # reverse-axis order (nearest first)
    if axis == "descendant" or axis == "descendant-or-self":
        out = [n] if axis == "descendant-or-self" else []
        stack = list(reversed(_children(n)))
        while stack:
            c = stack.pop()
            out.append(c)
            if isinstance(c, Node) and c.type == ELEMENT_NODE:
                stack.extend(reversed(c.children))
        return out
    if axis == "following-sibling":
        if isinstance(n, (AttrNode, Document)):
            return []
        p = n.parent
        if p is None:
            return []
        sibs = p.children
        try:
            i = sibs.index(n)
        except ValueError:
            return []
        return sibs[i + 1 :]
    if axis == "preceding-sibling":
        if isinstance(n, (AttrNode, Document)):
            return []
        p = n.parent
        if p is None:
            return []
        sibs = p.children
        try:
            i = sibs.index(n)
        except ValueError:
            return []
        return list(reversed(sibs[:i]))
    if axis == "following":
        order = ctx.order()
        me = order.get(id(n))
        if me is None:
            return []
        # all nodes after me that are not descendants
        out = []
        root = ctx.doc.root if isinstance(ctx.doc, Document) else ctx.doc
        descendants = {id(d) for d in n.iter_descendants()} if isinstance(n, Node) and n.type == ELEMENT_NODE else set()
        stack = [root]
        while stack:
            c = stack.pop()
            if order.get(id(c), -2) > me and id(c) not in descendants:
                out.append(c)
            if isinstance(c, Node) and c.type == ELEMENT_NODE:
                stack.extend(reversed(c.children))
        return _doc_sort(out, ctx)
    if axis == "preceding":
        order = ctx.order()
        me = order.get(id(n))
        if me is None:
            return []
        ancs = set()
        doc2 = ctx.doc if isinstance(ctx.doc, Document) else None
        p = _parent(n, doc2)
        while p is not None:
            ancs.add(id(p))
            p = _parent(p, doc2)
        out = []
        root = ctx.doc.root if isinstance(ctx.doc, Document) else ctx.doc
        stack = [root]
        while stack:
            c = stack.pop()
            if order.get(id(c), 1 << 61) < me and id(c) not in ancs:
                out.append(c)
            if isinstance(c, Node) and c.type == ELEMENT_NODE:
                stack.extend(reversed(c.children))
        out.sort(key=ctx.sort_key, reverse=True)
        return out
    raise XPathError(f"unsupported axis {axis}")


def _eval_step(nodes, step, ctx: _Ctx):
    _tag, axis, test, preds = step
    result = []
    for n in nodes:
        cand = [c for c in _axis_nodes(n, axis, ctx) if _node_test(c, test)]
        for pred in preds:
            size = len(cand)
            kept = []
            for i, c in enumerate(cand):
                v = _eval(pred, c, i + 1, size, ctx)
                if isinstance(v, float):
                    ok = (i + 1) == int(v)
                else:
                    ok = _to_bool(v)
                if ok:
                    kept.append(c)
            cand = kept
        result.extend(cand)
    return _doc_sort(result, ctx)


def _eval_path(start_nodes, absolute, steps, ctx: _Ctx):
    if absolute:
        nodes = [ctx.doc]
    else:
        nodes = list(start_nodes)
    for step in steps:
        nodes = _eval_step(nodes, step, ctx)
    return nodes


_POSITIONAL_MEMO: dict = {}


def _has_positional(ast) -> bool:
    """True if the expression (a predicate) depends on context position.
    Memoized by id(): ASTs live forever in the _compile lru_cache."""
    cached = _POSITIONAL_MEMO.get(id(ast))
    if cached is not None:
        return cached
    r = _has_positional_uncached(ast)
    _POSITIONAL_MEMO[id(ast)] = r
    return r


def _has_positional_uncached(ast) -> bool:
    kind = ast[0]
    if kind == "const":
        return isinstance(ast[1], float)  # bare-number predicate
    if kind == "call" and ast[1] in ("position", "last"):
        return True
    for part in ast[1:]:
        if isinstance(part, tuple):
            if _has_positional(part):
                return True
        elif isinstance(part, list):
            if any(isinstance(p, tuple) and _has_positional(p) for p in part):
                return True
    return False


_SIMPLE_PRED_MEMO: dict = {}
_MISS = object()


def _compile_simple_pred(ast):
    """Compile common predicate shapes to direct callables (no _eval
    recursion): @attr existence, contains(@attr,'s'), @attr='v',
    node(), and/or/not combinations.  Returns None when unsupported."""
    cached = _SIMPLE_PRED_MEMO.get(id(ast), _MISS)
    if cached is not _MISS:
        return cached
    fn = _compile_simple_pred_uncached(ast)
    _SIMPLE_PRED_MEMO[id(ast)] = fn
    return fn


def _attr_name_of(ast):
    """ast is a relative path of exactly one attribute step -> attr name."""
    if (
        ast[0] == "path" and not ast[1] and len(ast[2]) == 1
        and ast[2][0][1] == "attribute" and not ast[2][0][3]
        and ast[2][0][2][0] == "name"
    ):
        return ast[2][0][2][1]
    return None


def _compile_simple_pred_uncached(ast):
    kind = ast[0]
    if kind == "path":
        a = _attr_name_of(ast)
        if a is not None:
            return lambda n: n.type == ELEMENT_NODE and a in n.attrs
        # child::node() — any child
        if (not ast[1] and len(ast[2]) == 1 and ast[2][0][1] == "child"
                and ast[2][0][2] == ("node",) and not ast[2][0][3]):
            return lambda n: bool(getattr(n, "children", ()))
        return None
    if kind == "call":
        name, args = ast[1], ast[2]
        if name == "not" and len(args) == 1:
            inner = _compile_simple_pred(args[0])
            if inner is not None:
                return lambda n: not inner(n)
            return None
        if name == "contains" and len(args) == 2 and args[1][0] == "const" \
                and isinstance(args[1][1], str):
            a = _attr_name_of(args[0])
            if a is not None:
                s = args[1][1]

                def _contains(n, a=a, s=s):
                    if n.type != ELEMENT_NODE or a not in n.attrs:
                        return s == ""
                    v = n.attrs[a]
                    return s in ("" if v is None else v)

                return _contains
        return None
    if kind == "cmp" and ast[1] == "=" and ast[3][0] == "const" \
            and isinstance(ast[3][1], str):
        a = _attr_name_of(ast[2])
        if a is not None:
            s = ast[3][1]

            def _eq(n, a=a, s=s):
                if n.type != ELEMENT_NODE or a not in n.attrs:
                    return False
                v = n.attrs[a]
                return ("" if v is None else v) == s

            return _eq
        return None
    if kind in ("or", "and"):
        l = _compile_simple_pred(ast[1])
        r = _compile_simple_pred(ast[2])
        if l is not None and r is not None:
            if kind == "or":
                return lambda n: l(n) or r(n)
            return lambda n: l(n) and r(n)
    return None


def _tag_index(doc: Document) -> dict:
    """Per-Document {tag -> doc-order element list} (None key = all
    elements), cached against the global structural-mutation counter
    (dom._MUTVER).  One DFS amortizes across every subsequent `//tag`
    scan until the next structural mutation — at 24 fixed xpath walks
    per extracted page, most of which match nothing and mutate nothing,
    this collapses the walk count to the number of mutation epochs."""
    cached = getattr(doc, "_tag_index", None)
    ver = dom_module._MUTVER
    if cached is not None and cached[0] == ver:
        return cached[1]
    table: dict = {None: []}
    root = doc.root
    if root is not None and root.type == ELEMENT_NODE:
        all_el = table[None]
        stack = [root]
        pop = stack.pop
        extend = stack.extend
        while stack:
            n = pop()
            all_el.append(n)
            lst = table.get(n.name)
            if lst is None:
                table[n.name] = [n]
            else:
                lst.append(n)
            ch = n.children
            if ch:
                extend([c for c in ch[::-1] if c.type == ELEMENT_NODE])
    doc._tag_index = (ver, table)
    return table


def _try_fast_abs_scan(steps, ctx: _Ctx):
    """Fast path for absolute `//test[preds]` (position-free predicates)
    and `//test[preds]/@attr`: doc-order element lists come from the
    versioned per-Document tag index (one shared DFS per mutation epoch)
    instead of a walk per eval; no global order-map rebuild, no sort."""
    attr_name = None
    if len(steps) == 3:
        s2 = steps[2]
        # trailing attribute step: axis=attribute, name test, no preds
        if s2[1] != "attribute" or s2[3] or s2[2][0] != "name":
            return None
        attr_name = s2[2][1]
    elif len(steps) != 2:
        return None
    s0, s1 = steps[0], steps[1]
    if s0[1] != "descendant-or-self" or s0[2] != ("node",) or s0[3]:
        return None
    if s1[1] != "child":
        return None
    preds = s1[3]
    for p in preds:
        if _has_positional(p):
            return None
    test = s1[2]
    root = ctx.doc.root if isinstance(ctx.doc, Document) else ctx.doc
    if root is None:
        return []
    kind = test[0]
    if kind == "name":
        out = _tag_index(ctx.doc).get(test[1], [])
    elif kind == "*":
        out = _tag_index(ctx.doc)[None]
    else:
        # non-element node tests (comment()/text()/node()) still walk —
        # the index holds elements only
        if attr_name is not None:
            return None
        out = []
        stack = [root]
        while stack:
            n = stack.pop()
            if _node_test(n, test):
                out.append(n)
            if n.type == ELEMENT_NODE:
                stack.extend(n.children[::-1])
    for pred in preds:
        simple = _compile_simple_pred(pred)
        if simple is not None:
            out = [n for n in out if simple(n)]
        else:
            out = [n for n in out if _to_bool(_eval(pred, n, 1, 1, ctx))]
    if attr_name is not None:
        # per-element attribute tail: each element yields at most one
        # named attribute, so element doc order IS attribute doc order
        return [AttrNode(n, attr_name,
                         "" if n.attrs[attr_name] is None
                         else n.attrs[attr_name])
                for n in out
                if n.type == ELEMENT_NODE and attr_name in n.attrs]
    # never hand out the cached list itself — callers may keep it across
    # mutations; predicate filtering already produced a fresh list
    return out if preds else list(out)


def _eval(ast, cnode, cpos, csize, ctx: _Ctx):
    kind = ast[0]
    if kind == "const":
        return ast[1]
    if kind == "path":
        if ast[1] and isinstance(ctx.doc, Document):
            fast = _try_fast_abs_scan(ast[2], ctx)
            if fast is not None:
                return fast
        return _eval_path([cnode], ast[1], ast[2], ctx)
    if kind == "pathfrom":
        base = _eval(ast[1], cnode, cpos, csize, ctx)
        if not isinstance(base, list):
            raise XPathError("path from non-node-set")
        return _eval_path(base, False, ast[2], ctx)
    if kind == "filter":
        base = _eval(ast[1], cnode, cpos, csize, ctx)
        if not isinstance(base, list):
            raise XPathError("filter on non-node-set")
        size = len(base)
        kept = []
        for i, n in enumerate(base):
            v = _eval(ast[2], n, i + 1, size, ctx)
            if isinstance(v, float):
                if (i + 1) == int(v):
                    kept.append(n)
            elif _to_bool(v):
                kept.append(n)
        return kept
    if kind == "union":
        a = _eval(ast[1], cnode, cpos, csize, ctx)
        b = _eval(ast[2], cnode, cpos, csize, ctx)
        if not isinstance(a, list) or not isinstance(b, list):
            raise XPathError("union of non-node-sets")
        return _doc_sort(a + b, ctx)
    if kind == "or":
        return _to_bool(_eval(ast[1], cnode, cpos, csize, ctx)) or _to_bool(
            _eval(ast[2], cnode, cpos, csize, ctx)
        )
    if kind == "and":
        return _to_bool(_eval(ast[1], cnode, cpos, csize, ctx)) and _to_bool(
            _eval(ast[2], cnode, cpos, csize, ctx)
        )
    if kind == "neg":
        return -_to_number(_eval(ast[1], cnode, cpos, csize, ctx))
    if kind == "arith":
        op = ast[1]
        a = _to_number(_eval(ast[2], cnode, cpos, csize, ctx))
        b = _to_number(_eval(ast[3], cnode, cpos, csize, ctx))
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "div":
            try:
                return a / b
            except ZeroDivisionError:
                if math.isnan(a) or a == 0:
                    return math.nan
                return math.inf if a > 0 else -math.inf
        if op == "mod":
            try:
                return math.fmod(a, b)
            except ValueError:
                return math.nan
    if kind == "cmp":
        return _compare(ast[1], _eval(ast[2], cnode, cpos, csize, ctx),
                        _eval(ast[3], cnode, cpos, csize, ctx))
    if kind == "call":
        return _call(ast[1], ast[2], cnode, cpos, csize, ctx)
    raise XPathError(f"bad AST node {kind}")


def _compare(op, a, b):
    if isinstance(a, list) or isinstance(b, list):
        if isinstance(a, list) and isinstance(b, list):
            avals = [_string_value(n) for n in a]
            bvals = set(_string_value(n) for n in b)
            for av in avals:
                for bv in bvals:
                    if _cmp_scalar(op, av, bv):
                        return True
            return False
        if isinstance(b, list):
            # normalize: node-set on left
            a, b = b, a
            op = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "=", "!=": "!="}[op]
        for n in a:
            sv = _string_value(n)
            if isinstance(b, float) or op in ("<", ">", "<=", ">="):
                if _cmp_scalar(op, _to_number(sv), _to_number(b) if not isinstance(b, (bool, str)) or op in ("<", ">", "<=", ">=") else b):
                    return True
            elif isinstance(b, bool):
                return _cmp_scalar(op, _to_bool(a), b)
            else:
                if _cmp_scalar(op, sv, b):
                    return True
        return False
    return _cmp_scalar(op, a, b)


def _cmp_scalar(op, a, b):
    if op in ("<", ">", "<=", ">="):
        a, b = _to_number(a), _to_number(b)
        if math.isnan(a) or math.isnan(b):
            return False
        return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
    if isinstance(a, bool) or isinstance(b, bool):
        a, b = _to_bool(a), _to_bool(b)
    elif isinstance(a, float) or isinstance(b, float):
        a, b = _to_number(a), _to_number(b)
        if math.isnan(a) or math.isnan(b):
            return op == "!="
    else:
        a, b = _to_string(a), _to_string(b)
    return (a == b) if op == "=" else (a != b)


def _call(name, args, cnode, cpos, csize, ctx: _Ctx):
    def ev(i):
        return _eval(args[i], cnode, cpos, csize, ctx)

    if name == "last":
        return float(csize)
    if name == "position":
        return float(cpos)
    if name == "count":
        v = ev(0)
        if not isinstance(v, list):
            raise XPathError("count() needs node-set")
        return float(len(v))
    if name in ("name", "local-name"):
        if args:
            v = ev(0)
            n = v[0] if isinstance(v, list) and v else None
        else:
            n = cnode
        if n is None:
            return ""
        nm = n.get_name() if not isinstance(n, Document) else ""
        if name == "local-name" and ":" in nm:
            nm = nm.split(":", 1)[1]
        return nm
    if name == "string":
        if not args:
            return _string_value(cnode)
        return _to_string(ev(0))
    if name == "concat":
        return "".join(_to_string(ev(i)) for i in range(len(args)))
    if name == "starts-with":
        return _to_string(ev(0)).startswith(_to_string(ev(1)))
    if name == "contains":
        return _to_string(ev(1)) in _to_string(ev(0))
    if name == "substring-before":
        a, b = _to_string(ev(0)), _to_string(ev(1))
        i = a.find(b)
        return a[:i] if i >= 0 else ""
    if name == "substring-after":
        a, b = _to_string(ev(0)), _to_string(ev(1))
        i = a.find(b)
        return a[i + len(b):] if i >= 0 else ""
    if name == "substring":
        s = _to_string(ev(0))
        start = _to_number(ev(1))
        if math.isnan(start):
            return ""
        start = round(start)
        if len(args) >= 3:
            length = _to_number(ev(2))
            if math.isnan(length):
                return ""
            end = start + round(length)
        else:
            end = math.inf
        out = []
        for i, chv in enumerate(s, start=1):
            if i >= start and i < end:
                out.append(chv)
        return "".join(out)
    if name == "string-length":
        s = _to_string(ev(0)) if args else _string_value(cnode)
        return float(len(s))
    if name == "normalize-space":
        s = _to_string(ev(0)) if args else _string_value(cnode)
        return " ".join(s.split())
    if name == "translate":
        s, frm, to = _to_string(ev(0)), _to_string(ev(1)), _to_string(ev(2))
        table = {}
        for i, c in enumerate(frm):
            if c not in table:
                table[c] = to[i] if i < len(to) else None
        return "".join(
            (table[c] if table[c] is not None else "") if c in table else c for c in s
        )
    if name == "boolean":
        return _to_bool(ev(0))
    if name == "not":
        return not _to_bool(ev(0))
    if name == "true":
        return True
    if name == "false":
        return False
    if name == "lang":
        return False
    if name == "number":
        return _to_number(ev(0)) if args else _to_number(_string_value(cnode))
    if name == "sum":
        v = ev(0)
        if not isinstance(v, list):
            raise XPathError("sum() needs node-set")
        return float(sum(_to_number(_string_value(n)) for n in v))
    if name == "floor":
        return math.floor(_to_number(ev(0)))
    if name == "ceiling":
        return math.ceil(_to_number(ev(0)))
    if name == "round":
        v = _to_number(ev(0))
        if math.isnan(v) or math.isinf(v):
            return v
        return math.floor(v + 0.5)
    if name == "id":
        v = ev(0)
        ids = set()
        if isinstance(v, list):
            for n in v:
                ids.update(_string_value(n).split())
        else:
            ids.update(_to_string(v).split())
        root = ctx.doc.root if isinstance(ctx.doc, Document) else ctx.doc
        out = []
        if root is not None:
            for n in [root, *root.iter_descendants()]:
                if isinstance(n, Node) and n.type == ELEMENT_NODE and n.get_attribute("id") in ids:
                    out.append(n)
        return out
    raise XPathError(f"unknown function {name}()")


class Context:
    """Evaluation context bound to a Document (like libxml xpath::Context)."""

    def __init__(self, doc: Document):
        self.doc = doc

    def evaluate(self, expr: str, context_node=None):
        ast = _compile(expr)
        ctx = _Ctx(self.doc)
        cnode = context_node if context_node is not None else self.doc
        return _eval(ast, cnode, 1, 1, ctx)

    def find_nodes(self, expr: str, context_node=None) -> list:
        """evaluate_xpath equivalent: node-set results only (else [])."""
        v = self.evaluate(expr, context_node)
        return v if isinstance(v, list) else []
