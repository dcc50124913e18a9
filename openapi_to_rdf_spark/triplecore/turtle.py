"""Minimal Turtle reader/writer (rdflib is unavailable offline).

The reader covers exactly the syntax rdflib's ``turtle`` serializer emits for
the reference goldens (/root/reference/output/{rdf,shacl}/*.ttl, verified):
@prefix directives, prefixed names, <IRI>s, ``a``, ``;`` ``,`` predicate-object
lists, anonymous ``[ ... ]`` / ``[]`` bnodes, ``( ... )`` collections, short and
long (triple-quoted) string literals with escapes, bare integer / decimal /
double / boolean literals, ``^^`` datatypes, and ``_:label`` bnodes.

The writer emits deterministic, line-oriented Turtle (one triple per line,
labeled bnodes) — valid Turtle, not a byte-level clone of rdflib's pretty
printer; triple-set equality is what the correctness gate compares.
"""

from __future__ import annotations

import re

from .terms import (
    RDF_NS,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    typed_literal,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<longstr>\"\"\"(?:[^"\\]|\\.|\"(?!\"\")|\"\"(?!\"))*\"\"\")
    | (?P<str>"(?:[^"\\\n]|\\.)*")
    | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<prefix>@prefix|@base|PREFIX|BASE)
    | (?P<bnodelabel>_:[A-Za-z0-9_]+)
    | (?P<dtype>\^\^)
    | (?P<double>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<punct>[;,.()\[\]])
    | (?P<pname>(?:[A-Za-z_][A-Za-z0-9_.\-]*)?:(?:[A-Za-z0-9_:%\-]|\\[~.!$&'()*+,;=/?\#@%_]|\.(?=[A-Za-z0-9_:%\\\-]))*)
    | (?P<kw>[A-Za-z][A-Za-z0-9_\-]*)
    """,
    re.VERBOSE,
)


def _unescape(body: str) -> str:
    out, i, n = [], 0, len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            nxt = body[i + 1]
            if nxt == "u":
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(body[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class _Tokens:
    def __init__(self, text: str):
        self.items = []
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            if m.start() != pos:
                raise ValueError(f"turtle: unlexable input at {pos}: {text[pos:pos+40]!r}")
            pos = m.end()
            if m.lastgroup != "ws":
                self.items.append((m.lastgroup, m.group()))
        if pos != len(text):
            raise ValueError(f"turtle: trailing garbage at {pos}: {text[pos:pos+40]!r}")
        self.i = 0

    def peek(self):
        return self.items[self.i] if self.i < len(self.items) else (None, None)

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, value: str):
        kind, val = self.next()
        if val != value:
            raise ValueError(f"turtle: expected {value!r}, got {val!r}")


class TurtleParser:
    def __init__(self, text: str):
        self.toks = _Tokens(text)
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: set[tuple] = set()
        self._anon = 0

    def _fresh_bnode(self) -> tuple:
        self._anon += 1
        return ("b", f"anon{self._anon}")

    def parse(self) -> set[tuple]:
        while self.toks.peek()[0] is not None:
            kind, val = self.toks.peek()
            if kind == "prefix":
                self._directive()
            else:
                self._triples_block()
        return self.triples

    def _directive(self):
        _, which = self.toks.next()
        if which in ("@base", "BASE"):
            kind, val = self.toks.next()
            self.base = val[1:-1]
        else:
            kind, pname = self.toks.next()
            if not pname.endswith(":"):
                raise ValueError(f"turtle: bad prefix decl {pname!r}")
            kind, iri_tok = self.toks.next()
            self.prefixes[pname[:-1]] = iri_tok[1:-1]
        if which.startswith("@"):
            self.toks.expect(".")

    def _triples_block(self):
        kind, val = self.toks.peek()
        if kind == "punct" and val == "[":
            subj = self._bnode_props_or_anon()
        elif kind == "punct" and val == "(":
            subj = self._collection()
        else:
            subj = self._term()
        # a bare "[ ...props... ] ." statement is legal with no predicate list
        kind, val = self.toks.peek()
        if not (kind == "punct" and val == "."):
            self._predicate_object_list(subj)
        self.toks.expect(".")

    def _predicate_object_list(self, subj):
        while True:
            pred = self._verb()
            while True:
                obj = self._object()
                self.triples.add((subj, pred, obj))
                kind, val = self.toks.peek()
                if kind == "punct" and val == ",":
                    self.toks.next()
                    continue
                break
            kind, val = self.toks.peek()
            if kind == "punct" and val == ";":
                self.toks.next()
                # trailing ; before . or ] is legal
                kind, val = self.toks.peek()
                if kind == "punct" and val in (".", "]"):
                    return
                continue
            return

    def _verb(self):
        kind, val = self.toks.peek()
        if kind == "kw" and val == "a":
            self.toks.next()
            return ("i", RDF_NS + "type")
        return self._term()

    def _object(self):
        kind, val = self.toks.peek()
        if kind == "punct" and val == "[":
            return self._bnode_props_or_anon()
        if kind == "punct" and val == "(":
            return self._collection()
        return self._term()

    def _bnode_props_or_anon(self):
        self.toks.expect("[")
        node = self._fresh_bnode()
        kind, val = self.toks.peek()
        if not (kind == "punct" and val == "]"):
            self._predicate_object_list(node)
        self.toks.expect("]")
        return node

    def _collection(self):
        self.toks.expect("(")
        items = []
        while True:
            kind, val = self.toks.peek()
            if kind == "punct" and val == ")":
                self.toks.next()
                break
            items.append(self._object())
        if not items:
            return ("i", RDF_NS + "nil")
        head = self._fresh_bnode()
        cur = head
        for idx, item in enumerate(items):
            self.triples.add((cur, ("i", RDF_NS + "first"), item))
            if idx + 1 < len(items):
                nxt = self._fresh_bnode()
                self.triples.add((cur, ("i", RDF_NS + "rest"), nxt))
                cur = nxt
            else:
                self.triples.add((cur, ("i", RDF_NS + "rest"), ("i", RDF_NS + "nil")))
        return head

    def _term(self):
        kind, val = self.toks.next()
        if kind == "iri":
            return ("i", self.base + _unescape(val[1:-1]) if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", val[1:-1]) else _unescape(val[1:-1]))
        if kind == "pname":
            pfx, _, local = val.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"turtle: unknown prefix {pfx!r}")
            local = re.sub(r"\\(.)", r"\1", local)
            return ("i", self.prefixes[pfx] + local)
        if kind == "bnodelabel":
            return ("b", "named_" + val[2:])
        if kind in ("str", "longstr"):
            body = val[3:-3] if kind == "longstr" else val[1:-1]
            lex = _unescape(body)
            nk, nv = self.toks.peek()
            if nk == "dtype":
                self.toks.next()
                dt = self._term()
                return typed_literal(lex, dt[1])
            if nk == "kw" and nv.startswith("@"):  # language tag (not in corpus)
                self.toks.next()
            return ("l", lex, XSD_STRING)
        if kind == "integer":
            return typed_literal(val, XSD_INTEGER)
        if kind == "decimal":
            return typed_literal(val, XSD_DECIMAL)
        if kind == "double":
            return typed_literal(val, XSD_DOUBLE)
        if kind == "kw" and val in ("true", "false"):
            return ("l", val, XSD_BOOLEAN)
        raise ValueError(f"turtle: unexpected token {kind}:{val!r}")


def parse_turtle(text: str) -> set[tuple]:
    """Parse Turtle text into a set of term-tuple triples."""
    return TurtleParser(text).parse()


def _fmt_term(term: tuple) -> str:
    tag = term[0]
    if tag == "i":
        return "<" + term[1].replace("\\", "\\\\").replace(">", "\\>") + ">"
    if tag == "b":
        return "_:" + re.sub(r"[^A-Za-z0-9_]", "_", term[1])
    lex = (
        term[1]
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    if term[2] == XSD_STRING:
        return f'"{lex}"'
    return f'"{lex}"^^<{term[2]}>'


def serialize_turtle(triples, prefixes: dict[str, str] | None = None) -> str:
    """Deterministic line-per-triple Turtle (N-Triples compatible subset)."""
    lines = [
        f"{_fmt_term(s)} {_fmt_term(p)} {_fmt_term(o)} ."
        for (s, p, o) in triples
    ]
    header = [f"@prefix {k}: <{v}> ." for k, v in sorted((prefixes or {}).items())]
    # prefixes are advisory only (terms are written in full) but kept for
    # parity with the reference's bound-prefix output (shacl_converter.py:60-101)
    return "\n".join(header + sorted(lines)) + "\n"
