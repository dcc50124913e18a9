"""SPARQL 1.1 text front-end — tokenizer, recursive-descent parser, and
compiler onto the engine's existing algebra (operators/bgp, paths, quads,
update), so standard SPARQL strings run against a triple/quad DataFrame.

The operator layer is deliberately string-free (tuple patterns, path
ASTs, Column filters) because that is the right *programmatic* API; this
module is the other half a store needs: a user coming from any RDF
engine types ``SELECT ?c (COUNT(?o) AS ?n) WHERE {..} GROUP BY ?c`` and
gets the same DataFrame the tuple API would build — the parser only ever
TRANSLATES, every physical decision stays in the operator layer (pruned
per-pattern scans, shared-variable equi-joins, eager aggregate pushdown,
semi/anti-joins for EXISTS/MINUS, semi-naive path closure).

Supported surface (SPARQL 1.1 REC grammar, the subset the algebra has):

- Prologue: ``PREFIX``/``BASE``; built-in prefixes kg/rdf/rdfs/owl/xsd/sh.
- Query forms: SELECT (DISTINCT/REDUCED, ``*``, expression projection
  ``(expr AS ?v)``, aggregates COUNT/SUM/MIN/MAX/AVG/COUNT(DISTINCT)/
  GROUP_CONCAT(;SEPARATOR)/SAMPLE, GROUP BY, HAVING), ASK, CONSTRUCT,
  DESCRIBE ?v WHERE {..}.
- Group graph patterns: triple blocks with ``;``/``,`` predicate-object
  lists and ``a``; property paths (``/ | ^ + * ?`` and ``!(..)``) compiled
  to the operators/paths AST; FILTER (incl. EXISTS / NOT EXISTS); MINUS;
  OPTIONAL; UNION; BIND; VALUES (single- and multi-variable); nested
  groups; subqueries ``{ SELECT .. }``; ``GRAPH term { patterns }`` over
  a quad table.
- Dataset clause over a quad frame: ``FROM <g>`` (set-semantics merge
  into the default graph) and ``FROM NAMED <g>`` (restricts GRAPH).
- Solution modifiers: ORDER BY (ASC/DESC), LIMIT, OFFSET.
- Update: INSERT DATA / DELETE DATA (default graph or one GRAPH block),
  DELETE/INSERT .. WHERE, DELETE WHERE, and the graph-management ops
  CLEAR/DROP/ADD/COPY/MOVE, ``;``-separated sequences applied in order.

Value model: the engine's graphs store plain lexical strings, so literal
matching is lexical (``100`` matches the stored string ``"100"``), and a
comparison between a lone variable and a bare numeric literal is cast to
DOUBLE on the variable side — SPARQL's numeric comparison semantics for
the common case, stated narrowly so string comparisons stay string.
Typed/lang literal syntax is accepted and stripped to the lexical form.

Deviations, stated rather than hidden: FILTERs apply at the end of their
group (after OPTIONAL) rather than at their syntactic position; BINDs
apply after the group's joins (a BIND can see every group variable, and
later FILTERs see the BIND); REDUCED is treated as a bag (spec-legal);
blank nodes in patterns become fresh variables (exact SPARQL semantics);
GRAPH blocks take plain triple patterns only.

No counterpart exists in the reference (a one-way converter with no
query language); the driver hash-verifies the parser end to end
(``sparql_select``, ``sparql_agg``): text → algebra → DataFrame must
reproduce DuckDB's relational answer on the base tables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KG_NS = "http://ericsson.com/models/3gpp/kg#"
DEFAULT_PREFIXES = {
    "kg": KG_NS,
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "sh": "http://www.w3.org/ns/shacl#",
}
RDF_TYPE = DEFAULT_PREFIXES["rdf"] + "type"


class SparqlSyntaxError(ValueError):
    pass


# --------------------------------------------------------------------------
# tokenizer
# --------------------------------------------------------------------------

_TOKEN_SPECS = [
    ("WS", r"\s+"),
    ("COMMENT", r"#[^\n]*"),
    ("IRI", r"<[^\s<>\"{}|^`\\]*>"),
    ("VAR", r"[?$][A-Za-z_][A-Za-z0-9_]*"),
    ("STRING", r"'(?:[^'\\\n]|\\.)*'|\"(?:[^\"\\\n]|\\.)*\""),
    ("NUMBER", r"(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?"),
    ("BNODE", r"_:[A-Za-z0-9_]+"),
    ("PNAME", r"[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_-]*|:[A-Za-z0-9_-]+"),
    ("NAME", r"[A-Za-z_][A-Za-z0-9_]*"),
    ("OP", r"&&|\|\||!=|<=|>=|\^\^|[{}().;,*+?/|^!=<>\-\[\]@]"),
]
_TOKEN_RE = re.compile("|".join(f"(?P<{k}>{v})" for k, v in _TOKEN_SPECS))

_KEYWORDS = {
    "SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "WHERE", "PREFIX", "BASE",
    "DISTINCT", "REDUCED", "FROM", "NAMED", "OPTIONAL", "UNION", "MINUS",
    "FILTER", "BIND", "VALUES", "GRAPH", "AS", "GROUP", "BY", "HAVING",
    "ORDER", "ASC", "DESC", "LIMIT", "OFFSET", "EXISTS", "NOT", "IN",
    "COUNT", "SUM", "MIN", "MAX", "AVG", "GROUP_CONCAT", "SAMPLE",
    "SEPARATOR", "INSERT", "DELETE", "DATA", "WITH", "CLEAR", "ADD",
    "COPY", "MOVE", "TO", "DROP", "CREATE", "SILENT", "ALL", "DEFAULT",
    "UNDEF", "TRUE", "FALSE",
}


def _tokenize(text: str) -> list[tuple[str, str, int]]:
    """(kind, value, pos) tokens; NAME tokens matching a keyword become
    KW tokens with the uppercased keyword as value."""
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(
                f"cannot tokenize at offset {pos}: {text[pos:pos + 20]!r}")
        kind = m.lastgroup
        val = m.group()
        if kind == "NAME" and val.upper() in _KEYWORDS:
            kind, val = "KW", val.upper()
        if kind not in ("WS", "COMMENT"):
            toks.append((kind, val, pos))
        pos = m.end()
    toks.append(("EOF", "", len(text)))
    return toks


def _unquote(raw: str) -> str:
    body = raw[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t", "r": "\r"}
                  .get(m.group(1), m.group(1)), body)


def _sql_quote(value: str) -> str:
    return "'" + value.replace("\\", "\\\\").replace("'", "\\'") + "'"


# --------------------------------------------------------------------------
# algebra containers
# --------------------------------------------------------------------------

class Group:
    """One group graph pattern, in algebra form."""

    def __init__(self):
        self.patterns: list[tuple] = []
        self.filters: list[str] = []
        self.optional: list[Group] = []
        self.union: list[list[Group]] = []
        self.minus: list[Group] = []
        self.exists: list[Group] = []
        self.not_exists: list[Group] = []
        self.binds: list[tuple[str, str]] = []
        self.values: dict[str, list] = {}
        self.subselects: list[Query] = []
        self.groups: list[Group] = []
        self.graphs: list[tuple[str, list[tuple]]] = []


class Query:
    def __init__(self):
        self.form = "select"
        self.distinct = False
        self.project: list = []          # "*" | var names | (alias, expr)
        self.aggregates: dict = {}       # alias -> (fn, var, cast/sep)
        self.group_by: list[str] = []
        self.having: list[str] = []
        self.template: list[tuple] = []  # construct
        self.describe_var: str | None = None
        self.from_default: list[str] = []   # FROM <g>
        self.from_named: list[str] = []     # FROM NAMED <g>
        self.where: Group = Group()
        self.order_by: list[str] = []
        self.limit: int | None = None
        self.offset: int | None = None


_XSD_CASTS = {"integer": "bigint", "long": "bigint", "int": "bigint",
              "double": "double", "decimal": "double", "float": "double",
              "string": "string", "boolean": "boolean",
              "dateTime": "timestamp", "date": "date"}

_FN_SQL = {"STRLEN": "length", "UCASE": "upper", "LCASE": "lower",
           "CONTAINS": "contains", "STRSTARTS": "startswith",
           "STRENDS": "endswith", "SUBSTR": "substring", "CONCAT": "concat",
           "REPLACE": "regexp_replace", "COALESCE": "coalesce", "IF": "if",
           "ABS": "abs", "CEIL": "ceil", "FLOOR": "floor", "ROUND": "round",
           "YEAR": "year", "MONTH": "month", "DAY": "day", "HOURS": "hour",
           "MINUTES": "minute", "SECONDS": "second", "MD5": "md5"}

_AGG_FNS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "GROUP_CONCAT", "SAMPLE"}


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes = dict(DEFAULT_PREFIXES)
        self._bnode_n = 0
        self._qt_n = 0
        # quoted triples with variables enqueue (stmt_var, s, p, o) here;
        # parse_triples_block drains them into reification patterns
        self._pending_quoted: list[tuple] = []

    # ---- token plumbing ----------------------------------------------
    def peek(self, ahead: int = 0):
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def at(self, kind: str, val: str | None = None, ahead: int = 0) -> bool:
        k, v, _ = self.peek(ahead)
        return k == kind and (val is None or v == val)

    def eat(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str, val: str | None = None):
        if not self.at(kind, val):
            k, v, p = self.peek()
            raise SparqlSyntaxError(
                f"expected {val or kind} at offset {p}, got {v!r}")
        return self.eat()

    def take_kw(self, *kws: str) -> str | None:
        if self.at("KW") and self.peek()[1] in kws:
            return self.eat()[1]
        return None

    # ---- prologue ----------------------------------------------------
    def parse_prologue(self):
        while True:
            if self.take_kw("PREFIX"):
                pn = self.expect("PNAME")[1]
                if not pn.endswith(":"):
                    raise SparqlSyntaxError(f"bad PREFIX name {pn!r}")
                self.prefixes[pn[:-1]] = self.expect("IRI")[1][1:-1]
            elif self.take_kw("BASE"):
                self.expect("IRI")  # accepted; relative IRIs unsupported
            else:
                return

    # ---- terms -------------------------------------------------------
    def expand_pname(self, pname: str, pos: int) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(
                f"undeclared prefix {pfx!r}: at offset {pos}")
        return self.prefixes[pfx] + local

    def parse_term(self, *, as_object: bool = False) -> str:
        kind, val, pos = self.peek()
        if kind == "OP" and val == "<" and self.at("OP", "<", ahead=1):
            return self._parse_quoted_triple()
        if kind == "VAR":
            self.eat()
            return "?" + val[1:]
        if kind == "IRI":
            self.eat()
            return val[1:-1]
        if kind == "PNAME":
            self.eat()
            return self.expand_pname(val, pos)
        if kind == "BNODE":
            self.eat()
            return "?_bn_" + val[2:]
        if kind == "OP" and val == "[":
            self.eat()
            self.expect("OP", "]")
            self._bnode_n += 1
            return f"?_bn_anon{self._bnode_n}"
        if kind == "STRING":
            self.eat()
            out = _unquote(val)
            if self.at("OP", "^^"):          # typed literal: lexical form
                self.eat()
                self.parse_term()
            elif self.at("OP", "@"):         # lang tag: lexical form
                self.eat()
                self.expect("NAME")
            return out
        if kind == "NUMBER":
            self.eat()
            return val
        if kind == "OP" and val == "-" and self.at("NUMBER", ahead=1):
            self.eat()
            return "-" + self.eat()[1]
        if kind == "KW" and val in ("TRUE", "FALSE") and as_object:
            self.eat()
            return val.lower()
        raise SparqlSyntaxError(f"expected an RDF term at offset {pos}, "
                                f"got {val!r}")

    # ---- RDF-star quoted triples ---------------------------------------
    def _parse_quoted_triple(self) -> str:
        """``<< s p o >>`` (SPARQL-star) in subject/object position.

        Ground quoted triples resolve AT PARSE TIME to the statement's
        content-addressed skolem IRI (operators.rdfstar.statement_id:
        ``urn:stmt:md5(s\\x01p\\x01o)``) — matching annotations written by
        rdfstar.annotate with no extra patterns. A quoted triple holding
        VARIABLES compiles to a fresh statement variable plus
        rdf:subject / rdf:predicate / rdf:object patterns, i.e. it
        queries the reified layer (rdfstar.reify) — documented
        requirement: variable quoted triples need the reification rows
        in the store."""
        self.expect("OP", "<")
        self.expect("OP", "<")
        qs = self.parse_term()
        if self.at("NAME", "a") or self.at("KW", "A"):
            self.eat()
            qp = RDF_TYPE
        else:
            qp = self.parse_term()
        qo = self.parse_term(as_object=True)
        self.expect("OP", ">")
        self.expect("OP", ">")
        if not any(t.startswith("?") for t in (qs, qp, qo)):
            import hashlib

            digest = hashlib.md5(
                "\x01".join((qs, qp, qo)).encode()).hexdigest()
            return "urn:stmt:" + digest
        self._qt_n += 1
        qv = f"?_qt{self._qt_n}"
        self._pending_quoted.append((qv, qs, qp, qo))
        return qv

    def _drain_quoted(self, patterns: list):
        rdf = DEFAULT_PREFIXES["rdf"]
        for qv, qs, qp, qo in self._pending_quoted:
            patterns.append((qv, rdf + "subject", qs))
            patterns.append((qv, rdf + "predicate", qp))
            patterns.append((qv, rdf + "object", qo))
        self._pending_quoted.clear()

    # ---- property paths ----------------------------------------------
    def parse_path(self):
        """Path in predicate position → str IRI or operators/paths AST."""
        out = self._path_seq()
        while self.at("OP", "|"):
            self.eat()
            nxt = self._path_seq()
            out = (("alt",) + out[1:] + (nxt,)
                   if isinstance(out, tuple) and out[0] == "alt"
                   else ("alt", out, nxt))
        return out

    def _path_seq(self):
        out = self._path_elt()
        while self.at("OP", "/"):
            self.eat()
            nxt = self._path_elt()
            out = (("seq",) + out[1:] + (nxt,)
                   if isinstance(out, tuple) and out[0] == "seq"
                   else ("seq", out, nxt))
        return out

    def _path_elt(self):
        inv = False
        if self.at("OP", "^"):
            self.eat()
            inv = True
        prim = self._path_primary()
        if self.at("OP") and self.peek()[1] in ("+", "*", "?"):
            prim = (self.eat()[1], prim)
        return ("inv", prim) if inv else prim

    def _path_primary(self):
        kind, val, pos = self.peek()
        if kind == "OP" and val == "!":
            self.eat()
            if self.at("OP", "("):
                self.eat()
                members = [self._path_iri()]
                while self.at("OP", "|"):
                    self.eat()
                    members.append(self._path_iri())
                self.expect("OP", ")")
                return ("nps",) + tuple(members)
            return ("nps", self._path_iri())
        if kind == "OP" and val == "(":
            self.eat()
            inner = self.parse_path()
            self.expect("OP", ")")
            return inner
        return self._path_iri()

    def _path_iri(self) -> str:
        if self.at("NAME", "a") or (self.at("KW") and self.peek()[1] == "A"):
            self.eat()
            return RDF_TYPE
        kind, val, pos = self.peek()
        if kind == "IRI":
            self.eat()
            return val[1:-1]
        if kind == "PNAME":
            self.eat()
            return self.expand_pname(val, pos)
        raise SparqlSyntaxError(f"expected a predicate IRI at offset {pos}, "
                                f"got {val!r}")

    # ---- triple blocks -------------------------------------------------
    def parse_triples_block(self, patterns: list):
        subj = self.parse_term()
        while True:
            if self.at("NAME", "a") or (self.at("KW", "A")):
                self.eat()
                verb = RDF_TYPE
            elif self.at("VAR"):
                verb = "?" + self.eat()[1][1:]
            else:
                verb = self.parse_path()
            obj = self.parse_term(as_object=True)
            patterns.append((subj, verb, obj))
            self._drain_quoted(patterns)
            while self.at("OP", ","):
                self.eat()
                patterns.append((subj, verb,
                                 self.parse_term(as_object=True)))
                self._drain_quoted(patterns)
            if self.at("OP", ";"):
                self.eat()
                while self.at("OP", ";"):
                    self.eat()
                if self._ends_block():           # trailing ';' is legal
                    break
                continue
            break

    def _ends_block(self) -> bool:
        return self.at("OP", "}") or self.at("OP", ".") or self.at("EOF")

    # ---- expressions → Spark SQL strings --------------------------------
    def parse_expr(self) -> str:
        return self._expr_or()

    def _expr_or(self) -> str:
        out = self._expr_and()
        while self.at("OP", "||"):
            self.eat()
            out = f"({out} OR {self._expr_and()})"
        return out

    def _expr_and(self) -> str:
        out = self._expr_rel()
        while self.at("OP", "&&"):
            self.eat()
            out = f"({out} AND {self._expr_rel()})"
        return out

    _REL_OPS = {"=": "=", "!=": "<>", "<": "<", ">": ">",
                "<=": "<=", ">=": ">="}

    def _expr_rel(self) -> str:
        left, l_var, l_num = self._expr_add_tagged()
        if self.at("OP") and self.peek()[1] in self._REL_OPS:
            op = self._REL_OPS[self.eat()[1]]
            right, r_var, r_num = self._expr_add_tagged()
            # SPARQL numeric comparison for the common case: a lone
            # variable against a bare numeric literal compares as DOUBLE
            if l_var and r_num:
                left = f"CAST({left} AS DOUBLE)"
            elif r_var and l_num:
                right = f"CAST({right} AS DOUBLE)"
            return f"({left} {op} {right})"
        if self.take_kw("IN"):
            return f"({left} IN {self._expr_list()})"
        if self.at("KW", "NOT") and self.at("KW", "IN", ahead=1):
            self.eat(), self.eat()
            return f"({left} NOT IN {self._expr_list()})"
        return left

    def _expr_list(self) -> str:
        self.expect("OP", "(")
        items = [self._expr_add()]
        while self.at("OP", ","):
            self.eat()
            items.append(self._expr_add())
        self.expect("OP", ")")
        return "(" + ", ".join(items) + ")"

    def _expr_add_tagged(self) -> tuple[str, bool, bool]:
        """(sql, is_lone_var, is_bare_number) for the numeric-cast rule."""
        start = self.i
        sql = self._expr_add()
        span = self.toks[start:self.i]
        lone_var = len(span) == 1 and span[0][0] == "VAR"
        bare_num = (len(span) == 1 and span[0][0] == "NUMBER") or (
            len(span) == 2 and span[0][1] == "-" and span[1][0] == "NUMBER")
        return sql, lone_var, bare_num

    def _expr_add(self) -> str:
        out = self._expr_mul()
        while self.at("OP") and self.peek()[1] in ("+", "-"):
            op = self.eat()[1]
            out = f"({out} {op} {self._expr_mul()})"
        return out

    def _expr_mul(self) -> str:
        out = self._expr_unary()
        while self.at("OP") and self.peek()[1] in ("*", "/"):
            op = self.eat()[1]
            out = f"({out} {op} {self._expr_unary()})"
        return out

    def _expr_unary(self) -> str:
        if self.at("OP", "!"):
            self.eat()
            return f"(NOT {self._expr_unary()})"
        if self.at("OP", "-"):
            self.eat()
            return f"(- {self._expr_unary()})"
        return self._expr_primary()

    def _expr_primary(self) -> str:
        kind, val, pos = self.peek()
        if kind == "OP" and val == "(":
            self.eat()
            out = self.parse_expr()
            self.expect("OP", ")")
            return out
        if kind == "VAR":
            self.eat()
            return val[1:]
        if kind == "NUMBER":
            self.eat()
            return val
        if kind == "STRING":
            self.eat()
            return _sql_quote(_unquote(val))
        if kind == "IRI":
            self.eat()
            return _sql_quote(val[1:-1])
        if kind == "KW" and val in ("TRUE", "FALSE"):
            self.eat()
            return val
        if kind == "PNAME":
            pfx, _, local = val.partition(":")
            if pfx == "xsd" and local in _XSD_CASTS and \
                    self.at("OP", "(", ahead=1):
                self.eat()
                self.eat()
                inner = self.parse_expr()
                self.expect("OP", ")")
                return f"CAST({inner} AS {_XSD_CASTS[local].upper()})"
            self.eat()
            return _sql_quote(self.expand_pname(val, pos))
        if kind == "NAME" or kind == "KW":
            return self._expr_funcall()
        raise SparqlSyntaxError(
            f"expected an expression at offset {pos}, got {val!r}")

    def _expr_funcall(self) -> str:
        kind, name, pos = self.eat()
        upper = name.upper()
        if upper == "BOUND":
            self.expect("OP", "(")
            var = self.expect("VAR")[1][1:]
            self.expect("OP", ")")
            return f"({var} IS NOT NULL)"
        if upper == "STR":
            self.expect("OP", "(")
            inner = self.parse_expr()
            self.expect("OP", ")")
            return f"CAST({inner} AS STRING)"
        if upper == "REGEX":
            self.expect("OP", "(")
            target = self.parse_expr()
            self.expect("OP", ",")
            pat = self.parse_expr()
            if self.at("OP", ","):              # flags: only 'i' supported
                self.eat()
                flags = self.parse_expr()
                if flags == "'i'" and pat.startswith("'"):
                    pat = "'(?i)" + pat[1:]
                elif flags != "'i'":
                    raise SparqlSyntaxError(
                        f"unsupported REGEX flags {flags} at offset {pos}")
            self.expect("OP", ")")
            return f"({target} RLIKE {pat})"
        if upper in _FN_SQL:
            self.expect("OP", "(")
            args = [self.parse_expr()]
            while self.at("OP", ","):
                self.eat()
                args.append(self.parse_expr())
            self.expect("OP", ")")
            return f"{_FN_SQL[upper]}({', '.join(args)})"
        raise SparqlSyntaxError(
            f"unsupported function {name!r} at offset {pos}")

    # ---- group graph pattern -------------------------------------------
    def parse_group(self) -> Group:
        self.expect("OP", "{")
        g = Group()
        while not self.at("OP", "}"):
            if self.take_kw("FILTER"):
                self._parse_filter(g)
            elif self.take_kw("OPTIONAL"):
                g.optional.append(self.parse_group())
            elif self.take_kw("MINUS"):
                g.minus.append(self.parse_group())
            elif self.take_kw("BIND"):
                self.expect("OP", "(")
                expr = self.parse_expr()
                self.expect("KW", "AS")
                var = self.expect("VAR")[1][1:]
                self.expect("OP", ")")
                g.binds.append((var, expr))
            elif self.take_kw("VALUES"):
                self._parse_values(g)
            elif self.take_kw("GRAPH"):
                gterm = self.parse_term()
                self.expect("OP", "{")
                pats: list = []
                while not self.at("OP", "}"):
                    self.parse_triples_block(pats)
                    if self.at("OP", "."):
                        self.eat()
                self.expect("OP", "}")
                g.graphs.append((gterm, pats))
            elif self.at("OP", "{"):
                first = (self._parse_subselect() if self._peek_subselect()
                         else self.parse_group())
                if self.at("KW", "UNION"):
                    if isinstance(first, Query):
                        raise SparqlSyntaxError("UNION branch cannot be a "
                                                "subquery")
                    branches = [first]
                    while self.take_kw("UNION"):
                        branches.append(self.parse_group())
                    g.union.append(branches)
                elif isinstance(first, Query):
                    g.subselects.append(first)
                else:
                    g.groups.append(first)
            else:
                self.parse_triples_block(g.patterns)
            if self.at("OP", "."):
                self.eat()
        self.expect("OP", "}")
        return g

    def _peek_subselect(self) -> bool:
        return self.at("OP", "{") and self.at("KW", "SELECT", ahead=1)

    def _parse_subselect(self) -> Query:
        self.expect("OP", "{")
        q = self._parse_query_body()
        self.expect("OP", "}")
        return q

    def _parse_filter(self, g: Group):
        if self.take_kw("EXISTS"):
            g.exists.append(self.parse_group())
            return
        if self.at("KW", "NOT") and self.at("KW", "EXISTS", ahead=1):
            self.eat(), self.eat()
            g.not_exists.append(self.parse_group())
            return
        g.filters.append(self.parse_expr())

    def _parse_values(self, g: Group):
        if self.at("VAR"):                       # VALUES ?v { a b c }
            var = self.eat()[1][1:]
            self.expect("OP", "{")
            vals = []
            while not self.at("OP", "}"):
                vals.append(self.parse_term(as_object=True))
            self.eat()
            g.values[var] = vals
            return
        self.expect("OP", "(")                   # VALUES (?a ?b) { (..) .. }
        names = []
        while self.at("VAR"):
            names.append(self.eat()[1][1:])
        self.expect("OP", ")")
        self.expect("OP", "{")
        cols: list[list] = [[] for _ in names]
        while self.at("OP", "("):
            self.eat()
            for col in cols:
                if self.at("KW", "UNDEF"):
                    # UNDEF means "matches anything" — an equi-join null
                    # would silently match NOTHING, so refuse loudly
                    raise SparqlSyntaxError("VALUES UNDEF is unsupported")
                col.append(self.parse_term(as_object=True))
            self.expect("OP", ")")
        self.expect("OP", "}")
        for name, col in zip(names, cols):
            g.values[name] = col

    # ---- query body -----------------------------------------------------
    def _parse_query_body(self) -> Query:
        q = Query()
        form = self.take_kw("SELECT", "ASK", "CONSTRUCT", "DESCRIBE")
        if form is None:
            raise SparqlSyntaxError("expected SELECT/ASK/CONSTRUCT/DESCRIBE")
        q.form = form.lower()
        if q.form == "select":
            if self.take_kw("DISTINCT"):
                q.distinct = True
            else:
                self.take_kw("REDUCED")          # bag is spec-legal
            if self.at("OP", "*"):
                self.eat()
                q.project = ["*"]
            else:
                while self.at("VAR") or self.at("OP", "("):
                    if self.at("VAR"):
                        q.project.append(self.eat()[1][1:])
                    else:
                        self._parse_projection_expr(q)
            if not q.project:
                raise SparqlSyntaxError("empty SELECT projection")
        elif q.form == "construct":
            self.expect("OP", "{")
            while not self.at("OP", "}"):
                self.parse_triples_block(q.template)
                if self.at("OP", "."):
                    self.eat()
            self.eat()
        elif q.form == "describe":
            q.describe_var = self.expect("VAR")[1][1:]
        while self.take_kw("FROM"):          # dataset clause (§13.2)
            target = (q.from_named if self.take_kw("NAMED")
                      else q.from_default)
            kind, val, pos = self.peek()
            if kind == "IRI":
                self.eat()
                target.append(val[1:-1])
            elif kind == "PNAME":
                self.eat()
                target.append(self.expand_pname(val, pos))
            else:
                raise SparqlSyntaxError(
                    f"FROM needs a graph IRI at offset {pos}")
        self.take_kw("WHERE")
        q.where = self.parse_group()
        if self.take_kw("GROUP"):
            self.expect("KW", "BY")
            while self.at("VAR"):
                q.group_by.append(self.eat()[1][1:])
            if not q.group_by:
                raise SparqlSyntaxError("GROUP BY needs variables")
        if self.take_kw("HAVING"):
            while self.at("OP", "("):
                self.eat()
                q.having.append(self._parse_having_expr(q))
                self.expect("OP", ")")
        if self.take_kw("ORDER"):
            self.expect("KW", "BY")
            while True:
                if self.take_kw("DESC"):
                    self.expect("OP", "(")
                    q.order_by.append("-" + self.expect("VAR")[1][1:])
                    self.expect("OP", ")")
                elif self.take_kw("ASC"):
                    self.expect("OP", "(")
                    q.order_by.append(self.expect("VAR")[1][1:])
                    self.expect("OP", ")")
                elif self.at("VAR"):
                    q.order_by.append(self.eat()[1][1:])
                else:
                    break
        # LIMIT and OFFSET accepted in either order, as in the REC
        for _ in range(2):
            if self.take_kw("LIMIT"):
                q.limit = int(self.expect("NUMBER")[1])
            elif self.take_kw("OFFSET"):
                q.offset = int(self.expect("NUMBER")[1])
        return q

    def _parse_projection_expr(self, q: Query):
        self.expect("OP", "(")
        if self.at("KW") and self.peek()[1] in _AGG_FNS:
            fn, var, extra = self._parse_aggregate()
            self.expect("KW", "AS")
            alias = self.expect("VAR")[1][1:]
            self.expect("OP", ")")
            q.aggregates[alias] = (fn, var, extra)
            q.project.append(alias)
        else:
            expr = self.parse_expr()
            self.expect("KW", "AS")
            alias = self.expect("VAR")[1][1:]
            self.expect("OP", ")")
            q.project.append((alias, expr))

    def _parse_aggregate(self) -> tuple[str, str, str | None]:
        fn = self.eat()[1]
        self.expect("OP", "(")
        distinct = bool(self.take_kw("DISTINCT"))
        cast = None
        if self.at("OP", "*"):
            self.eat()
            var = None
        else:
            if self.at("PNAME"):                 # xsd:double(?x) cast sugar
                pn, pos = self.peek()[1], self.peek()[2]
                pfx, _, local = pn.partition(":")
                if pfx != "xsd" or local not in _XSD_CASTS:
                    raise SparqlSyntaxError(
                        f"unsupported aggregate argument at offset {pos}")
                self.eat()
                self.expect("OP", "(")
                var = "?" + self.expect("VAR")[1][1:]
                self.expect("OP", ")")
                cast = _XSD_CASTS[local]
            else:
                var = "?" + self.expect("VAR")[1][1:]
        sep = None
        if self.at("OP", ";"):                   # GROUP_CONCAT separator
            self.eat()
            self.expect("KW", "SEPARATOR")
            self.expect("OP", "=")
            sep = _unquote(self.expect("STRING")[1])
        self.expect("OP", ")")
        if fn == "COUNT":
            if distinct:
                if var is None:
                    raise SparqlSyntaxError("COUNT(DISTINCT *) unsupported")
                return ("count_distinct", var, None)
            return ("count", var or "?*", None)
        if distinct:
            raise SparqlSyntaxError(f"DISTINCT {fn} unsupported")
        if var is None:
            raise SparqlSyntaxError(f"{fn}(*) is not SPARQL")
        if fn == "GROUP_CONCAT":
            return ("group_concat", var, sep or " ")
        if fn in ("SUM", "AVG") and cast is None:
            cast = "double"                      # SPARQL numeric semantics
        return (fn.lower(), var, cast)

    def _parse_having_expr(self, q: Query) -> str:
        """HAVING supports aggregate calls (hidden aliases) and plain
        expressions over output aliases / group variables."""
        if self.at("KW") and self.peek()[1] in _AGG_FNS:
            fn, var, extra = self._parse_aggregate()
            alias = f"_hv{len(q.aggregates)}"
            q.aggregates[alias] = (fn, var, extra)
            rest = ""
            while not self.at("OP", ")"):
                kind, val, _ = self.eat()
                rest += {"STRING": lambda v: _sql_quote(_unquote(v)),
                         "VAR": lambda v: v[1:]}.get(
                             kind, lambda v: v)(val) + " "
            return f"{alias} {rest.strip()}"
        return self.parse_expr()


# --------------------------------------------------------------------------
# public parse entry points
# --------------------------------------------------------------------------

def parse_query(text: str) -> Query:
    p = _Parser(text)
    p.parse_prologue()
    q = p._parse_query_body()
    p.expect("EOF")
    if p._pending_quoted:
        raise SparqlSyntaxError(
            "quoted triples with variables are only supported inside "
            "triple blocks")
    return q


def parse_update(text: str) -> list[dict]:
    """Parse a SPARQL 1.1 Update request into a list of operation dicts
    (kind + arguments), applied in order by :func:`sparql_update`."""
    p = _Parser(text)
    ops: list[dict] = []
    while True:
        p.parse_prologue()
        if p.at("EOF"):
            break
        ops.append(_parse_update_op(p))
        if p.at("OP", ";"):
            p.eat()
            continue
        p.expect("EOF")
        break
    if not ops:
        raise SparqlSyntaxError("empty update request")
    return ops


def _parse_ground_block(p: _Parser) -> tuple[str | None, list[tuple]]:
    """{ triples } or { GRAPH <g> { triples } } → (graph-or-None, rows)."""
    p.expect("OP", "{")
    graph = None
    if p.take_kw("GRAPH"):
        graph = p.parse_term()
        block = []
        p.expect("OP", "{")
        while not p.at("OP", "}"):
            p.parse_triples_block(block)
            if p.at("OP", "."):
                p.eat()
        p.eat()
    else:
        block = []
        while not p.at("OP", "}"):
            p.parse_triples_block(block)
            if p.at("OP", "."):
                p.eat()
    p.expect("OP", "}")
    for row in block:
        if any(t.startswith("?") for t in row):
            raise SparqlSyntaxError("DATA blocks must be ground (no "
                                    f"variables): {row}")
    return graph, block


def _parse_template(p: _Parser) -> list[tuple]:
    p.expect("OP", "{")
    out: list[tuple] = []
    while not p.at("OP", "}"):
        p.parse_triples_block(out)
        if p.at("OP", "."):
            p.eat()
    p.eat()
    return out


def _graph_ref(p: _Parser) -> str:
    p.take_kw("GRAPH")
    return p.parse_term()


def _parse_update_op(p: _Parser) -> dict:
    if p.take_kw("INSERT"):
        if p.take_kw("DATA"):
            graph, rows = _parse_ground_block(p)
            return {"kind": "insert_data", "graph": graph, "rows": rows}
        template = _parse_template(p)
        p.expect("KW", "WHERE")
        return {"kind": "modify", "delete": None, "insert": template,
                "where": p.parse_group()}
    if p.take_kw("DELETE"):
        if p.take_kw("DATA"):
            graph, rows = _parse_ground_block(p)
            return {"kind": "delete_data", "graph": graph, "rows": rows}
        if p.take_kw("WHERE"):                   # DELETE WHERE { .. }
            g = p.parse_group()
            if (g.filters or g.optional or g.union or g.minus or g.exists
                    or g.not_exists or g.binds or g.values or g.subselects
                    or g.groups or g.graphs):
                raise SparqlSyntaxError("DELETE WHERE takes plain triple "
                                        "patterns only")
            return {"kind": "modify", "delete": g.patterns, "insert": None,
                    "where": g}
        delete = _parse_template(p)
        insert = _parse_template(p) if p.take_kw("INSERT") else None
        p.expect("KW", "WHERE")
        return {"kind": "modify", "delete": delete, "insert": insert,
                "where": p.parse_group()}
    if p.take_kw("CLEAR") or p.take_kw("DROP"):
        p.take_kw("SILENT")
        return {"kind": "clear", "graph": _graph_ref(p)}
    for kw in ("ADD", "COPY", "MOVE"):
        if p.take_kw(kw):
            p.take_kw("SILENT")
            src = _graph_ref(p)
            p.expect("KW", "TO")
            return {"kind": kw.lower(), "src": src, "dst": _graph_ref(p)}
    k, v, pos = p.peek()
    raise SparqlSyntaxError(f"expected an update operation at offset {pos}, "
                            f"got {v!r}")


# --------------------------------------------------------------------------
# compiler: algebra → DataFrame via the operator layer
# --------------------------------------------------------------------------

def _join_shared(left: DataFrame, right: DataFrame, how: str = "inner",
                 what: str = "group") -> DataFrame:
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        if how == "inner":
            return left.crossJoin(right)     # SPARQL allows the product
        if what == "MINUS group":
            # §8.3.3: MINUS keeps μ when dom(μ)∩dom(μ') = ∅ — with no
            # shared variable every pair is domain-disjoint, so MINUS
            # removes NOTHING (the spec's infamous asymmetry vs NOT
            # EXISTS, which substitutes μ and so still filters)
            return left
        if how in ("left_semi", "left_anti"):
            # EXISTS / NOT EXISTS with no shared variable: the pattern's
            # solutions don't depend on μ, so keep all rows iff ANY
            # solution exists (semi) / NONE exists (anti). One broadcast
            # 0/1-row build side, condition always-true.
            probe = F.broadcast(right.limit(1).select(F.lit(1).alias("__e")))
            return left.join(probe, F.lit(True), how)
        if how == "left":
            # OPTIONAL with no shared variable = LeftJoin(Ω₁, Ω₂, true):
            # the product when the optional side is non-empty, μ₁ with
            # unbound (null) extension columns when it is empty —
            # exactly Spark's left join on an always-true condition
            return left.join(right, F.lit(True), "left")
        raise ValueError(f"{what} shares no variable with the group")
    if how in ("left_semi", "left_anti"):
        right = right.select(*shared).dropDuplicates(shared)
    return left.join(right, shared, how)


def compile_group(triples: DataFrame, g: Group,
                  stats: dict | None = None,
                  quads: DataFrame | None = None) -> DataFrame:
    """Group graph pattern → bindings DataFrame. Pattern conjunction
    (incl. paths) goes through bgp_query so every physical decision —
    pruned scans, equi-join chaining — stays in the operator layer;
    the other algebra forms join around it per the SPARQL evaluation
    order (joins, LeftJoin, VALUES/BIND, then FILTER). ``stats`` (the
    {predicate: (n, ds, do)} planner statistics, e.g. from a snapshot
    manifest) turns on the selectivity-greedy pattern ordering of
    bgp.order_patterns for every pattern conjunction in the tree."""
    from .operators.bgp import bgp_query, order_patterns
    from .operators.quads import quad_query

    out: DataFrame | None = None
    if g.patterns:
        pats = (order_patterns(g.patterns, stats) if stats is not None
                else g.patterns)
        out = bgp_query(triples, pats)
    qframe = triples if quads is None else quads
    for sub in g.groups:
        df = compile_group(triples, sub, stats, quads)
        out = df if out is None else _join_shared(out, df)
    for branches in g.union:
        parts = [compile_group(triples, b, stats, quads) for b in branches]
        udf = parts[0]
        for pdf in parts[1:]:
            udf = udf.unionByName(pdf, allowMissingColumns=True)
        out = udf if out is None else _join_shared(out, udf)
    for q in g.subselects:
        df = compile_query(triples, q, stats, quads)
        out = df if out is None else _join_shared(out, df)
    for gterm, pats in g.graphs:
        if "g" not in qframe.columns:
            raise ValueError("GRAPH pattern over a plain triple table — "
                             "pass a quad (g,s,p,o) DataFrame")
        df = quad_query(qframe, [(gterm,) + tuple(pat) for pat in pats])
        out = df if out is None else _join_shared(out, df)
    if out is None:
        raise ValueError("group binds no variables")
    for og in g.optional:
        out = _join_shared(out, compile_group(triples, og, stats, quads),
                           "left", "OPTIONAL group")
    if g.values:
        rows = list(zip(*g.values.values()))
        inline = triples.sparkSession.createDataFrame(rows, list(g.values))
        out = _join_shared(out, F.broadcast(inline), "inner")
    for var, expr in g.binds:
        if var in out.columns:
            raise ValueError(f"BIND target ?{var} is already bound")
        out = out.withColumn(var, F.expr(expr))
    for mg in g.minus:
        out = _join_shared(out, compile_group(triples, mg, stats, quads),
                           "left_anti", "MINUS group")
    for eg in g.exists:
        out = _join_shared(out, compile_group(triples, eg, stats, quads),
                           "left_semi", "EXISTS group")
    for ng in g.not_exists:
        out = _join_shared(out, compile_group(triples, ng, stats, quads),
                           "left_anti", "NOT EXISTS group")
    for cond in g.filters:
        out = out.filter(F.expr(cond))
    return out


def _group_is_plain(g: Group) -> bool:
    return bool(g.patterns) and not (
        g.filters or g.optional or g.union or g.minus or g.exists
        or g.not_exists or g.binds or g.values or g.subselects or g.groups
        or g.graphs)


def _agg_column(alias: str, spec: tuple) -> F.Column:
    fn, var, extra = spec
    col = None if var in (None, "?*") else F.col(var.lstrip("?"))
    if fn == "count":
        return (F.count(F.lit(1)) if col is None
                else F.count(col)).alias(alias)
    if fn == "count_distinct":
        return F.countDistinct(col).alias(alias)
    if fn == "group_concat":
        return F.array_join(F.sort_array(F.collect_list(col)),
                            extra).alias(alias)
    if fn == "sample":                           # derandomized, as bgp_agg
        return F.min(col).alias(alias)
    return getattr(F, fn)(col.cast(extra) if extra else col).alias(alias)


def compile_query(triples: DataFrame, q: Query,
                  stats: dict | None = None,
                  quads: DataFrame | None = None) -> DataFrame:
    """Parsed query → result DataFrame (SELECT/subquery shape)."""
    from .operators.bgp import bgp_agg

    if q.aggregates or q.group_by:
        # pure-pattern groups with pushdown-friendly aggregates route
        # through bgp_agg to keep the eager pre-aggregation rewrite
        simple = all(v[0] in ("count", "sum", "min", "max", "avg")
                     and v[1] not in (None, "?*")
                     for v in q.aggregates.values())
        if _group_is_plain(q.where) and simple and q.aggregates:
            out = bgp_agg(triples, q.where.patterns, q.group_by,
                          {a: (fn, var, cast) for a, (fn, var, cast)
                           in q.aggregates.items()})
        elif not q.aggregates:
            # GROUP BY with no aggregate: one row per group
            out = (compile_group(triples, q.where, stats, quads)
                   .select(*q.group_by).dropDuplicates())
        else:
            bindings = compile_group(triples, q.where, stats, quads)
            aggs = [_agg_column(a, spec) for a, spec in q.aggregates.items()]
            out = (bindings.groupBy(*q.group_by).agg(*aggs) if q.group_by
                   else bindings.agg(*aggs))
        for cond in q.having:
            out = out.filter(F.expr(cond))
        hidden = [a for a in q.aggregates if a.startswith("_hv")]
        if hidden:
            out = out.drop(*hidden)
    else:
        if q.having:
            raise ValueError("HAVING without aggregates")
        out = compile_group(triples, q.where, stats, quads)
    for item in q.project:
        if isinstance(item, tuple):
            alias, expr = item
            out = out.withColumn(alias, F.expr(expr))
    if q.project and q.project != ["*"]:
        names = [it[0] if isinstance(it, tuple) else it for it in q.project]
        out = out.select(*names)
    if q.distinct:
        out = out.dropDuplicates()
    if q.order_by:
        keys = [F.col(v[1:]).desc() if v.startswith("-") else F.col(v).asc()
                for v in q.order_by]
        out = out.orderBy(*keys)
    if q.offset:
        out = out.offset(q.offset)
    if q.limit is not None:
        out = out.limit(q.limit)
    return out


def sparql_query(triples: DataFrame, text: str,
                 stats: dict | None = None) -> DataFrame:
    """Run a SPARQL query string against a triple (s,p,o[,pred]) or quad
    (g,s,p,o) DataFrame; returns the result DataFrame (bindings for
    SELECT, one boolean ``ask`` row for ASK, (s,p,o) for CONSTRUCT /
    DESCRIBE). ``stats`` enables statistics-driven pattern ordering
    (see :func:`compile_group`).

    A dataset clause (``FROM`` / ``FROM NAMED``, §13.2) needs a quad
    frame: the default graph becomes the SET-semantics merge of the
    ``FROM`` graphs (empty when only ``FROM NAMED`` is given) and GRAPH
    patterns range over the ``FROM NAMED`` graphs only. Without a
    dataset clause a quad frame behaves as before: plain patterns see
    the union default graph, GRAPH sees every named graph."""
    q = parse_query(text)
    quads = None
    if q.from_default or q.from_named:
        if "g" not in triples.columns:
            raise ValueError("FROM / FROM NAMED needs a quad (g,s,p,o) "
                             "frame — the dataset clause selects graphs")

        def _in_graphs(names):
            return (triples.filter(F.col("g").isin(names)) if names
                    else triples.filter(F.lit(False)))

        quads = _in_graphs(q.from_named)
        plain = _in_graphs(q.from_default).select("s", "p", "o")
        if len(q.from_default) > 1:
            # graph MERGE is a set union: the same triple asserted in
            # two FROM graphs contributes one solution, not two
            plain = plain.dropDuplicates()
        triples = plain
    if q.form == "select":
        return compile_query(triples, q, stats, quads)
    if q.form == "ask":
        one = compile_group(triples, q.where, stats, quads).limit(1)
        return one.agg((F.count(F.lit(1)) > 0).alias("ask"))
    if q.form == "construct":
        from .operators.update import _instantiate
        bindings = compile_group(triples, q.where, stats, quads)
        return _instantiate(bindings, q.template)
    # DESCRIBE ?v — bgp_describe's two-semi-join decomposition, over the
    # general compiled group
    v = q.describe_var
    bindings = compile_group(triples, q.where, stats, quads)
    if v not in bindings.columns:
        raise ValueError(f"DESCRIBE variable ?{v} is not bound")
    nodes = F.broadcast(bindings.select(F.col(v).alias("_node"))
                        .dropDuplicates())
    spo = triples.select("s", "p", "o")
    s_hits = spo.join(nodes, spo["s"] == nodes["_node"], "left_semi")
    o_only = (spo.join(nodes, spo["o"] == nodes["_node"], "left_semi")
              .join(nodes, spo["s"] == nodes["_node"], "left_anti"))
    return s_hits.unionAll(o_only)


def sparql_update(frame: DataFrame, text: str) -> DataFrame:
    """Apply a SPARQL Update request to a triple or quad DataFrame and
    return the new graph (pure function, matching operators/update's
    snapshot discipline). Graph-management ops and GRAPH-scoped DATA
    need a quad frame; DELETE/INSERT WHERE runs on the default graph
    (plain triple frame)."""
    from .operators import quads as Q
    from .operators import update as U

    is_quads = "g" in frame.columns
    out = frame
    for op in parse_update(text):
        kind = op["kind"]
        if kind in ("insert_data", "delete_data"):
            graph, rows = op["graph"], op["rows"]
            if not rows:          # empty DATA block: a no-op, per spec
                continue
            if graph is not None:
                if not is_quads:
                    raise ValueError("GRAPH-scoped DATA needs a quad frame")
                gsp = [(graph, s, p, o) for s, p, o in rows]
                new = out.sparkSession.createDataFrame(gsp,
                                                       ["g", "s", "p", "o"])
                keys = ["g", "s", "p", "o"]
                if kind == "insert_data":
                    # update.insert_data's probe-side discipline: the
                    # graph is probed once by the broadcast request, and
                    # the dedup set-difference stays request-sized
                    hits = F.broadcast(out.join(F.broadcast(new),
                                                keys, "left_semi"))
                    out = out.unionByName(new.join(hits, keys, "left_anti"))
                else:
                    out = out.join(F.broadcast(new), keys, "left_anti")
            else:
                if is_quads:
                    raise ValueError("un-scoped DATA over a quad frame — "
                                     "wrap the block in GRAPH <g> { .. }")
                out = (U.insert_data(out, rows) if kind == "insert_data"
                       else U.delete_data(out, rows))
        elif kind == "modify":
            if is_quads:
                raise ValueError("DELETE/INSERT WHERE runs on the default "
                                 "graph — pass a triple frame")
            g = op["where"]
            if (g.optional and any(not _group_is_plain(og)
                                   for og in g.optional)) or (
                    g.union or g.minus or g.exists or g.not_exists
                    or g.binds or g.subselects or g.groups or g.graphs):
                raise ValueError("update WHERE supports patterns, FILTER, "
                                 "VALUES and plain OPTIONAL groups only")
            out = U.delete_insert(
                out, g.patterns, delete=op["delete"], insert=op["insert"],
                filters=g.filters or None, values=g.values or None,
                optional=[og.patterns for og in g.optional] or None)
        else:
            if not is_quads:
                raise ValueError(f"{kind.upper()} needs a quad frame")
            if kind == "clear":
                out = Q.clear_graph(out, op["graph"])
            else:
                out = getattr(Q, f"{kind}_graph")(out, op["src"], op["dst"])
    return out


# --------------------------------------------------------------------------
# result serialization (W3C SPARQL 1.1 Query Results JSON / CSV)
# --------------------------------------------------------------------------

def sparql_results_json(df: DataFrame, limit: int | None = 10_000) -> str:
    """Serialize a SELECT/ASK result DataFrame as a W3C SPARQL 1.1 Query
    Results JSON document. A results document is endpoint-response-sized
    by design, so this is a deliberate driver-side collect — ``limit``
    bounds it (None = unbounded, caller's risk); bulk exports belong in
    the distributed sinks (CSV below, N-Triples/N-Quads for graphs).

    The engine's value model is lexical strings, so term typing is the
    IRI-scheme heuristic ('uri' vs 'literal') — same rule as
    sinks.write_nquads' bare-frame path."""
    import json as _json

    if df.columns == ["ask"]:
        return _json.dumps({"head": {},
                            "boolean": bool(df.collect()[0].ask)})
    rows = (df.limit(limit) if limit is not None else df).collect()
    iri_re = re.compile(r"^[a-z][a-z0-9+.-]*://")

    def term(v):
        s = str(v)
        return {"type": "uri" if iri_re.match(s) else "literal", "value": s}

    bindings = [{k: term(v) for k, v in row.asDict().items()
                 if v is not None} for row in rows]
    return _json.dumps({"head": {"vars": df.columns},
                        "results": {"bindings": bindings}}, indent=1)


def write_results_csv(df: DataFrame, output_path: str,
                      mode: str = "overwrite",
                      partitions: int | None = None) -> None:
    """Distributed SPARQL 1.1 Query Results CSV export: header + one line
    per solution, unbound variables empty — a plain parallel text sink,
    the bulk-result path (results JSON is the endpoint-sized path)."""
    out = df if partitions is None else df.repartition(partitions)
    out.write.mode(mode).option("header", True).csv(output_path)
