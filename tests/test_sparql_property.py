"""Property-based tests for the SPARQL text front-end (sparql.py):
render random pattern lists / path ASTs / literals to SPARQL text, parse
back, and assert the algebra round-trips exactly. Pure parser level — no
SparkSession — so hypothesis can run many examples."""

import pathlib
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.sparql import parse_query  # noqa: E402

# ---- term strategies + renderers ------------------------------------------

var_names = st.text("abcxyz_", min_size=1, max_size=6).filter(
    lambda s: not s[0].isdigit())
iri_strs = st.builds(lambda a, b: f"http://ex.org/{a}#{b}",
                     st.text("abcdefgh", min_size=1, max_size=6),
                     st.text("pqrstuv0123", min_size=1, max_size=6))
literal_texts = st.text(
    st.characters(min_codepoint=32, max_codepoint=126), max_size=20)

subjects = st.one_of(st.builds(lambda v: "?" + v, var_names), iri_strs)
predicates = st.one_of(st.builds(lambda v: "?" + v, var_names), iri_strs)
objects = st.one_of(st.builds(lambda v: "?" + v, var_names), iri_strs,
                    literal_texts)


_VAR_SHAPE = __import__("re").compile(r"\?[A-Za-z_][A-Za-z0-9_]*\Z")


def render_term(t: str) -> str:
    # only VALID variable syntax renders raw: a literal_texts draw like
    # "?:" or "?" must be quoted (it is a literal, not a variable)
    if _VAR_SHAPE.match(t):
        return t
    if t.startswith("http://"):
        return f"<{t}>"
    esc = t.replace("\\", "\\\\").replace('"', '\\"')
    return f'"{esc}"'


patterns = st.lists(st.tuples(subjects, predicates, objects),
                    min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(patterns)
def test_pattern_roundtrip(pats):
    """Rendered triple patterns parse back to the exact tuple list —
    including literal escaping (quotes, backslashes) and var/IRI mix."""
    body = " . ".join(" ".join(render_term(t) for t in pat) for pat in pats)
    q = parse_query("SELECT * WHERE { " + body + " }")
    assert q.where.patterns == pats


# ---- property-path ASTs -----------------------------------------------------

def _paths(depth: int):
    if depth == 0:
        return iri_strs
    sub = _paths(depth - 1)
    return st.one_of(
        iri_strs,
        st.builds(lambda p: ("inv", p),
                  sub.filter(lambda p: not (isinstance(p, tuple)
                                            and p[0] == "inv"))),
        st.builds(lambda p, m: (m, p), sub, st.sampled_from("+*?")),
        # seq/alt are FLATTENED by the parser, so generate flat forms
        # whose direct children are not the same combinator
        st.builds(lambda ps: ("seq",) + tuple(ps),
                  st.lists(sub.filter(
                      lambda p: not (isinstance(p, tuple) and p[0] == "seq")),
                      min_size=2, max_size=3)),
        st.builds(lambda ps: ("alt",) + tuple(ps),
                  st.lists(sub.filter(
                      lambda p: not (isinstance(p, tuple) and p[0] == "alt")),
                      min_size=2, max_size=3)),
        st.builds(lambda ps: ("nps",) + tuple(ps),
                  st.lists(iri_strs, min_size=1, max_size=3)),
    )


def render_path(p, parent: str | None = None) -> str:
    if isinstance(p, str):
        return f"<{p}>"
    head = p[0]
    if head == "inv":
        return "^" + render_path(p[1], "inv")
    if head in ("+", "*", "?"):
        # the grammar binds a modifier to the PathPrimary: '^p+' is
        # ^(p+) and 'p++' is ill-formed, so inv/mod children need their
        # own parens under a modifier
        child = render_path(p[1], "mod")
        if isinstance(p[1], tuple) and p[1][0] in ("inv", "+", "*", "?"):
            child = f"({child})"
        return child + head
    if head == "nps":
        return "!(" + "|".join(f"<{m}>" for m in p[1:]) + ")"
    sep = "/" if head == "seq" else "|"
    body = sep.join(render_path(c, head) for c in p[1:])
    # parenthesize except when a seq/alt chain stands alone at the top:
    # inside ANY parent context the group needs its own parens
    return f"({body})" if parent is not None else body


@settings(max_examples=200, deadline=None)
@given(_paths(2))
def test_path_roundtrip(ast):
    """Rendered property paths parse back to the same operators/paths
    AST (modulo nothing: the generator emits the parser's flat form)."""
    q = parse_query("SELECT * WHERE { ?s " + render_path(ast) + " ?o }")
    got = q.where.patterns[0][1]
    assert got == ast


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(var_names, literal_texts), min_size=1,
                max_size=4))
def test_values_roundtrip(pairs):
    """Single-var VALUES blocks round-trip arbitrary printable literals."""
    vals = [t for _, t in pairs]
    # always render as quoted literals: a raw value starting with '?' or
    # an IRI scheme would be AMBIGUOUS in term position, and quoting is
    # how a SPARQL author states "this is a literal"
    block = " ".join(
        '"' + t.replace("\\", "\\\\").replace('"', '\\"') + '"'
        for t in vals)
    q = parse_query("SELECT ?v WHERE { ?v <http://p> ?o . "
                    "VALUES ?v { " + block + " } }")
    assert q.where.values == {"v": vals}
