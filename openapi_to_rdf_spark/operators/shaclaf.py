"""SHACL-AF rules: sh:TripleRule inference (W3C SHACL Advanced Features,
https://www.w3.org/TR/shacl-af/#TripleRule).

The validation side of shapes-as-rules is operators/shapes.py; this
module closes the FORWARD direction: shapes can also *infer* triples.
A rule node attached to a shape via ``sh:rule``:

    Shape  sh:targetClass C ;  sh:rule [
        a sh:TripleRule ;
        sh:subject   sh:this | <iri> ;
        sh:predicate <iri> ;
        sh:object    sh:this | <iri> | literal | [ sh:path <p> ] ;
    ] .

fires once per focus node (instance of C): ``sh:this`` substitutes the
focus node; a ``[sh:path p]`` object emits one triple per value of p at
the focus node. An optional ``sh:condition`` pointing at a shape with
``sh:property [sh:path cp ; sh:hasValue cv]`` restricts focus nodes to
those carrying that exact value (the common guard form; full recursive
condition shapes are validation's job, not the rule engine's).

Scale design: the rule table is harvested DRIVER-SIDE from the shapes
graph — ontology-sized by construction, exactly like entailment's OWL
chain-axiom harvest — then each rule compiles to one type-slice scan
(+ one predicate-slice equi-join for path objects / condition guards),
all keyed on the subject node id. Inferred output is deduplicated and
anti-joined against the existing graph so callers union exactly the NEW
facts (semi-naive friendly)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SH = "http://www.w3.org/ns/shacl#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SH_THIS = SH + "this"

_OUT_COLS = ["s", "p", "o_kind", "o", "o_datatype"]


def _po_map(shacl, pred):
    """subject -> first (o, o_kind, o_datatype) for one predicate, as a
    driver dict (the shapes graph is vocabulary-sized)."""
    rows = (shacl.filter(F.col("p") == pred)
            .select(F.regexp_replace("s", "^_:", "").alias("n"),
                    "o", "o_kind", "o_datatype").collect())
    return {r.n: (r.o, r.o_kind, r.o_datatype) for r in rows}


def triple_rules_from_shacl(shacl: DataFrame) -> list[dict]:
    """Harvest sh:TripleRule definitions from a SHACL triple table
    (extract.TRIPLES_SCHEMA columns). Driver-side: shapes graphs are
    ontology-sized. Returns one dict per (shape targetClass, rule)."""
    tcls = _po_map(shacl, SH + "targetClass")
    rule_link = (shacl.filter(F.col("p") == SH + "rule")
                 .select(F.regexp_replace("s", "^_:", "").alias("shape"),
                         F.col("o").alias("rule")).collect())
    typed = _po_map(shacl, RDF_TYPE)
    subj = _po_map(shacl, SH + "subject")
    pred = _po_map(shacl, SH + "predicate")
    obj = _po_map(shacl, SH + "object")
    path = _po_map(shacl, SH + "path")
    cond_link = _po_map(shacl, SH + "condition")
    prop_link = _po_map(shacl, SH + "property")
    has_value = _po_map(shacl, SH + "hasValue")

    rules = []
    for link in rule_link:
        shape, rnode = link.shape, link.rule
        if typed.get(rnode, (None,))[0] != SH + "TripleRule":
            continue
        if shape not in tcls or rnode not in pred:
            continue
        s_spec = subj.get(rnode, (SH_THIS, "iri", None))
        o_spec = obj.get(rnode)
        if o_spec is None:
            continue
        rule = {
            "target_class": tcls[shape][0],
            "subject": s_spec[0],                    # sh:this or IRI
            "predicate": pred[rnode][0],
            "cond_path": None, "cond_value": None,
        }
        if o_spec[1] == "bnode":                     # [ sh:path p ]
            p_of = path.get(o_spec[0])
            if p_of is None:
                continue
            rule.update(object_kind="path", object_path=p_of[0])
        elif o_spec[0] == SH_THIS and o_spec[1] == "iri":
            rule.update(object_kind="this")
        else:
            rule.update(object_kind="const", object_value=o_spec[0],
                        object_o_kind=o_spec[1], object_datatype=o_spec[2])
        cond = cond_link.get(shape)
        if cond is not None:
            pshape = prop_link.get(cond[0])
            if pshape is not None:
                cp = path.get(pshape[0])
                cv = has_value.get(pshape[0])
                if cp is not None and cv is not None:
                    rule["cond_path"], rule["cond_value"] = cp[0], cv[0]
        rules.append(rule)
    return rules


def infer_triple_rules(triples: DataFrame, shacl: DataFrame) -> DataFrame:
    """One forward pass of every sh:TripleRule over the data graph.
    Returns ONLY triples not already present (distinct), columns
    (s, p, o_kind, o, o_datatype).

    Plan per rule: rdf:type slice for focus nodes, optional
    condition-value semi-join, optional path-value equi-join — every
    join keyed on the focus/subject node."""
    rules = triple_rules_from_shacl(shacl)
    spark = triples.sparkSession
    empty = spark.createDataFrame(
        [], "s string, p string, o_kind string, o string, o_datatype string")
    if not rules:
        return empty

    typed = (triples.filter((F.col("p") == RDF_TYPE)
                            & (F.col("o_kind") == "iri"))
             .select(F.col("s").alias("focus"), F.col("o").alias("cls")))
    out = empty
    for r in rules:
        focus = (typed.filter(F.col("cls") == r["target_class"])
                 .select("focus").dropDuplicates())
        if r["cond_path"] is not None:
            guard = (triples.filter((F.col("p") == r["cond_path"])
                                    & (F.col("o") == r["cond_value"]))
                     .select(F.col("s").alias("focus")))
            focus = focus.join(guard, "focus", "left_semi")
        s_col = (F.col("focus") if r["subject"] == SH_THIS
                 else F.lit(r["subject"]))
        if r["object_kind"] == "path":
            vals = (triples.filter(F.col("p") == r["object_path"])
                    .select(F.col("s").alias("focus"),
                            "o", "o_kind", "o_datatype"))
            new = (focus.join(vals, "focus")
                   .select(s_col.alias("s"),
                           F.lit(r["predicate"]).alias("p"),
                           "o_kind", "o", "o_datatype"))
        else:
            if r["object_kind"] == "this":
                o, ok, dt = F.col("focus"), F.lit("iri"), F.lit(None)
            else:
                o = F.lit(r["object_value"])
                ok = F.lit(r["object_o_kind"])
                dt = F.lit(r["object_datatype"])
            new = focus.select(s_col.alias("s"),
                               F.lit(r["predicate"]).alias("p"),
                               ok.alias("o_kind"), o.alias("o"),
                               dt.cast("string").alias("o_datatype"))
        out = out.unionByName(new)

    existing = triples.select(*_OUT_COLS)
    cond = [out["s"] == existing["s"], out["p"] == existing["p"],
            out["o_kind"] == existing["o_kind"], out["o"] == existing["o"],
            out["o_datatype"].eqNullSafe(existing["o_datatype"])]
    return (out.dropDuplicates(_OUT_COLS)
            .join(existing, cond, "left_anti"))


def infer_fixpoint(triples: DataFrame, shacl: DataFrame,
                   max_rounds: int = 5) -> DataFrame:
    """Iterate infer_triple_rules until no new triples (rules can feed
    rules, e.g. an inferred rdf:type making new focus nodes). Rounds are
    bounded by rule-dependency depth; raises if the bound is hit with
    the frontier still live (loud, like owl_chain_entail)."""
    cur = triples
    for _ in range(max_rounds):
        new = infer_triple_rules(cur, shacl).localCheckpoint(eager=True)
        if new.isEmpty():
            return cur
        extra = [c for c in cur.columns if c not in _OUT_COLS]
        if extra:     # keep provenance columns on the original rows
            cur = cur.unionByName(
                new.select("*", *[F.lit(None).cast("string").alias(c)
                                  for c in extra]))
        else:
            cur = cur.select(*_OUT_COLS).unionByName(new)
        cur = cur.localCheckpoint(eager=True)
    if not infer_triple_rules(cur, shacl).isEmpty():
        raise RuntimeError(
            f"sh:TripleRule fixpoint not reached in {max_rounds} rounds")
    return cur
