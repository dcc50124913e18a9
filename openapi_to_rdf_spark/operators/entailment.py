"""RDFS entailment materialization (the ρdf fragment) over the triple
table: forward-chain subClassOf / subPropertyOf transitivity, type
inheritance, property inheritance, and domain / range typing, producing
the closed graph a SPARQL endpoint would answer over — the reasoning
layer the reference's emitted vocabulary (rdfs:Class, rdfs:domain/range,
converted from OpenAPI specs by convert/shacl.py) exists to feed.

Rules (minimal deductive ρdf system, Muñoz/Pérez/Gutierrez 2009):

  scm-sco   (A sco B), (B sco C)      → (A sco C)
  scm-spo   (p spo q), (q spo r)      → (p spo r)
  cax-sco   (x type A), (A sco B)     → (x type B)
  prp-spo1  (x p y),   (p spo q)      → (x q y)
  prp-dom   (p dom C), (x p y)        → (x type C)
  prp-rng   (p rng C), (x p y)        → (y type C)

Precondition (documented, standard for ρdf): the schema vocabulary is
not itself redefined — no subPropertyOf whose super is rdf:type /
rdfs:subClassOf / rdfs:subPropertyOf / rdfs:domain / rdfs:range. Under
it, the staged plan below reaches the full fixpoint in ONE pass over the
instance data: spo* first (new predicate triples), then dom/rng over
base+derived predicate triples (new type triples), then sco* lifting of
all type triples. No rule can fire again after its stage.

Scale design — why this isn't "iterate joins until fixpoint" over the
corpus:

- The SCHEMA side (sco/spo/dom/rng triples) is a vocabulary: thousands
  of rows even for huge ontologies, vs 10^12 instance triples. Both
  transitive closures run ONLY on the schema side — driver-side BFS by
  default since a broadcastable side fits on the driver by construction
  (``distributed=True`` for the semi-naive DataFrame fixpoint) — then
  every instance-side rule is a single BROADCAST join: the 100 TB side
  is scanned once per stage and never shuffled for the reasoning
  itself.
- Type lifting joins the (distinct-typed) instance rows against the
  broadcast sco closure — fan-out bounded by hierarchy depth, the
  textbook RDFS-materialization plan (WebPIE/Inferray schema-broadcast).
- The final ``dropDuplicates`` restores set semantics across asserted ∪
  derived (an entailed triple may also be asserted). That one shuffle is
  the materialization dedup the graph pipeline pays anyway; callers that
  keep branches separate can pass ``dedup=False`` and get the raw bag
  with a ``rule`` provenance column instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .paths import _closure_pairs

RDF_TYPE = "rdf:type"
SCO = "rdfs:subClassOf"
SPO = "rdfs:subPropertyOf"
DOM = "rdfs:domain"
RNG = "rdfs:range"

_SCHEMA_PREDS = (SCO, SPO, DOM, RNG)


def _pairs(schema: DataFrame, pred: str) -> DataFrame:
    return schema.filter(F.col("p") == pred).select("s", "o")


def _driver_closure(pairs: DataFrame) -> DataFrame:
    """Transitive closure of a SMALL pair set, computed on the driver
    (one collect, BFS per source) and shipped back as a DataFrame.

    This is the WebPIE schema trick taken to its conclusion: the
    schema is vocabulary-sized (≤10^5-ish edges even for huge
    ontologies) and is about to be BROADCAST anyway — so it must fit on
    the driver by construction, and closing it locally replaces ~3
    Spark jobs PER hierarchy level (the semi-naive loop's frontier
    join / anti-join / emptiness probe) with zero. Not a hot-path
    collect: the 10^12-triple instance side never goes near this.
    """
    from collections import defaultdict

    spark = pairs.sparkSession
    adj = defaultdict(set)
    for r in pairs.collect():
        adj[r.s].add(r.o)
    closed = []
    for src in list(adj):
        seen, stack = set(), list(adj[src])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        closed.extend((src, dst) for dst in seen)
    return spark.createDataFrame(closed, schema="s string, o string")


def schema_closures(schema: DataFrame, max_rounds: int = 32, *,
                    distributed: bool = False,
                    sco_pred: str = SCO, spo_pred: str = SPO
                    ) -> tuple[DataFrame, DataFrame]:
    """(sco_closure, spo_closure) as distinct ≥1-step (s, o) pairs.
    Driver-side BFS by default (see :func:`_driver_closure`);
    ``distributed=True`` switches to the semi-naive DataFrame fixpoint
    (paths._closure_pairs) for schemas too big to collect — at which
    point the broadcast strategy below needs rethinking anyway."""
    sco = _pairs(schema, sco_pred)
    spo = _pairs(schema, spo_pred)
    if not distributed:
        return _driver_closure(sco), _driver_closure(spo)
    empty = sco.limit(0)
    sco_c = empty if sco.isEmpty() else _closure_pairs(sco, max_rounds)
    spo_c = empty if spo.isEmpty() else _closure_pairs(spo, max_rounds)
    return sco_c, spo_c


def rdfs_entail(triples: DataFrame, *, type_pred: str = RDF_TYPE,
                sco: str = SCO, spo: str = SPO,
                dom: str = DOM, rng: str = RNG,
                max_rounds: int = 32, dedup: bool = True) -> DataFrame:
    """The RDFS-closed graph: asserted triples ∪ everything the six ρdf
    rules derive. Input/output schema: (s, p, o) strings; extra columns
    are dropped. With ``dedup=False`` returns the bag with a ``rule``
    column ('asserted' on input rows) instead of the distinct set.
    The five vocabulary predicates default to the compact ``rdf:``/
    ``rdfs:`` names the driver oracle uses; graphs holding FULL IRIs
    (e.g. the KG pipeline's) pass their own."""
    schema_preds = (sco, spo, dom, rng)
    t = triples.select("s", "p", "o")
    schema = t.filter(F.col("p").isin(*schema_preds))
    sco_c, spo_c = schema_closures(schema, max_rounds, sco_pred=sco, spo_pred=spo)
    sco_b = F.broadcast(sco_c.select(F.col("s").alias("sub"),
                                     F.col("o").alias("sup")))
    spo_b = F.broadcast(spo_c.select(F.col("s").alias("sub"),
                                     F.col("o").alias("sup")))
    dom_b = F.broadcast(_pairs(schema, dom)
                        .select(F.col("s").alias("pp"),
                                F.col("o").alias("cls")))
    rng_b = F.broadcast(_pairs(schema, rng)
                        .select(F.col("s").alias("pp"),
                                F.col("o").alias("cls")))

    inst = t.filter(~F.col("p").isin(*schema_preds))

    # prp-spo1: one broadcast join over the corpus scan.
    spo_derived = (inst.join(spo_b, inst["p"] == spo_b["sub"])
                   .select("s", F.col("sup").alias("p"), "o"))
    all_inst = inst.unionByName(spo_derived)

    # prp-dom / prp-rng over asserted + spo-derived predicate triples.
    dom_types = (all_inst.join(dom_b, all_inst["p"] == dom_b["pp"])
                 .select("s", F.lit(type_pred).alias("p"),
                         F.col("cls").alias("o")))
    rng_types = (all_inst.join(rng_b, all_inst["p"] == rng_b["pp"])
                 .select(F.col("o").alias("s"),
                         F.lit(type_pred).alias("p"),
                         F.col("cls").alias("o")))

    # cax-sco over every type triple (asserted, dom- and rng-derived).
    types = (inst.filter(F.col("p") == type_pred)
             .select("s", "p", "o")
             .unionByName(dom_types).unionByName(rng_types)
             .dropDuplicates(["s", "o"]))
    sco_types = (types.join(sco_b, types["o"] == sco_b["sub"])
                 .select("s", F.lit(type_pred).alias("p"),
                         F.col("sup").alias("o")))

    # scm-sco / scm-spo closures re-emitted as schema triples.
    sco_triples = sco_c.select("s", F.lit(sco).alias("p"), "o")
    spo_triples = spo_c.select("s", F.lit(spo).alias("p"), "o")

    branches = [
        (t, "asserted"),
        (spo_derived, "prp-spo1"),
        (dom_types, "prp-dom"),
        (rng_types, "prp-rng"),
        (sco_types, "cax-sco"),
        (sco_triples, "scm-sco"),
        (spo_triples, "scm-spo"),
    ]
    if not dedup:
        out = None
        for df, rule in branches:
            tagged = df.withColumn("rule", F.lit(rule))
            out = tagged if out is None else out.unionByName(tagged)
        return out
    out = None
    for df, _ in branches:
        out = df if out is None else out.unionByName(df)
    return out.dropDuplicates(["s", "p", "o"])


def entailed_only(triples: DataFrame, **kw) -> DataFrame:
    """Just the NEW triples — the closed graph minus what was asserted
    (the delta a materialized-view maintainer would write)."""
    closed = rdfs_entail(triples, **kw)
    return closed.join(triples.select("s", "p", "o").dropDuplicates(),
                       ["s", "p", "o"], "left_anti")


OWL_INV = "owl:inverseOf"
OWL_SYM = "owl:SymmetricProperty"
OWL_TRP = "owl:TransitiveProperty"


def _property_aliases(triples: DataFrame,
                      type_pred: str = RDF_TYPE) -> list[tuple]:
    """Driver-side closure of the property-ALIAS relation induced by
    ``owl:inverseOf`` and ``owl:SymmetricProperty`` declarations.

    An alias ``(p, q, flip)`` means every instance edge ``(x p y)``
    entails ``(y q x)`` when ``flip`` else ``(x q y)``. inverseOf
    contributes both directions with flip=True; a symmetric property
    contributes ``(p, p, True)``. Chained vocabularies compose (``p inv
    q`` ∧ ``q inv r`` ⇒ ``p`` aliases ``r`` un-flipped), so we BFS over
    (property, flip) states until fixpoint — on the driver, because the
    declaration set is vocabulary-sized by construction (same argument
    as :func:`_driver_closure`; the 10^12-row instance side never moves).

    Returns non-identity aliases as (src_prop, dst_prop, flip).
    """
    from collections import defaultdict

    adj = defaultdict(set)
    inv = (triples.filter(F.col("p") == OWL_INV)
           .select("s", "o").collect())
    for r in inv:
        adj[r.s].add((r.o, True))
        adj[r.o].add((r.s, True))
    sym = (triples.filter((F.col("p") == type_pred)
                          & (F.col("o") == OWL_SYM))
           .select("s").collect())
    for r in sym:
        adj[r.s].add((r.s, True))
    out = []
    for src in list(adj):
        seen: set = set()
        stack = [(q, f) for (q, f) in adj[src]]
        while stack:
            q, f = stack.pop()
            if (q, f) in seen:
                continue
            seen.add((q, f))
            stack.extend((r, f ^ g) for (r, g) in adj.get(q, ()))
        out.extend((src, q, f) for (q, f) in seen if (q, f) != (src, False))
    return out


def _keyed_closure(edges: DataFrame, max_rounds: int) -> DataFrame:
    """Distinct (p, s, o) connected by ≥1 step of same-predicate edges —
    the per-predicate transitive closure, all predicates in ONE semi-
    naive loop (round r joins only rows first derived in round r-1, so
    the frontier shrinks as paths saturate). Join key is (p, node):
    the closure reuses one hash-partitioning across rounds, and a hot
    (p, node) key is exactly the skew AQE's skew-join split handles;
    localCheckpoint per round truncates the growing lineage."""
    base = edges.dropDuplicates(["p", "s", "o"]).localCheckpoint()
    reached = base
    frontier = base
    for _ in range(max_rounds):
        nxt = (frontier.select("p", "s", F.col("o").alias("m"))
               .join(base.select("p", F.col("s").alias("m"), "o"),
                     ["p", "m"])
               .select("p", "s", "o")
               .dropDuplicates(["p", "s", "o"])
               .join(reached, ["p", "s", "o"], "left_anti")
               .localCheckpoint())
        if nxt.isEmpty():
            return reached
        # lazy union of checkpointed deltas (r4): materializing the full
        # cumulative closure each round copies O(|closure|) rows per round;
        # the union tree stays depth <= max_rounds with checkpointed leaves
        reached = reached.unionByName(nxt)
        frontier = nxt
    raise RuntimeError(
        f"transitive-property closure did not converge in {max_rounds} "
        "rounds — raise max_rounds (a transitive predicate has longer "
        "chains than expected)")


def owl_prp_entail(triples: DataFrame, *, type_pred: str = RDF_TYPE,
                   max_rounds: int = 32, dedup: bool = True) -> DataFrame:
    """OWL 2 RL property-semantics fragment over the triple table:
    prp-inv1/2 (``owl:inverseOf``), prp-symp (``owl:SymmetricProperty``)
    and prp-trp (``owl:TransitiveProperty``), complementing
    :func:`rdfs_entail`'s ρdf rules. Input/output schema: (s, p, o).

    Staged fixpoint (proved sufficient, no loop over the corpus):

    1. alias emission — ONE broadcast join applies the driver-closed
       alias map (see :func:`_property_aliases`) to every instance edge;
    2. transitive closure of declared-transitive predicates over
       asserted ∪ aliased edges (:func:`_keyed_closure`, the one
       genuinely iterative instance-side step);
    3. alias emission again over the closure rows only.

    Stage 3 cannot feed stage 2 again: the alias image of a predicate's
    closure is the closure of the alias image (mirror paths reverse),
    and stage 2 already closed over ALL aliased edges — asserting this
    equivalence is tests/test_entailment.py's job. prp-fp/ifp and the
    eq-* sameAs rules are deliberately out of scope here: pairwise rule
    firing would materialize quadratic identity cliques — sameAs is
    handled by smushing instead (:func:`sameas_smush`: salted CC +
    representative rewrite, the same machinery as the canonicalization
    pipeline).
    """
    t = triples.select("s", "p", "o")
    aliases = _property_aliases(t, type_pred)
    trp = [r.s for r in t.filter((F.col("p") == type_pred)
                                 & (F.col("o") == OWL_TRP))
           .select("s").collect()]

    inst = t.filter(F.col("p") != OWL_INV)
    if aliases:
        alias_b = F.broadcast(t.sparkSession.createDataFrame(
            aliases, schema="pp string, qq string, flip boolean"))

        def _apply_alias(df: DataFrame) -> DataFrame:
            return (df.join(alias_b, df["p"] == alias_b["pp"])
                    .select(F.when(F.col("flip"), F.col("o"))
                            .otherwise(F.col("s")).alias("s"),
                            F.col("qq").alias("p"),
                            F.when(F.col("flip"), F.col("s"))
                            .otherwise(F.col("o")).alias("o")))
        aliased = _apply_alias(inst)
    else:
        aliased = inst.limit(0)

    base = inst.unionByName(aliased)
    if trp:
        edges = base.filter(F.col("p").isin(*trp))
        trans = _keyed_closure(edges, max_rounds)
        trans_aliased = (_apply_alias(trans) if aliases
                         else trans.limit(0))
    else:
        trans = base.limit(0)
        trans_aliased = trans

    branches = [
        (t, "asserted"),
        (aliased, "prp-inv/prp-symp"),
        (trans, "prp-trp"),
        (trans_aliased, "prp-trp+alias"),
    ]
    if not dedup:
        out = None
        for df, rule in branches:
            tagged = df.withColumn("rule", F.lit(rule))
            out = tagged if out is None else out.unionByName(tagged)
        return out
    out = None
    for df, _ in branches:
        out = df if out is None else out.unionByName(df)
    return out.dropDuplicates(["s", "p", "o"])


def rdfs_entail_increment(new_triples: DataFrame, schema: DataFrame, *,
                          type_pred: str = RDF_TYPE,
                          max_rounds: int = 32) -> DataFrame:
    """Incremental maintenance: the closed triples derivable from a
    BATCH OF NEW instance triples under a FIXED schema — i.e. what to
    append to an already-materialized closure when the corpus grows.

    Correctness: every ρdf rule has at most ONE instance-side
    antecedent (the other antecedents are schema), so derivations from
    new instance rows never depend on old instance rows and
    ``closed(base ∪ new) = closed(base) ∪ increment(new)`` exactly —
    the reason incremental RDFS materialization is cheap while e.g.
    incremental OWL (multi-instance-antecedent rules) is not. The
    equivalence is asserted in tests/test_entailment.py.

    ``new_triples`` must therefore contain NO schema triples (sco / spo
    / dom / rng): a schema change invalidates previously-derived rows
    globally and requires :func:`rdfs_entail` over the full graph —
    detected here with a cheap isEmpty probe and refused loudly rather
    than silently under-deriving.

    Output may overlap the existing closure (set semantics restore it
    on append/compaction, same as the streaming graph path); callers
    needing the strict delta anti-join this output against the
    materialized table — on a bucketed (s,p,o) layout, so the 10^12-row
    side co-locates instead of reshuffling per batch.
    """
    leaked = new_triples.filter(F.col("p").isin(*_SCHEMA_PREDS))
    if not leaked.isEmpty():
        raise ValueError(
            "new_triples contain rdfs schema triples — incremental "
            "maintenance is only sound under a fixed schema; run "
            "rdfs_entail over the full graph instead")
    return rdfs_entail(
        schema.select("s", "p", "o").unionByName(
            new_triples.select("s", "p", "o")),
        type_pred=type_pred, max_rounds=max_rounds)


# --------------------------------------------------------------------------
# owl:sameAs smushing (eq-rep-s / eq-rep-o, the materialized form)
# --------------------------------------------------------------------------

OWL_SAME = "owl:sameAs"


def sameas_map(triples: DataFrame,
               sameas_pred: str = OWL_SAME,
               max_iter: int = 25) -> DataFrame:
    """``owl:sameAs`` equivalence classes → (node, canonical) map.

    The OWL 2 RL eq-* rules fire pairwise and would materialize the
    QUADRATIC sameAs clique closure (a 10k-member identity cluster is
    10^8 derived sameAs triples); every production triplestore instead
    *smushes* — picks one representative per equivalence class and
    rewrites. The class computation is exactly connected components over
    the sameAs edge set (symmetry and transitivity for free), so this
    reuses operators/components' salted, pointer-jumping CC: hot
    identity hubs are salt-split and chain-shaped clusters converge in
    O(log diameter) rounds. canonical = lexicographic min IRI of the
    class (deterministic, engine-portable)."""
    from .components import connected_components

    edges = (triples.filter(F.col("p") == sameas_pred)
             .filter(F.col("s") != F.col("o"))
             .select(F.col("s").alias("src"), F.col("o").alias("dst")))
    return (connected_components(edges, max_iter=max_iter)
            .select(F.col("node"), F.col("component").alias("canonical")))


def sameas_smush(triples: DataFrame,
                 sameas_pred: str = OWL_SAME,
                 max_iter: int = 25) -> DataFrame:
    """Rewrite the graph through the sameAs equivalence classes: every
    subject/object is replaced by its class representative and the
    sameAs edges themselves are dropped (the map is re-derivable via
    :func:`sameas_map` and belongs in a side table, not the fact graph
    — the reason stores keep "sameAs indexes" out of the triple pool).

    Input/output schema: (s, p, o) plus any extra columns, passed
    through. When an ``o_kind`` column is present, only iri-kind objects
    are rewritten (a literal that happens to equal a node IRI stays a
    literal); without it, objects rewrite unconditionally — callers
    with literal/IRI ambiguity should carry o_kind.

    Scale shape: the map is class-member-sized (≪ graph); both rewrites
    are left equi-joins against it (AQE broadcasts when small), and only
    rows the map actually touched pass through the set-semantics dedup —
    untouched rows bypass it, exactly the split-join-union discipline of
    canonicalize.remap_triples."""
    cols = triples.columns
    cmap = sameas_map(triples, sameas_pred, max_iter)
    return _rewrite_through(
        triples.filter(F.col('p') != sameas_pred), cmap)


OWL_IFP = "owl:InverseFunctionalProperty"
OWL_FP = "owl:FunctionalProperty"


def _declared(t: DataFrame, type_pred: str, *classes: str) -> dict[str, list]:
    """Predicates declared rdf:type of each class in ``classes`` —
    vocabulary-sized, ONE collect for all classes (the schema-broadcast
    discipline of :func:`rdfs_entail`; one graph scan, not one per
    class). Returns {class: [predicates]}."""
    rows = (t.filter((F.col("p") == type_pred) & F.col("o").isin(*classes))
            .select("s", "o").distinct().collect())
    out: dict[str, list] = {c: [] for c in classes}
    for r in rows:
        out[r.o].append(r.s)
    return out


def _rewrite_through(base: DataFrame, cmap: DataFrame) -> DataFrame:
    """Rewrite s / (iri-kind) o through a (node, canonical) map with the
    split-join-union discipline: only rows the map touched pay the
    set-semantics dedup (see :func:`sameas_smush` for the contract)."""
    cols = base.columns
    smap = cmap.select(F.col("node").alias("s"),
                       F.col("canonical").alias("_s_canon"))
    omap = cmap.select(F.col("node").alias("o"),
                       F.col("canonical").alias("_o_canon"))
    joined = base.join(smap, "s", "left").join(omap, "o", "left")
    o_ok = (F.col("o_kind") == "iri") if "o_kind" in cols else F.lit(True)
    new_s = F.coalesce("_s_canon", F.col("s"))
    new_o = F.when(o_ok, F.coalesce("_o_canon", F.col("o"))) \
        .otherwise(F.col("o"))
    touched = F.col("_s_canon").isNotNull() | \
        (o_ok & F.col("_o_canon").isNotNull())
    rewritten = (joined.filter(touched)
                 .select(*[new_s.alias("s") if c == "s"
                           else new_o.alias("o") if c == "o"
                           else F.col(c) for c in cols])
                 .dropDuplicates(cols))  # remap_triples' dedup discipline
    return joined.filter(~touched).select(*cols).unionByName(rewritten)


def ifp_sameas_edges(triples: DataFrame,
                     type_pred: str = RDF_TYPE,
                     ifp_class: str = OWL_IFP,
                     fp_class: str = OWL_FP) -> DataFrame:
    """prp-ifp / prp-fp as sameAs EDGE derivation: two subjects sharing a
    declared-inverse-functional (p, o) are the same individual; two
    objects sharing a declared-functional (s, p) likewise. Returns
    (src, dst) edges ready for the sameAs class computation.

    The OWL 2 RL rules fire PAIRWISE — a key value shared by k nodes
    yields k² sameAs conclusions. This emits the group-min STAR instead
    (every member links to its group's lexicographic-min node): k-1
    edges with the identical connected-components closure, computed as
    one aggregation plus one self-equi-join per side — linear in the
    data, no per-group quadratic blowup; hot key values are just large
    groups (AQE-splittable), never large join fanouts."""
    t = triples.select("s", "p", "o")
    decls = _declared(t, type_pred, ifp_class, fp_class)
    ifps, fps = decls[ifp_class], decls[fp_class]
    outs = []
    if ifps:
        keyed = t.filter(F.col("p").isin(ifps))
        anchors = keyed.groupBy("p", "o").agg(F.min("s").alias("dst"))
        outs.append(keyed.join(anchors, ["p", "o"])
                    .filter(F.col("s") != F.col("dst"))
                    .select(F.col("s").alias("src"), "dst"))
    if fps:
        keyed = t.filter(F.col("p").isin(fps))
        anchors = keyed.groupBy("s", "p").agg(F.min("o").alias("dst"))
        outs.append(keyed.join(anchors, ["s", "p"])
                    .filter(F.col("o") != F.col("dst"))
                    .select(F.col("o").alias("src"), "dst"))
    if not outs:
        return t.sparkSession.createDataFrame([], "src string, dst string")
    out = outs[0]
    for extra in outs[1:]:
        out = out.unionByName(extra)
    return out.dropDuplicates()


def ifp_smush(triples: DataFrame,
              type_pred: str = RDF_TYPE,
              sameas_pred: str = OWL_SAME,
              max_iter: int = 25) -> DataFrame:
    """The composed OWL identity fragment: derive sameAs edges from
    asserted owl:sameAs PLUS functional/inverse-functional key sharing,
    close them as ONE equivalence relation, and smush. A single CC run
    over the union edge set is both cheaper and more complete than
    alternating rule firing (a chain alternating asserted-sameAs and
    key-sharing hops still lands in one component). The declaration
    triples and sameAs edges are dropped from the output; other
    rdf:type rows pass through."""
    from .components import connected_components

    t = triples.select("s", "p", "o")
    asserted = (t.filter(F.col("p") == sameas_pred)
                .filter(F.col("s") != F.col("o"))
                .select(F.col("s").alias("src"), F.col("o").alias("dst")))
    edges = asserted.unionByName(ifp_sameas_edges(t, type_pred=type_pred))
    cmap = (connected_components(edges, max_iter=max_iter)
            .select("node", F.col("component").alias("canonical")))
    decl = (F.col("p") == type_pred) & F.col("o").isin(OWL_IFP, OWL_FP)
    base = triples.filter((F.col("p") != sameas_pred) & ~decl)
    return _rewrite_through(base, cmap)


OWL_HV = "owl:hasValue"
OWL_ONP = "owl:onProperty"
OWL_SVF = "owl:someValuesFrom"
OWL_INT = "owl:intersectionOf"
OWL_UNI = "owl:unionOf"
OWL_EQC = "owl:equivalentClass"
OWL_THING = "owl:Thing"


def owl_cls_entail(triples: DataFrame, *, type_pred: str = RDF_TYPE,
                   max_rounds: int = 8) -> DataFrame:
    """OWL 2 RL class-expression fragment over the triple table:

      cls-hv1   (x type R), (R hasValue v), (R onProperty p) → (x p v)
      cls-hv2   (x p v),    (R hasValue v), (R onProperty p) → (x type R)
      cls-svf2  (x p y),    (R svf owl:Thing), (R onProperty p) → (x type R)
      cls-int1  (x type C1..Cn), (C int (C1..Cn))            → (x type C)
      cls-int2  (x type C), (C int (C1..Cn))                 → (x type Ci)
      cls-uni   (x type Ci), (C uni (..Ci..))                → (x type C)
      cax-eqc1/2 (x type A), (A eqc B)                       → (x type B)

    completing :func:`rdfs_entail` (ρdf) and :func:`owl_prp_entail`
    (property semantics). Returns the DISTINCT closure (s, p, o).

    Scale design — the same WebPIE asymmetry as the other entailment
    stages: every schema structure (restriction maps, intersection /
    union member tables harvested from rdf lists via
    operators.rdflists.list_members, the driver-closed equivalentClass
    relation) is vocabulary-sized and broadcast; per round the instance
    side sees only broadcast hash joins plus ONE aggregation (cls-int1's
    member count, semi-join-pruned to subjects that touch any
    intersection member). Rules interact (hv2 types feed cls-uni; hv1
    edges feed cls-svf2), so the loop is semi-naive over the TYPE/EDGE
    deltas — frontier-only joins, cumulative anti-join, localCheckpoint
    per round; real vocabularies converge in 2-3 rounds, and
    non-convergence within ``max_rounds`` raises loudly rather than
    returning a silently-partial closure.
    """
    from .rdflists import RDF_FIRST as LIST_FIRST
    from .rdflists import RDF_REST as LIST_REST
    from .rdflists import list_members

    # materialize the deduped input ONCE (r5 profile: every schema harvest
    # below — onp/hv/svf, the list walk, eqc closure, type/prop seeds —
    # re-ran the caller's full input lineage, ~5s of the fixture's wall
    # before the loop even started); all of them now read checkpoint blocks
    t = triples.select("s", "p", "o").dropDuplicates().localCheckpoint()
    spark = t.sparkSession

    onp = (t.filter(F.col("p") == OWL_ONP)
           .select(F.col("s").alias("r"), F.col("o").alias("prop")))
    hv = (t.filter(F.col("p") == OWL_HV)
          .select(F.col("s").alias("r"), F.col("o").alias("v"))
          .join(onp, "r"))
    svf = (t.filter((F.col("p") == OWL_SVF) & (F.col("o") == OWL_THING))
           .select(F.col("s").alias("r")).join(onp, "r"))

    # list_members expects the wide store schema; synthesize o_kind (and
    # datatype) for bare (s, p, o) frames — class-list members are terms,
    # bnode-ness recoverable from the "_:" convention
    wide = triples if "o_kind" in triples.columns else t.withColumn(
        "o_kind", F.when(F.col("o").startswith("_:"), "bnode")
        .otherwise("iri"))
    if "o_datatype" not in wide.columns:
        wide = wide.withColumn("o_datatype", F.lit(None).cast("string"))
    # list_members touches only rdf:first/rest rows — pre-filtering keeps
    # its pointer-doubling walk off the instance-sized frame entirely
    members = list_members(
        wide.filter(F.col("p").isin(LIST_FIRST, LIST_REST)))

    def _list_classes(pred, out):
        heads = (t.filter(F.col("p") == pred)
                 .select(F.col("s").alias(out), F.col("o").alias("head")))
        return (heads.join(members.select("head",
                                          F.col("member").alias("mem")),
                           "head")
                .select(out, "mem"))

    int_mem = _list_classes(OWL_INT, "ic").localCheckpoint()
    int_n = int_mem.groupBy("ic").agg(F.countDistinct("mem").alias("n"))
    uni_mem = _list_classes(OWL_UNI, "uc")

    eqc = t.filter(F.col("p") == OWL_EQC)
    eq_pairs = _driver_closure(
        eqc.select("s", "o").unionAll(
            eqc.select(F.col("o").alias("s"), F.col("s").alias("o"))))

    b = F.broadcast
    schema_preds = [OWL_HV, OWL_ONP, OWL_SVF, OWL_INT, OWL_UNI, OWL_EQC]

    types = (t.filter(F.col("p") == type_pred)
             .select(F.col("s").alias("x"), F.col("o").alias("c"))
             .dropDuplicates().localCheckpoint())
    props = (t.filter((F.col("p") != type_pred)
                      & ~F.col("p").isin(schema_preds))
             .select("s", "p", "o").dropDuplicates().localCheckpoint())

    new_t, new_p = types, props
    for _ in range(max_rounds):
        cand_t = (
            # cls-uni
            new_t.join(b(uni_mem), new_t["c"] == uni_mem["mem"])
            .select("x", F.col("uc").alias("c"))
            # cls-int2
            .unionAll(new_t.join(b(int_mem), new_t["c"] == int_mem["ic"])
                      .select("x", F.col("mem").alias("c")))
            # cax-eqc
            .unionAll(new_t.join(b(eq_pairs), new_t["c"] == eq_pairs["s"])
                      .select("x", eq_pairs["o"].alias("c")))
            # cls-hv2
            .unionAll(new_p.join(b(hv), (new_p["p"] == hv["prop"])
                                 & (new_p["o"] == hv["v"]))
                      .select(F.col("s").alias("x"),
                              F.col("r").alias("c")))
            # cls-svf2 (someValuesFrom owl:Thing)
            .unionAll(new_p.join(b(svf), new_p["p"] == svf["prop"])
                      .select(F.col("s").alias("x"),
                              F.col("r").alias("c")))
            # cls-int1 over the CUMULATIVE type set, pruned to subjects
            # the FRONTIER touched (r5 profile: this recount was ~2.8s of
            # every round). Round one's frontier IS the seed set, so every
            # base case is counted; afterwards a subject's member count
            # can only change by gaining a member type in the delta —
            # recount exactly those subjects
            .unionAll(types.join(b(int_mem),
                                 types["c"] == int_mem["mem"])
                      .join(new_t.join(b(int_mem),
                                       new_t["c"] == int_mem["mem"])
                            .select("x").dropDuplicates(),
                            "x", "left_semi")
                      .groupBy("x", "ic")
                      .agg(F.countDistinct("mem").alias("k"))
                      .join(b(int_n), "ic")
                      .filter(F.col("k") == F.col("n"))
                      .select("x", F.col("ic").alias("c"))))
        delta_t = (cand_t.dropDuplicates()
                   .join(types, ["x", "c"], "left_anti").localCheckpoint())
        # cls-hv1: new type rows emit property edges
        cand_p = (new_t.join(b(hv), new_t["c"] == hv["r"])
                  .select(F.col("x").alias("s"),
                          F.col("prop").alias("p"),
                          F.col("v").alias("o")))
        delta_p = (cand_p.dropDuplicates()
                   .join(props, ["s", "p", "o"], "left_anti")
                   .localCheckpoint())
        if delta_t.isEmpty() and delta_p.isEmpty():
            break
        # cumulative sets grow as LAZY unions of already-checkpointed
        # deltas (r4): re-materializing the full instance-sized sets every
        # round copied ~|types|+|props| rows per round for nothing — the
        # union tree stays flat (depth <= max_rounds) and every leaf is a
        # checkpoint, so downstream joins re-read blocks, not lineage
        types = types.unionByName(delta_t)
        props = props.unionByName(delta_p)
        new_t, new_p = delta_t, delta_p
    else:
        raise RuntimeError(
            f"owl_cls_entail did not converge in {max_rounds} rounds — "
            "raise max_rounds (deep class-expression chains)")

    derived_types = types.select(
        F.col("x").alias("s"), F.lit(type_pred).alias("p"),
        F.col("c").alias("o"))
    return (t.unionByName(derived_types)
            .unionByName(props.select("s", "p", "o"))
            .dropDuplicates())


OWL_CHAIN = "owl:propertyChainAxiom"
RDF_FIRST = "rdf:first"
RDF_REST = "rdf:rest"
RDF_NIL = "rdf:nil"


def _harvest_axiom_lists(triples: DataFrame, axiom_pred: str,
                         first_pred: str = RDF_FIRST,
                         rest_pred: str = RDF_REST,
                         nil_iri: str = RDF_NIL,
                         ) -> tuple[dict[str, list[str]], set]:
    """Driver-side harvest of ``s <axiom_pred> (m1 .. mn)`` declarations:
    the axiom heads plus their rdf:first/rest cons cells are
    vocabulary-sized by construction (they live in the ontology, not the
    instance data), so one small collect beats a distributed list walk —
    the same argument as :func:`_driver_closure`. Returns ({subject:
    members}, {cons-cell ids consumed}) — the cell set lets callers drop
    exactly the axiom's list plumbing without touching unrelated lists."""
    heads = (triples.filter(F.col("p") == axiom_pred)
             .select("s", "o").collect())
    cells = (triples.filter(F.col("p").isin(first_pred, rest_pred))
             .select("s", "p", "o").collect())
    first = {r.s: r.o for r in cells if r.p == first_pred}
    rest = {r.s: r.o for r in cells if r.p == rest_pred}
    out: dict[str, list[str]] = {}
    used: set = set()
    for h in heads:
        members, cell, seen = [], h.o, set()
        while cell != nil_iri and cell in first and cell not in seen:
            seen.add(cell)
            members.append(first[cell])
            cell = rest.get(cell, nil_iri)
        if members:
            out[h.s] = members
            used |= seen
    return out, used


def _chain_axioms(triples: DataFrame,
                  first_pred: str = RDF_FIRST,
                  rest_pred: str = RDF_REST,
                  nil_iri: str = RDF_NIL) -> dict[str, list[str]]:
    """``p owl:propertyChainAxiom (p1 .. pn)`` declarations, driver-side
    (see :func:`_harvest_axiom_lists`)."""
    chains, _ = _harvest_axiom_lists(triples, OWL_CHAIN, first_pred,
                                     rest_pred, nil_iri)
    # length-1 chains are rdfs:subPropertyOf's job
    return {p: hops for p, hops in chains.items() if len(hops) >= 2}


def owl_chain_entail(triples: DataFrame, *,
                     chains: dict[str, list[str]] | None = None,
                     max_rounds: int = 8, dedup: bool = True) -> DataFrame:
    """OWL 2 RL prp-spo2 — property chains:

      (u0 p1 u1), (u1 p2 u2), .., (u_{n-1} pn un), p chain (p1..pn)
                                                   → (u0 p un)

    ``chains`` maps each derived predicate to its hop list; when omitted
    the axioms are harvested from the graph itself
    (``owl:propertyChainAxiom`` + rdf:first/rest lists,
    :func:`_chain_axioms`). Input/output schema: (s, p, o).

    Scale design: composing one n-hop chain is n-1 EQUI-joins, each
    keyed on the single join node — the predicate-filtered hop inputs
    are narrow (two columns), every shuffle key is a node id (the same
    keys canonicalization already shuffles on), and hot join nodes are
    AQE skew-split territory. Derived volume is bounded by path counts,
    not corpus size. Chains can feed other chains (a derived predicate
    may be another chain's hop), so the outer loop is semi-naive: each
    round recomposes only chains whose hop predicates GAINED rows last
    round, anti-joins against everything already reached, and stops when
    a round derives nothing. Real vocabularies converge in one round
    (chain outputs rarely feed other chains); non-convergence within
    ``max_rounds`` raises loudly."""
    t = triples.select("s", "p", "o")
    if chains is None:
        chains = _chain_axioms(t)
    if not chains:
        return t.dropDuplicates() if dedup else t.withColumn(
            "rule", F.lit("asserted"))

    def _compose(graph: DataFrame, target: str,
                 hops: list[str]) -> DataFrame:
        cur = (graph.filter(F.col("p") == hops[0])
               .select("s", F.col("o").alias("n")))
        for q in hops[1:]:
            nxt = (graph.filter(F.col("p") == q)
                   .select(F.col("s").alias("n"), F.col("o").alias("n2")))
            cur = cur.join(nxt, "n").select("s", F.col("n2").alias("n"))
        return cur.select("s", F.lit(target).alias("p"),
                          F.col("n").alias("o")).dropDuplicates()

    hop_preds = sorted({q for hops in chains.values() for q in hops})
    # only hop-predicate rows ever participate — one narrow filter up
    # front so each round's recompose scans the small slice, not the
    # corpus (the 10^12-row store is touched exactly once here)
    graph = (t.filter(F.col("p").isin(hop_preds))
             .dropDuplicates().localCheckpoint())
    reached = graph
    derived_all: DataFrame | None = None
    touched = set(hop_preds)  # predicates that gained rows last round
    for _ in range(max_rounds):
        delta = None
        for target, hops in chains.items():
            if not touched.intersection(hops):
                continue
            d = _compose(reached, target, hops)
            delta = d if delta is None else delta.unionByName(d)
        if delta is None:
            break
        delta = (delta.dropDuplicates()
                 .join(reached, ["s", "p", "o"], "left_anti")
                 .localCheckpoint())
        if delta.isEmpty():
            break
        derived_all = (delta if derived_all is None
                       else derived_all.unionByName(delta))
        # a derived predicate only matters further if it's some chain's hop
        touched = ({r.p for r in delta.select("p").distinct().collect()}
                   & set(hop_preds))
        reached = reached.unionByName(delta)  # lazy union (leaves ckpt'd)
        if not touched:
            break
    else:
        raise RuntimeError(
            f"owl_chain_entail did not converge in {max_rounds} rounds — "
            "raise max_rounds (chains feeding chains deeper than expected)")

    if derived_all is None:
        derived_all = t.limit(0)
    if not dedup:
        return (t.withColumn("rule", F.lit("asserted"))
                .unionByName(derived_all.withColumn(
                    "rule", F.lit("prp-spo2"))))
    return t.unionByName(derived_all).dropDuplicates(["s", "p", "o"])


OWL_DW = "owl:disjointWith"
OWL_DIFF = "owl:differentFrom"
OWL_ADC = "owl:AllDisjointClasses"
OWL_ADIFF = "owl:AllDifferent"
OWL_MEMBERS = "owl:members"
OWL_DISTINCT = "owl:distinctMembers"
OWL_IRP = "owl:IrreflexiveProperty"
OWL_ASYP = "owl:AsymmetricProperty"
OWL_PDW = "owl:propertyDisjointWith"


def owl_consistency(triples: DataFrame, *,
                    type_pred: str = RDF_TYPE) -> DataFrame:
    """OWL 2 RL consistency checks — the ``false``-conclusion rules, the
    reasoner-side complement of SHACL validation (they fire on asserted
    contradictions rather than missing structure):

      eq-diff1  (x sameAs y), (x differentFrom y)            → false
      eq-diff2/3 (z AllDifferent members (..x..y..)), (x sameAs y) → false
      cax-dw    (C1 disjointWith C2), (x type C1), (x type C2) → false
      cax-adc   (z AllDisjointClasses members (..Ci..Cj..)),
                (x type Ci), (x type Cj)                      → false
      prp-irp   (p type IrreflexiveProperty), (x p x)        → false
      prp-asyp  (p type AsymmetricProperty), (x p y), (y p x) → false
      prp-pdw   (p1 propertyDisjointWith p2), (x p1 y), (x p2 y) → false

    Returns a report (rule, s, p, o, detail), one row per contradiction —
    run it before canonicalization merges identities a human should audit.
    The n-ary axioms (owl:AllDisjointClasses / owl:AllDifferent with
    owl:members / owl:distinctMembers lists) are harvested driver-side
    (ontology-sized by construction) and expanded into the SAME pairwise
    tables the binary rules use — member lists are small, so the n²
    expansion is a vocabulary cost, never an instance cost. eq-diff2/3
    reports carry p = owl:differentFrom (the implied assertion).

    Scale design: every schema side (disjointWith / propertyDisjointWith
    pairs, irreflexive / asymmetric declarations) is vocabulary-sized and
    broadcast; instance work is one equi-join per rule on keys the engine
    already shuffles on (subject for cax-dw, (p, s, o) for prp-asyp,
    (s, o) for prp-pdw restricted to the declared predicate slice).
    sameAs / differentFrom edge sets are identity assertions — orders of
    magnitude smaller than the corpus."""
    # materialize the input ONCE (r5, the owl_cls_entail lesson): the
    # driver-side axiom harvests below plus one equi-join per rule each
    # re-ran the caller's full lineage otherwise — ~10 evaluations of an
    # arbitrarily expensive upstream plan for one report
    t = triples.select("s", "p", "o").localCheckpoint()
    b = F.broadcast
    spark = t.sparkSession

    def rep(df, rule, detail):
        rule_c = F.lit(rule) if isinstance(rule, str) else rule
        return df.select(rule_c.alias("rule"), "s", "p", "o",
                         detail.alias("detail"))

    reports = []

    # n-ary axiom expansion (driver-side, ontology-sized): member lists
    # of typed owl:AllDisjointClasses / owl:AllDifferent nodes become
    # pairwise rows merged into the binary rules' broadcast tables
    nary = _declared(t, type_pred, OWL_ADC, OWL_ADIFF)
    members, _ = _harvest_axiom_lists(t, OWL_MEMBERS)
    distinct_m, _ = _harvest_axiom_lists(t, OWL_DISTINCT)

    def _pairwise(axiom_nodes, pools):
        pairs = []
        for z in axiom_nodes:
            for pool in pools:
                ms = pool.get(z, [])
                pairs += [(a, c) for i, a in enumerate(ms)
                          for c in ms[i + 1:]]
        return pairs

    adc_pairs = _pairwise(nary[OWL_ADC], [members])
    adiff_pairs = _pairwise(nary[OWL_ADIFF], [members, distinct_m])

    # eq-diff1 — catch both orientations of either assertion;
    # eq-diff2/3 — AllDifferent member pairs run through the same join,
    # reported with the implied owl:differentFrom assertion
    same = (t.filter(F.col("p") == OWL_SAME).select("s", "o"))
    same_sym = same.unionAll(
        same.select(F.col("o").alias("s"), F.col("s").alias("o")))
    diff = (t.filter(F.col("p") == OWL_DIFF)
            .select("s", F.lit(OWL_DIFF).alias("p"), "o")
            .withColumn("rule", F.lit("eq-diff1")))
    if adiff_pairs:
        diff = diff.unionByName(spark.createDataFrame(
            [(a, OWL_DIFF, c, "eq-diff2") for a, c in adiff_pairs],
            ["s", "p", "o", "rule"]))
    # either orientation of the pair may carry the sameAs assertion
    diff_hits = (diff.join(same_sym.dropDuplicates(), ["s", "o"],
                           "left_semi"))
    reports.append(rep(
        diff_hits, F.col("rule"),
        F.concat(F.lit("also owl:sameAs "), F.col("o"))))

    # cax-dw (+ cax-adc via the same pairwise table)
    dw = (t.filter(F.col("p") == OWL_DW)
          .select(F.col("s").alias("c1"), F.col("o").alias("c2"))
          .withColumn("rule", F.lit("cax-dw")))
    if adc_pairs:
        dw = dw.unionByName(spark.createDataFrame(
            [(a, c, "cax-adc") for a, c in adc_pairs],
            ["c1", "c2", "rule"]))
    dw = dw.dropDuplicates(["c1", "c2", "rule"])
    types = (t.filter(F.col("p") == type_pred)
             .select(F.col("s").alias("x"), F.col("o").alias("c"))
             .dropDuplicates())
    both = (types.join(b(dw), types["c"] == dw["c1"])
            .select("x", "c1", "c2", "rule")
            .join(types.withColumnRenamed("c", "c2"), ["x", "c2"],
                  "left_semi"))
    reports.append(rep(
        both.select(F.col("x").alias("s"),
                    F.lit(type_pred).alias("p"),
                    F.col("c1").alias("o"), "c2", "rule"),
        F.col("rule"), F.concat(F.lit("also typed disjoint class "),
                                F.col("c2"))))

    # prp-irp / prp-asyp: declared property sets (vocabulary-sized)
    decl = _declared(t, type_pred, OWL_IRP, OWL_ASYP)
    irp, asyp = decl[OWL_IRP], decl[OWL_ASYP]
    if irp:
        reports.append(rep(
            t.filter(F.col("p").isin(irp) & (F.col("s") == F.col("o"))),
            "prp-irp", F.lit("self-edge on an irreflexive property")))
    if asyp:
        e = t.filter(F.col("p").isin(asyp)).dropDuplicates()
        rev = e.select("p", F.col("o").alias("s"), F.col("s").alias("o"))
        reports.append(rep(
            e.join(rev, ["p", "s", "o"], "left_semi"),
            "prp-asyp", F.lit("reverse edge also asserted on an "
                              "asymmetric property")))

    # prp-pdw
    pdw = (t.filter(F.col("p") == OWL_PDW)
           .select(F.col("s").alias("p1"), F.col("o").alias("p2"))
           .dropDuplicates())
    e1 = (t.join(b(pdw), t["p"] == pdw["p1"])
          .select("s", "p", "o", "p2").dropDuplicates())
    e2 = (t.join(b(pdw.select(F.col("p2").alias("p")).dropDuplicates()),
                 "p", "left_semi")
          .select(F.col("p").alias("p2"), "s", "o").dropDuplicates())
    reports.append(rep(
        e1.join(e2, ["p2", "s", "o"], "left_semi"),
        "prp-pdw", F.concat(F.lit("same (s, o) also under disjoint "
                                  "property "), F.col("p2"))))

    out = None
    for r in reports:
        r = r.select("rule", "s", "p", "o", "detail")
        out = r if out is None else out.unionByName(r)
    return out.dropDuplicates()


OWL_HASKEY = "owl:hasKey"


def haskey_sameas_edges(triples: DataFrame, *,
                        type_pred: str = RDF_TYPE) -> DataFrame:
    """OWL 2 RL prp-key as sameAs EDGE derivation: subjects typed with a
    class ``C`` declared ``C owl:hasKey (p1 .. pn)`` that agree on every
    key property's value are the same individual — composite-key entity
    resolution, the schema-declared twin of
    :func:`kgstats.discover_keys`.

    Like :func:`ifp_sameas_edges`, the pairwise OWL rule (k matching
    nodes → k² conclusions) is emitted as the group-min STAR: one
    subject-keyed join per key property, one aggregation on the key
    tuple, k-1 edges with the identical connected-components closure.

    Multi-valued scope (documented): a subject carrying MORE THAN ONE
    value for any key property is excluded from that key's matching —
    practical keys are single-valued per bearer, and the spec's
    intersect-any-combination semantics for multi-valued bearers is
    quadratic by construction. Dirty multi-valued bearers therefore
    never merge, which is the safe direction for ER."""
    t = triples.select("s", "p", "o")
    keys, _ = _harvest_axiom_lists(t, OWL_HASKEY)
    spark = t.sparkSession
    if not keys:
        return spark.createDataFrame([], "src string, dst string")

    types = (t.filter(F.col("p") == type_pred)
             .select(F.col("s").alias("x"), F.col("o").alias("cls"))
             .dropDuplicates())
    outs = []
    for cls, props in keys.items():
        bearer = types.filter(F.col("cls") == cls).select("x")
        for i, p in enumerate(props):
            vals = (t.filter(F.col("p") == p)
                    .groupBy("s")
                    .agg(F.min("o").alias(f"v{i}"),
                         F.countDistinct("o").alias("_n"))
                    .filter(F.col("_n") == 1)
                    .select(F.col("s").alias("x"), f"v{i}"))
            bearer = bearer.join(vals, "x")
        kcols = [f"v{i}" for i in range(len(props))]
        anchors = bearer.groupBy(*kcols).agg(F.min("x").alias("dst"))
        outs.append(bearer.join(anchors, kcols)
                    .filter(F.col("x") != F.col("dst"))
                    .select(F.col("x").alias("src"), "dst"))
    out = outs[0]
    for extra in outs[1:]:
        out = out.unionByName(extra)
    return out.dropDuplicates()


def key_smush(triples: DataFrame, *,
              type_pred: str = RDF_TYPE,
              sameas_pred: str = OWL_SAME,
              max_iter: int = 25) -> DataFrame:
    """The FULL OWL identity fragment composed: asserted owl:sameAs ∪
    functional / inverse-functional sharing (:func:`ifp_sameas_edges`) ∪
    declared composite keys (:func:`haskey_sameas_edges`), closed as ONE
    equivalence relation and smushed — one CC run over the union edge
    set is both cheaper and more complete than alternating rule firing.
    Identity bookkeeping (sameAs edges, IFP/FP declarations, hasKey
    axioms + their list cells) is dropped from the output."""
    from .components import connected_components

    t = triples.select("s", "p", "o")
    _, key_cells = _harvest_axiom_lists(t, OWL_HASKEY)
    asserted = (t.filter(F.col("p") == sameas_pred)
                .filter(F.col("s") != F.col("o"))
                .select(F.col("s").alias("src"), F.col("o").alias("dst")))
    edges = (asserted
             .unionByName(ifp_sameas_edges(t, type_pred=type_pred))
             .unionByName(haskey_sameas_edges(t, type_pred=type_pred)))
    cmap = (connected_components(edges, max_iter=max_iter)
            .select("node", F.col("component").alias("canonical")))
    decl = (F.col("p") == type_pred) & F.col("o").isin(OWL_IFP, OWL_FP)
    drop = (F.col("p").isin(sameas_pred, OWL_HASKEY)
            | decl
            | (F.col("s").isin(list(key_cells)) if key_cells else F.lit(False)))
    return _rewrite_through(triples.filter(~drop), cmap)
