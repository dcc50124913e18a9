"""Basic-graph-pattern (BGP) matching over the triple table — the core
SPARQL-style query surface a KG consumer runs against the materialized
subject/predicate/object snapshot, compiled to DataFrame equi-joins.

A pattern is a (s, p, o) triple of terms; a term starting with ``?`` is a
variable, anything else is a constant. The classic SPARQL→relational
compilation applies:

- each pattern becomes one scan of the triple table with its constant
  positions pushed down as filters — and because the graph snapshot is
  PREDICATE-partitioned (plans/pipeline.py "vertical partitioning"), a
  constant-predicate pattern reads exactly one partition: an N-pattern BGP
  is N pruned scans, never N full passes;
- patterns join pairwise on their shared variables (hash equi-joins — the
  shuffle key is the variable binding, typically a high-cardinality IRI,
  so the joins distribute well; star patterns around one subject variable
  all shuffle on that same key and AQE coalesces the chain);
- join order follows the given pattern order; put the most selective
  pattern first exactly as you would order a SQL join chain. Catalyst
  still reorders/broadcasts below us when sizes warrant.

Semantics: set of variable bindings (DISTINCT off by default, matching
SPARQL's bag semantics for SELECT without DISTINCT). Matching is by term
VALUE: a constant object matches both IRIs and literals with that lexical
value; o_kind/o_datatype can be constrained by a pattern dict if needed.

``bgp_query`` is hash-verified end to end by the driver (``bgp_orders``):
the BGP over an RDF encoding of the orders/customer/nation tables must
reproduce the plain relational join DuckDB computes on the base tables —
the compilation is correct iff the two agree exactly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def bgp_query(triples: DataFrame, patterns: list[Pattern],
              select: list[str] | None = None,
              distinct: bool = False,
              optional: list[list[Pattern]] | None = None,
              filters: list | None = None,
              values: dict[str, list] | None = None,
              bind: dict[str, object] | None = None,
              subqueries: list[DataFrame] | None = None,
              order_by: list[str] | None = None,
              limit: int | None = None,
              offset: int | None = None) -> DataFrame:
    """Match a conjunctive pattern list; returns one column per variable
    (named without the leading '?'), optionally projected to ``select``.

    Example (who placed urgent orders, and where):
        bgp_query(g, [("?o", KG+"placedBy", "?c"),
                      ("?o", KG+"priority", "1-URGENT"),
                      ("?c", KG+"inNation", "?n")])

    ``optional``: list of OPTIONAL pattern groups (SPARQL OPTIONAL {...}).
    Each group matches independently and LEFT-joins the core bindings on
    the variables they share — rows without a match keep null bindings for
    the group's exclusive variables. The left join shuffles on the shared
    variable (same key profile as the core joins).

    Solution modifiers (applied in SPARQL's algebra order — FILTER/VALUES
    inside the group, then DISTINCT, ORDER, OFFSET, LIMIT):

    - ``filters``: SPARQL FILTER — SQL boolean strings or Columns over
      the variable columns (e.g. ``"nname <> 'FRANCE'"``). Declared after
      the joins but Catalyst pushes them down to the scans where legal —
      exactly why FILTER belongs in the declarative plan, not post-hoc.
    - ``values``: SPARQL VALUES inline data — {var: [literals...]},
      joined in as a broadcast inner join on the shared variables (the
      standard VALUES-as-join semantics; a one-var VALUES degenerates to
      a pushed-down IN-list).
    - ``subqueries``: SPARQL subqueries — nested SELECTs evaluated
      bottom-up and joined into the group on their shared variables
      (projected-variable visibility, per the SPARQL algebra). Pass the
      already-compiled binding DataFrames (e.g. a :func:`bgp_agg` result,
      columns named like the outer variables); each inner-joins the core
      bindings on the column intersection. An aggregate subquery is how
      SPARQL expresses "join each ?c against its COUNT" — the join key is
      the subquery's group variable, so the shuffle is the narrow
      (key, aggregates) relation, never the re-expanded bindings.
    - ``bind``: SPARQL BIND(expr AS ?var) — {var: SQL-string-or-Column}
      computed over the bound variables, extending every solution.
      Applied before ``filters`` so a FILTER can constrain a BIND-ed
      variable, exactly as a later FILTER in the group sees it.
    - ``order_by``: variable names, "-var" for DESC. With ``limit``,
      Spark plans TakeOrderedAndProject — a per-partition top-k plus one
      singleton reduce, never a global sort of the bindings.
    - ``limit`` / ``offset``: SPARQL LIMIT/OFFSET (offset requires an
      order to be meaningful, as in SPARQL).
    """
    if not patterns:
        raise ValueError("empty BGP")
    # graph snapshots carry a 'pred' partition column (the predicate's local
    # name, plans/pipeline.py): filter it too for constant predicates so the
    # parquet scan prunes to one partition directory (PartitionFilters in
    # the plan), not just row-group stats on p
    has_pred = "pred" in triples.columns
    out: DataFrame | None = None
    for s, p, o in patterns:
        if isinstance(p, tuple):
            # property path in predicate position (operators/paths): the
            # pattern's relation is the compiled (s, o) pair table; term
            # binding below is identical minus the p position
            from .paths import compile_path
            scan, terms = compile_path(triples, p), ((s, "s"), (o, "o"))
        else:
            scan = triples
            if has_pred and not _is_var(p):
                local = re.search(r"([A-Za-z0-9_]+)$", p)
                if local:
                    scan = scan.filter(F.col("pred") == local.group(1))
            terms = ((s, "s"), (p, "p"), (o, "o"))
        cols = []
        seen_vars: dict[str, str] = {}
        for term, col in terms:
            if _is_var(term):
                name = term[1:]
                if name in seen_vars:
                    # repeated variable inside ONE pattern (e.g. ?x p ?x):
                    # same-row equality filter, bound once
                    scan = scan.filter(F.col(col) == F.col(seen_vars[name]))
                else:
                    seen_vars[name] = col
                    cols.append(F.col(col).alias(name))
            else:
                scan = scan.filter(F.col(col) == term)
        scan = scan.select(*cols)
        if out is None:
            out = scan
        else:
            shared = sorted(set(out.columns) & set(scan.columns))
            # disconnected pattern groups degenerate to a product — allow
            # (SPARQL allows it) but it's the caller's cartesian to own
            out = (out.join(scan, shared) if shared
                   else out.crossJoin(scan))
    for sub in subqueries or []:
        shared = sorted(set(out.columns) & set(sub.columns))
        if not shared:
            raise ValueError("subquery shares no variable with the core "
                             "patterns — its join would be a product")
        out = out.join(sub, shared)
    for group in optional or []:
        grp = bgp_query(triples, group)
        shared = sorted(set(out.columns) & set(grp.columns))
        if not shared:
            raise ValueError("OPTIONAL group shares no variable with the "
                             "core patterns — its match would be a product")
        out = out.join(grp, shared, "left")
    if values:
        vals = {v.lstrip("?"): lits for v, lits in values.items()}
        missing = set(vals) - set(out.columns)
        if missing:
            raise ValueError(f"VALUES variables {sorted(missing)} are not "
                             "bound by the patterns")
        rows = list(zip(*vals.values()))
        inline = triples.sparkSession.createDataFrame(rows, list(vals))
        out = out.join(F.broadcast(inline), list(vals))
    for var, expr in (bind or {}).items():
        name = var.lstrip("?")
        if name in out.columns:
            raise ValueError(f"BIND target ?{name} is already bound")
        out = out.withColumn(
            name, F.expr(expr) if isinstance(expr, str) else expr)
    for cond in filters or []:
        out = out.filter(cond)
    if select:
        out = out.select(*[v.lstrip("?") for v in select])
    if distinct:
        out = out.dropDuplicates()
    if order_by:
        keys = [F.col(v[1:].lstrip("?")).desc() if v.startswith("-")
                else F.col(v.lstrip("?")).asc() for v in order_by]
        out = out.orderBy(*keys)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def bgp_minus(triples: DataFrame, patterns: list[Pattern],
              minus: list[Pattern],
              select: list[str] | None = None,
              distinct: bool = False) -> DataFrame:
    """SPARQL MINUS / FILTER NOT EXISTS: core bindings whose shared
    variables have NO solution in the ``minus`` group — one anti-join on
    the shared variables (the cheapest join Spark has: no payload columns
    move, and the build side is just the minus group's key projection)."""
    core = bgp_query(triples, patterns)
    neg = bgp_query(triples, minus)
    shared = sorted(set(core.columns) & set(neg.columns))
    if not shared:
        raise ValueError("MINUS group shares no variable with the core "
                         "patterns — per SPARQL MINUS semantics it would "
                         "remove nothing")
    out = core.join(neg.select(*shared).dropDuplicates(shared),
                    shared, "left_anti")
    if select:
        out = out.select(*[v.lstrip("?") for v in select])
    return out.dropDuplicates() if distinct else out


def bgp_construct(triples: DataFrame, where: list[Pattern],
                  template: list[Pattern],
                  distinct: bool = True) -> DataFrame:
    """SPARQL CONSTRUCT: instantiate ``template`` patterns with every
    solution of ``where``, emitting a new (s, p, o) triple table — the KG
    derivation/inference primitive (materialize co-author edges, flatten
    paths, re-predicate imported data). Template constants pass through;
    template variables must be bound by ``where``. Output deduplicates by
    default (CONSTRUCT builds a graph, i.e. a set)."""
    bindings = bgp_query(triples, where)
    bound = set(bindings.columns)
    outs = []
    for s, p, o in template:
        cols = []
        for term, name in zip((s, p, o), ("s", "p", "o")):
            if _is_var(term):
                if term[1:] not in bound:
                    raise ValueError(f"template variable {term} is not "
                                     "bound by the WHERE patterns")
                cols.append(F.col(term[1:]).cast("string").alias(name))
            else:
                cols.append(F.lit(term).alias(name))
        outs.append(bindings.select(*cols))
    out = outs[0]
    for o_ in outs[1:]:
        out = out.unionByName(o_)
    return out.dropDuplicates() if distinct else out


def _vars_of(patterns: list[Pattern]) -> set[str]:
    out = set()
    for pat in patterns:
        for term in pat:
            if _is_var(term):
                out.add(term[1:])
    return out


def bgp_agg(triples: DataFrame, patterns: list[Pattern],
            group_vars: list[str], aggs: dict[str, tuple],
            eager: bool = True) -> DataFrame:
    """SPARQL GROUP BY + aggregates over a BGP — COUNT / SUM / MIN / MAX /
    AVG — with EAGER AGGREGATION pushed below the join when legal (the
    classic group-by pushdown Catalyst does not perform).

    ``aggs``: {out_alias: (fn, var[, cast])} where fn ∈ {count, sum, min,
    max, avg}. Triple objects are strings, so numeric aggregates take an
    optional cast type (e.g. ``("sum", "?price", "long")``).

    Legality + rewrite: split the patterns into the component A that
    mentions any aggregated variable, and the rest B. When no aggregated
    variable appears in B or in the group keys, every one of these
    aggregates distributes over the join — COUNT/SUM re-aggregate as SUM
    of partials, MIN/MAX as MIN/MAX of partials, AVG as partial (sum,
    count) pairs combined at the end: pre-aggregate A's solutions by its
    boundary variables (vars shared with B or grouped on), join the
    narrow (boundary, partials) relation into B, and combine per group.
    Join fan-out is exactly bag semantics: a boundary key that B matches
    k times contributes its partials k times, which is what the
    unrewritten bag aggregate computes row by row. At scale this is the
    difference between shuffling every (order × customer) binding row
    and shuffling one partial per customer — the join's probe side
    shrinks from |A's solutions| to |A's boundary keys|.

    Falls back to aggregate-after-join whenever the rewrite is illegal
    (or ``eager=False``); both paths are hash-verified against the same
    DuckDB GROUP BY by the driver (``bgp_agg_orders``, ``bgp_agg_sums``).
    """
    gvars = [v.lstrip("?") for v in group_vars]
    specs = {}
    for alias, spec in aggs.items():
        fn, var = spec[0], spec[1].lstrip("?")
        if fn not in ("count", "sum", "min", "max", "avg",
                      "count_distinct", "group_concat", "sample"):
            raise ValueError(f"unsupported aggregate {fn!r}")
        specs[alias] = (fn, var, spec[2] if len(spec) > 2 else None)

    def term(var, cast):
        return F.col(var).cast(cast) if cast else F.col(var)

    avars = {v for (_, v, _) in specs.values()}
    a_pats = [pat for pat in patterns
              if avars & {t[1:] for t in pat if _is_var(t)}]
    b_pats = [pat for pat in patterns if pat not in a_pats]
    # COUNT(DISTINCT ?x) never pre-aggregates: a distinct count is not
    # decomposable into per-boundary partials (and unlike the bag
    # aggregates, join fan-out is IRRELEVANT to it — duplicated rows
    # collapse under distinct — so aggregate-after-join is exact)
    # (group_concat/sample likewise take the direct path: concat state
    # is value-list-sized per group — SPARQL semantics, bounded by the
    # caller's grouping; sample is derandomized to min for determinism)
    legal = (eager and a_pats and b_pats
             and not any(fn in ("count_distinct", "group_concat", "sample")
                         for (fn, _, _) in specs.values())
             and not (avars & set(gvars))
             and not (avars & _vars_of(b_pats)))
    if legal:
        boundary = sorted(_vars_of(a_pats) & (_vars_of(b_pats) | set(gvars)))
        if boundary:
            partials, finals = [], []
            for alias, (fn, var, cast) in specs.items():
                if fn == "count":
                    partials.append(F.count(var).alias(f"_p_{alias}"))
                    finals.append(F.sum(f"_p_{alias}").alias(alias))
                elif fn == "sum":
                    partials.append(F.sum(term(var, cast))
                                    .alias(f"_p_{alias}"))
                    finals.append(F.sum(f"_p_{alias}").alias(alias))
                elif fn in ("min", "max"):
                    partials.append(getattr(F, fn)(term(var, cast))
                                    .alias(f"_p_{alias}"))
                    finals.append(getattr(F, fn)(f"_p_{alias}")
                                  .alias(alias))
                else:  # avg = Σ partial sums / Σ partial counts
                    partials.append(F.sum(term(var, cast))
                                    .alias(f"_ps_{alias}"))
                    partials.append(F.count(var).alias(f"_pc_{alias}"))
                    finals.append((F.sum(f"_ps_{alias}")
                                   / F.sum(f"_pc_{alias}")).alias(alias))
            partial = (bgp_query(triples, a_pats)
                       .groupBy(*boundary).agg(*partials))
            rest = bgp_query(triples, b_pats)
            shared = sorted(set(rest.columns) & set(boundary))
            return (rest.join(partial, shared)
                    .groupBy(*gvars).agg(*finals))
    bindings = bgp_query(triples, patterns)
    direct = [
        (F.count(var) if fn == "count"
         else F.countDistinct(var) if fn == "count_distinct"
         else F.array_join(F.sort_array(F.collect_list(var)),
                           cast or ",") if fn == "group_concat"
         else F.min(var) if fn == "sample"
         else getattr(F, fn)(term(var, cast))).alias(alias)
        for alias, (fn, var, cast) in specs.items()]
    return bindings.groupBy(*gvars).agg(*direct)


def bgp_count(triples: DataFrame, patterns: list[Pattern],
              group_vars: list[str], count_var: str,
              count_alias: str = "n", eager: bool = True) -> DataFrame:
    """SPARQL ``SELECT ?g (COUNT(?x) AS ?n) ... GROUP BY ?g`` — the COUNT
    special case of :func:`bgp_agg` (kept as the stable entry point the
    driver's ``bgp_agg_orders`` oracle exercises on both plan shapes)."""
    return bgp_agg(triples, patterns, group_vars,
                   {count_alias: ("count", count_var)}, eager=eager)


def bgp_union(triples: DataFrame, alternatives: list[list[Pattern]],
              select: list[str] | None = None,
              distinct: bool = False) -> DataFrame:
    """SPARQL UNION: bindings from any alternative pattern group, columns
    aligned by variable name (a variable absent from one branch binds null
    there, per SPARQL semantics)."""
    if not alternatives:
        raise ValueError("empty UNION")
    parts = [bgp_query(triples, pats) for pats in alternatives]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    if select:
        out = out.select(*[v.lstrip("?") for v in select])
    return out.dropDuplicates() if distinct else out


def bgp_ask(triples: DataFrame, patterns: list[Pattern],
            filters: list | None = None,
            values: dict[str, list] | None = None) -> DataFrame:
    """SPARQL ASK: does the pattern group have at least one solution?

    Returns a one-row DataFrame with a boolean ``ask`` column (a frame,
    not a Python bool, so the answer stays lazy/composable and the driver
    can oracle-check it against ``SELECT EXISTS(...)``). The ``limit(1)``
    before the count is the point: Spark's CollectLimit short-circuits —
    executors stop scanning partitions as soon as one solution row
    exists, so a satisfiable ASK over 10^12 triples touches a handful of
    partitions instead of materializing every binding.
    """
    one = bgp_query(triples, patterns, filters=filters, values=values) \
        .limit(1)
    return one.agg((F.count(F.lit(1)) > 0).alias("ask"))


def bgp_describe(triples: DataFrame, patterns: list[Pattern],
                 var: str, filters: list | None = None) -> DataFrame:
    """SPARQL DESCRIBE ?var: every triple whose subject OR object is one
    of ?var's bindings (the 'concise description' most stores ship).

    An OR-condition join would plan a nested loop, so the disjunction is
    decomposed into two semi-joins against the (small, distinct) node
    set — subject matches, plus object matches that are NOT subject
    matches (an anti-join on s) — whose disjoint union is exactly the OR
    without a global dedup of the triple bag. The node set is a bound
    solution list: broadcast, so describing touches the graph in two
    pruned broadcast passes and shuffles nothing.
    """
    v = var.lstrip("?")
    nodes = F.broadcast(
        bgp_query(triples, patterns, select=[var], filters=filters,
                  distinct=True).withColumnRenamed(v, "_node"))
    s_hits = triples.join(nodes, triples["s"] == nodes["_node"], "left_semi")
    o_only = (triples.join(nodes, triples["o"] == nodes["_node"], "left_semi")
              .join(nodes, triples["s"] == nodes["_node"], "left_anti"))
    return s_hits.unionAll(o_only)


# --------------------------------------------------------------------------
# statistics-driven join ordering
# --------------------------------------------------------------------------

def predicate_stats(triples: DataFrame, p_col: str = "p") -> dict:
    """{predicate: (n_triples, distinct_subjects, distinct_objects)} — the
    per-predicate statistics every RDF store keeps for join ordering (one
    scan, vocabulary-sized result; collect to the driver is the POINT:
    the planner needs them at plan time, like a broadcast vocab)."""
    rows = (triples.groupBy(F.col(p_col).alias("p"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct("s").alias("ds"),
                 F.countDistinct("o").alias("do"))
            .collect())
    return {r.p: (r.n, r.ds, r.do) for r in rows}


def estimate_pattern(pattern: Pattern, stats: dict, total: int) -> float:
    """Estimated solutions of ONE triple pattern under the classic
    uniformity model: a constant predicate scopes to its n_p; a constant
    subject/object divides by the predicate's distinct count (or by the
    heuristic 1/10 when the predicate is a variable). Unknown predicates
    estimate 1 (they match nothing)."""
    s, p, o = pattern
    if isinstance(p, tuple) or _is_var(p):
        est = float(total)
        ds = do = max(total / 10.0, 1.0)
        if not _is_var(s):
            est /= ds
        if not _is_var(o):
            est /= do
        return max(est, 1.0)
    if p not in stats:
        return 1.0
    n, ds, do = stats[p]
    est = float(n)
    if not _is_var(s):
        est /= max(ds, 1)
    if not _is_var(o):
        est /= max(do, 1)
    return max(est, 1.0)


def order_patterns(patterns: list[Pattern], stats: dict,
                   total: int | None = None) -> list[Pattern]:
    """Greedy selectivity ordering: start from the smallest-estimate
    pattern, then repeatedly take the smallest-estimate pattern that
    SHARES a variable with what's already joined (avoiding accidental
    products), falling back to the global smallest when no connected
    pattern remains (a genuinely disconnected BGP). Deterministic:
    ties break on the original pattern index.

    This is the textbook System-R-style greedy over triple patterns that
    every RDF store runs before handing join order to the executor —
    Catalyst reorders *relational* joins by size only when CBO stats
    exist, and it never sees pattern-level selectivity (a constant
    object on a selective predicate), so ordering before compilation is
    where the 10^12-triple win lives: the first join's build side drops
    from |biggest predicate| to |most selective pattern|.
    """
    if total is None:
        total = sum(n for n, _, _ in stats.values()) or 1
    est = [(estimate_pattern(pat, stats, total), i, pat)
           for i, pat in enumerate(patterns)]
    remaining = sorted(est)
    ordered: list[Pattern] = []
    bound: set[str] = set()

    def pat_vars(pat):
        return {t[1:] for t in (pat if not isinstance(pat[1], tuple)
                                else (pat[0], pat[2]))
                if isinstance(t, str) and _is_var(t)}

    while remaining:
        connected = [e for e in remaining if not ordered
                     or (pat_vars(e[2]) & bound)]
        pick = min(connected) if connected else remaining[0]
        remaining.remove(pick)
        ordered.append(pick[2])
        bound |= pat_vars(pick[2])
    return ordered


def bgp_query_optimized(triples: DataFrame, patterns: list[Pattern],
                        stats: dict | None = None, **kwargs) -> DataFrame:
    """:func:`bgp_query` with statistics-driven pattern ordering: collect
    (or reuse) per-predicate stats, greedily order by estimated
    selectivity, then compile. Bindings are EXACTLY those of the
    unordered query (join reordering is semantics-preserving); only the
    intermediate sizes change."""
    if stats is None:
        stats = predicate_stats(triples)
    return bgp_query(triples, order_patterns(patterns, stats), **kwargs)


def bgp_exists(triples: DataFrame, patterns: list[Pattern],
               exists: list[Pattern],
               select: list[str] | None = None,
               distinct: bool = False) -> DataFrame:
    """SPARQL FILTER EXISTS — the positive twin of :func:`bgp_minus`:
    core bindings whose shared variables HAVE at least one solution in
    the ``exists`` group. One semi-join on the shared variables (no
    payload columns move; the probe never duplicates core rows, which a
    plain inner join against a many-solution group would)."""
    core = bgp_query(triples, patterns)
    pos = bgp_query(triples, exists)
    shared = sorted(set(core.columns) & set(pos.columns))
    if not shared:
        raise ValueError("EXISTS group shares no variable with the core "
                         "patterns — it would keep everything or nothing")
    out = core.join(pos.select(*shared).dropDuplicates(shared),
                    shared, "left_semi")
    if select:
        out = out.select(*[v.lstrip("?") for v in select])
    return out.dropDuplicates() if distinct else out


def stats_from_manifest(manifest: dict) -> dict:
    """Planner statistics from a graph snapshot manifest written with
    ``stats_cols`` (plans/snapshot ANALYZE-on-write): the same
    {predicate: (n, distinct_s, distinct_o)} shape
    :func:`predicate_stats` computes by scanning — but read from table
    metadata, so :func:`bgp_query_optimized` plans with ZERO instance
    scans (exactly how an RDF store consults its stored statistics)."""
    raw = manifest.get("metrics", {}).get("predicate_stats")
    if raw is None:
        raise ValueError("manifest carries no predicate_stats — snapshot "
                         "was written without stats_cols")
    return {p: tuple(v) for p, v in raw.items()}
