"""Entity-scale canonicalization stress: N true entities x 3 alias spellings
-> MinHash-LSH + CC + total map, with exact ground-truth scoring.

The transcript pipeline caps distinct entities at its pool size; this bench
scales the ENTITY dimension itself (the axis that explodes at 10^12 turns:
~10^9 distinct entities). Usage:

    python scripts/canon_bench.py [n_entities] [cores]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def entity_table(spark, n_entities: int):
    """3 alias rows per true entity, surfaces like the transcript generator's
    (word-word-id with separator variants) but with an unbounded id space."""
    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.sources.transcripts import ALIAS_SEPS, ENTITY_WORDS

    words = F.array(*[F.lit(w) for w in ENTITY_WORDS])
    nw = len(ENTITY_WORDS)
    base = spark.range(0, n_entities, 1,
                       spark.sparkContext.defaultParallelism * 2)
    aliased = base.select(
        F.col("id"), F.explode(F.array(*[F.lit(s) for s in ALIAS_SEPS])).alias("sep"))
    w1 = F.element_at(words, F.pmod("id", F.lit(nw)).cast("int") + 1)
    w2 = F.element_at(words, (F.pmod(F.floor(F.col("id") / nw), F.lit(nw)) + 1).cast("int"))
    w3 = F.element_at(words, (F.pmod(F.floor(F.col("id") / (nw * nw)), F.lit(nw)) + 1).cast("int"))
    surface = F.concat(w1, F.col("sep"), w2, F.col("sep"), w3, F.col("sep"),
                       F.format_string("%07d", F.col("id")))
    return aliased.select(
        F.concat(F.lit("ent:"), surface).alias("ent"),
        surface.alias("surface"),
        F.col("id").alias("true_id"))


def main(n_entities: int = 1_000_000, cores: int = 8) -> None:
    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.canonicalize import canonical_entity_map
    from openapi_to_rdf_spark.session import get_spark

    spark = get_spark(app_name="canon-bench", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    ents = entity_table(spark, n_entities).localCheckpoint()
    n_rows = ents.count()

    t0 = time.time()
    cmap = canonical_entity_map(ents.select("ent", "surface"),
                                threshold=0.9).localCheckpoint()
    n_map = cmap.count()
    elapsed = time.time() - t0

    joined = cmap.join(ents.select("ent", "true_id"), "ent")
    missed = (joined.groupBy("true_id")
              .agg(F.countDistinct("canonical").alias("n"))
              .filter("n > 1").count())
    over = (joined.groupBy("canonical")
            .agg(F.countDistinct("true_id").alias("n"))
            .filter("n > 1").count())

    print(f"entities={n_rows} (x3 aliases of {n_entities}) map={n_map} "
          f"canon_sec={elapsed:.1f} ents_per_sec={n_rows/elapsed:.0f} "
          f"missed={missed} bad={over}")
    spark.stop()


def cc_compare(n_edges: int = 3_000_000, cores: int = 8) -> None:
    """Head-to-head of the two connected-components regimes on the SAME
    >DRIVER_EDGE_LIMIT edge set (VERDICT r2 #6): the driver union-find
    (forced via a huge driver_limit) vs the distributed Shiloach–Vishkin
    path (driver_limit=0), with identical-output verification (both label
    by component-min, so the maps must agree row for row).

    Graph shape stresses both regimes: 60%% of edges form stars of ~5
    nodes (the alias-cluster shape canonicalization produces), 40%% form
    LONG CHAINS of length 100 with ids scrambled relative to chain order
    — the owl:sameAs shape that forces the pointer-jumping rounds.
    """
    import time

    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.components import connected_components
    from openapi_to_rdf_spark.session import get_spark

    spark = get_spark(app_name="cc-bench", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    n_star = int(n_edges * 0.6)
    n_chain = n_edges - n_star
    par = cores * 4
    # stars: node i -> its cluster representative (i - i%5)
    stars = (spark.range(0, n_star, 1, par)
             .select(F.concat(F.lit("n"), F.col("id")).alias("src"),
                     F.concat(F.lit("n"), (F.col("id") - F.col("id") % 5))
                     .alias("dst")))
    # chains: consecutive-in-chain nodes get ids bit-reversed-ish (multiply
    # by a large odd constant mod chain span) so min-label propagation
    # cannot ride id order
    chain_span = 100
    base = spark.range(0, n_chain, 1, par)
    cid = F.floor(F.col("id") / chain_span)
    pos = F.col("id") % chain_span

    def scramble(p):
        return F.pmod(p * 7919, F.lit(chain_span))

    chains = base.select(
        F.concat(F.lit("c"), cid, F.lit("_"), scramble(pos)).alias("src"),
        F.concat(F.lit("c"), cid, F.lit("_"), scramble(pos + 1)).alias("dst"),
    ).filter(F.col("id") % chain_span != chain_span - 1)
    edges = stars.unionByName(chains).localCheckpoint()
    n_distinct = edges.dropDuplicates(["src", "dst"]).count()

    results = {}
    for label, limit in (("driver-union-find", 1 << 60),
                         ("distributed-SV", 0)):
        t0 = time.time()
        comp = connected_components(edges, driver_limit=limit).localCheckpoint()
        n_nodes = comp.count()
        el = time.time() - t0
        digest = comp.agg(F.sum(F.xxhash64("node", "component")
                                .cast("decimal(38,0)"))).collect()[0][0]
        n_comps = comp.select("component").distinct().count()
        results[label] = (el, n_nodes, n_comps, digest)
        print(f"{label}: edges={n_distinct} nodes={n_nodes} "
              f"components={n_comps} sec={el:.1f} digest={digest}")
    d0, d1 = (results[k][3] for k in results)
    print("maps identical:", d0 == d1)
    spark.stop()


def incremental(n_entities: int = 1_000_000, cores: int = 8,
                n_batches: int = 2) -> None:
    """VERDICT r4 #8: the streaming/incremental merge path at canon-bench
    scale. The alias rows of each entity are scattered ACROSS batches
    (hash split), so most merges are cross-batch — exactly the case the
    incremental band-table state exists for. Asserts stream == batch
    against a one-shot canonical_entity_map under the SAME banding config
    (k=64, 8 bands — merge_batch's default at t=0.9) and prints per-batch
    walls + ground-truth quality of the incremental map."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.canonicalize import canonical_entity_map
    from openapi_to_rdf_spark.session import get_spark
    from openapi_to_rdf_spark.streaming.incremental import (
        merge_batch, read_canonical_map,
    )

    spark = get_spark(app_name="canon-inc", cores=cores,
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    ents = entity_table(spark, n_entities).localCheckpoint()
    n_rows = ents.count()
    state = tempfile.mkdtemp(prefix="canon_inc_")
    try:
        t_all = time.time()
        for b in range(n_batches):
            sl = (ents.filter(F.pmod(F.xxhash64("ent"), F.lit(n_batches))
                              == b)
                  .select("ent", "surface"))
            t0 = time.time()
            merge_batch(spark, state, sl, batch_id=b, threshold=0.9, k=64)
            print(f"batch {b}: rows={sl.count()} "
                  f"sec={time.time() - t0:.1f}", flush=True)
        t_inc = time.time() - t_all
        inc = read_canonical_map(spark, state).localCheckpoint()
        n_map = inc.count()

        t0 = time.time()
        one = canonical_entity_map(ents.select("ent", "surface"),
                                   threshold=0.9, k=64,
                                   bands=8).localCheckpoint()
        one.count()
        t_one = time.time() - t0

        n_diff = (inc.join(one.withColumnRenamed("canonical", "canon_b"),
                           "ent")
                  .filter(F.col("canonical") != F.col("canon_b")).count())
        joined = inc.join(ents.select("ent", "true_id"), "ent")
        missed = (joined.groupBy("true_id")
                  .agg(F.countDistinct("canonical").alias("n"))
                  .filter("n > 1").count())
        over = (joined.groupBy("canonical")
                .agg(F.countDistinct("true_id").alias("n"))
                .filter("n > 1").count())
        print(f"incremental: entities={n_rows} batches={n_batches} "
              f"map={n_map} inc_sec={t_inc:.1f} oneshot_sec={t_one:.1f} "
              f"map_diff_rows={n_diff} missed={missed} bad={over}")
        print("stream == batch:", n_diff == 0)
    finally:
        shutil.rmtree(state, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if "--cc" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--cc"]
        cc_compare(int(args[0]) if args else 3_000_000,
                   int(args[1]) if len(args) > 1 else 8)
    elif "--incremental" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--incremental"]
        incremental(int(args[0]) if args else 1_000_000,
                    int(args[1]) if len(args) > 1 else 8,
                    int(args[2]) if len(args) > 2 else 2)
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
        c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        main(n, c)
