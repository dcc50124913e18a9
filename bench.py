"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
   "sf": ..., "turns_per_sec": ..., ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

``python bench.py --scaling`` additionally runs the KG job at local[N/4] and
local[N] on identical input and reports throughput at both plus scaling
efficiency (the sandbox stand-in for the N-vs-4N-executor criterion in
BASELINE.json; see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

# transcript volume for the KG stage: ~5.5 turns/conv; sized so the sf0.1 run
# measures sustained throughput (~30s) rather than session startup
N_CONVS = {"0.001": 2_000, "0.01": 20_000, "0.1": 120_000}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def kg_job(spark, n_convs: int) -> dict:
    """The flagship pipeline: synth -> extract -> canonicalize -> remap.
    Returns timings + turn count (the BASELINE.json throughput metric)."""
    from openapi_to_rdf_spark.operators.canonicalize import (
        canonical_entity_map, remap_triples,
    )
    from openapi_to_rdf_spark.operators.extract import (
        ENT_NS, KG_NS, extract_transcript_triples,
    )
    from openapi_to_rdf_spark.sources.transcripts import (
        class_vocab_df, synth_transcripts,
    )

    turns = synth_transcripts(spark, n_convs).localCheckpoint()  # input off the clock
    n_turns = turns.count()

    t0 = time.time()
    triples = extract_transcript_triples(turns, class_vocab_df(spark)).localCheckpoint()
    n_triples = triples.count()
    t_extract = time.time() - t0

    t0 = time.time()
    ents = (triples.filter(F.col("p") == KG_NS + "surfaceForm")
            .select(F.col("s").alias("ent"), F.col("o").alias("surface"))
            .dropDuplicates(["ent"]))
    cmap = canonical_entity_map(ents, threshold=0.9)
    kg = remap_triples(triples, cmap, ENT_NS)
    n_kg = kg.count()
    t_canon = time.time() - t0

    return {"n_turns": n_turns, "n_triples": n_triples, "n_kg_triples": n_kg,
            "sec_extract": round(t_extract, 3), "sec_canonicalize": round(t_canon, 3),
            "turns_per_sec": round(n_turns / t_extract, 1)}


def data_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline operator queries over the driver testdata tables."""
    import __spark_entry__ as em

    qs = em.queries()
    names = ["pricing_summary", "revenue_by_nation", "latest_event_per_user",
             "doc_quality", "exact_dedup", "ngram_dup_pairs",
             "minhash_clusters", "simhash_pairs", "cosine_topk", "ann_topk"]
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def run_once(cores: int, sf_dir: str, n_convs: int, with_queries: bool) -> dict:
    from openapi_to_rdf_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        res = {"kg": kg_job(spark, n_convs)}
        if with_queries:
            res["queries"] = data_queries(spark, sf_dir)
        return res
    finally:
        spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_convs = N_CONVS.get(sf, 20_000)
    scaling = "--scaling" in sys.argv

    res = run_once(cpus, sf_dir, n_convs, with_queries=True)
    queries = dict(res["queries"])
    kg = res["kg"]
    queries["kg_extract"] = kg["sec_extract"]
    queries["kg_canonicalize"] = kg["sec_canonicalize"]

    out = {
        "metric": "kg-pipeline + operator suite wall time",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns_per_sec": kg["turns_per_sec"],
        "n_turns": kg["n_turns"],
        "n_kg_triples": kg["n_kg_triples"],
        "cores": cpus,
    }

    if scaling:
        lo_cores = max(cpus // 4, 1)
        lo = run_once(lo_cores, sf_dir, n_convs, with_queries=False)["kg"]
        t_hi, t_lo = kg["turns_per_sec"], lo["turns_per_sec"]
        out["scaling"] = {
            "cores_lo": lo_cores, "cores_hi": cpus,
            "turns_per_sec_lo": t_lo, "turns_per_sec_hi": t_hi,
            "speedup": round(t_hi / t_lo, 3),
            "efficiency": round(t_hi / t_lo / (cpus / lo_cores), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
