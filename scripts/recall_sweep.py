"""Cost/recall sweep for the approximate top-k operators (VERDICT r2 #1).

Sweeps ann_lsh_topk over (n_tables, multiprobe_bits) and ivf_topk over
(n_cells, n_probe, trained) on the driver testdata — the HARDEST regime
(random vectors, weak neighbors) — and prints one table row per config:
recall@10 vs exact cosine_topk, probed-candidate fraction of the corpus
(the scale-cost proxy: at 100 TB, cost ∝ candidates verified), and wall
seconds on this box. The chosen ≥0.9-recall named configs are asserted in
tests/test_recall.py and reported per-round by operators/recall.recall_report.

Usage: python scripts/recall_sweep.py [sf_dir] (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from openapi_to_rdf_spark.operators.recall import topk_recall  # noqa: E402
from openapi_to_rdf_spark.operators.similarity import (  # noqa: E402
    ann_lsh_topk, cosine_topk, ivf_topk,
)
from openapi_to_rdf_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="recall-sweep", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").localCheckpoint()
    n_corpus = emb.count()
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("vector")).localCheckpoint())
    n_q = queries.count()
    exact = cosine_topk(emb, queries, k=10).localCheckpoint()
    exact.count()
    print(f"corpus={n_corpus} queries={n_q} sf_dir={sf_dir}")
    print(f"{'config':<42} {'recall@10':>9} {'cand_frac':>9} {'sec':>6}")

    def row(label, fn):
        t0 = time.time()
        r = topk_recall(exact, fn(k=10))
        sec = time.time() - t0
        # candidate fraction: k=corpus returns every verified candidate
        n_cand = fn(k=10**9).count()
        frac = n_cand / (n_q * (n_corpus - 1))
        print(f"{label:<42} {r:>9.3f} {frac:>9.3f} {sec:>6.1f}")

    for L in (1, 4, 8, 16):
        for bits in (1, 2):
            row(f"ann n_planes=8 L={L} bits={bits}",
                lambda k, L=L, bits=bits: ann_lsh_topk(
                    emb, queries, k=k, dim=64, n_tables=L,
                    multiprobe_bits=bits))
    for cells, probe in ((16, 2), (16, 8), (16, 12), (64, 8), (64, 16),
                         (64, 24), (64, 32)):
        row(f"ivf cells={cells} probe={probe}",
            lambda k, c=cells, p=probe: ivf_topk(
                emb, queries, k=k, n_cells=c, n_probe=p))
    from openapi_to_rdf_spark.operators.clustering import kmeans_fit

    for cells, probe in ((16, 8), (64, 16), (64, 24)):
        cb = kmeans_fit(emb, k=cells, iters=2)
        row(f"ivf cells={cells} probe={probe} trained",
            lambda k, cb=cb, p=probe: ivf_topk(
                emb, queries, k=k, n_probe=p, centroids=cb))
    spark.stop()


if __name__ == "__main__":
    main()
