"""Mimic the driver's correctness gate: run every __spark_entry__.queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare
row-count + column names + order-insensitive values.

Usage: python scripts/oracle_check.py [query ...]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].astype(str)
    return out.sort_values(cols).reset_index(drop=True)


def main(only=None, sf_dir="/root/testdata/sf0.01"):
    import duckdb

    import __spark_entry__ as entrymod
    from openapi_to_rdf_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"ERROR {name}: spark side failed: {type(e).__name__}: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(ours)} rows ({el:.1f}s)")
            continue
        try:
            theirs = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERROR {name}: oracle failed: {type(e).__name__}: {e}")
            failures += 1
            continue
        a, b = normalize(ours), normalize(theirs)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} mismatched rows")
            print("  ours:  ", a[diff].head(3).to_dict("records"))
            print("  oracle:", b[diff].head(3).to_dict("records"))
            failures += 1
        else:
            print(f"OK   {name}: {len(a)} rows match ({el:.1f}s)")
    spark.stop()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(only=set(sys.argv[1:]) or None))
