"""Spec-file source: YAML paths -> DataFrame[path, content].

Mirrors the reference CLI's input handling (main.py:19-47): file-or-recursive-
directory expansion, *.yaml filter, order-preserving dedup — expressed as a
driver-side listing feeding ``spark.createDataFrame`` so the (tiny) path table
partitions across executors; file CONTENT is read executor-side inside the
conversion stage, keeping the driver out of the data path at 100 TB scale.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

PATHS_SCHEMA = StructType([StructField("path", StringType(), False)])


def expand_yaml_paths(inputs: list[str]) -> list[str]:
    """File-or-dir expansion with order-preserving dedup (main.py:19-47)."""
    out: list[str] = []
    for item in inputs:
        p = pathlib.Path(item)
        if not p.exists():
            raise FileNotFoundError(f"Input path does not exist: {item}")
        if p.is_dir():
            out.extend(str(f) for f in sorted(p.rglob("*.yaml")))
        elif p.is_file() and item.endswith(".yaml"):
            out.append(item)
        else:
            raise ValueError(f"Invalid input: {item} must be a YAML file or directory")
    return list(dict.fromkeys(out))


def spec_paths_df(spark: SparkSession, inputs: list[str],
                  parallelism: int | None = None) -> DataFrame:
    paths = expand_yaml_paths(inputs)
    if not paths:
        raise ValueError("No YAML files found to process.")
    num = parallelism or min(len(paths), spark.sparkContext.defaultParallelism)
    return spark.createDataFrame([(p,) for p in paths], PATHS_SCHEMA).repartition(num)


def with_content(df: DataFrame) -> DataFrame:
    """Attach file content executor-side (Arrow-batched, no per-row Python UDF
    in the Spark sense — one pandas call per batch)."""
    from pyspark.sql.types import StructType, StructField, StringType

    schema = StructType([
        StructField("path", StringType(), False),
        StructField("content", StringType(), True),
        StructField("read_error", StringType(), True),
    ])

    def read_batches(iterator):
        import pandas as pd

        for pdf in iterator:
            contents, errors = [], []
            for p in pdf["path"]:
                try:
                    contents.append(pathlib.Path(p).read_text(encoding="utf-8"))
                    errors.append(None)
                except Exception as e:  # per-file isolation (main.py:56-77)
                    contents.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"path": pdf["path"], "content": contents,
                                "read_error": errors})

    return df.mapInPandas(read_batches, schema)
