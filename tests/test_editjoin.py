"""Edit-distance similarity join (operators/editjoin): exact equality
with a brute-force Levenshtein reference on corpora engineered to stress
every path — segment pigeonhole, shift windows, the short stratum, and
cross-stratum pairs. Driver query ``edit_dup_pairs`` pins it against
DuckDB's levenshtein at sf0.01."""

import itertools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.editjoin import (  # noqa: E402
    edit_distance_pairs,
)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(items, k):
    return {(min(i, j), max(i, j), _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(items, 2)
            if _lev(a, b) <= k}


def _spark_pairs(spark, items, k, **kw):
    df = spark.createDataFrame(items, ["id", "text"])
    return {(r.id_a, r.id_b, r.dist)
            for r in edit_distance_pairs(df, k=k, **kw).collect()}


def test_edit_join_matches_brute_force_k1(spark):
    base = ["spark", "spork", "sparks", "park", "quark", "sharc",
            "table", "tables", "fable", "cable", "tablet",
            "ab", "ac", "b", "", "a", "xy", "engine", "enginee"]
    items = list(enumerate(base))
    assert _spark_pairs(spark, items, 1) == _brute(items, 1)


def test_edit_join_matches_brute_force_k2(spark):
    base = ["customer001", "customer002", "customer012", "custommer001",
            "kustomer001", "customer", "cust", "cus", "cu", "c",
            "zzzzz", "zzzz", "zzz", "abcdefgh", "abcdxfgh", "abxdxfgh"]
    items = list(enumerate(base))
    assert _spark_pairs(spark, items, 2) == _brute(items, 2)


def test_edit_join_substitution_at_every_position(spark):
    # edits at position 0 / middle / end — the shift window must catch all
    s = "abcdefghij"
    variants = [s] + [s[:i] + "#" + s[i + 1:] for i in range(len(s))]
    items = list(enumerate(variants))
    got = _spark_pairs(spark, items, 1)
    # the original pairs with every variant (dist 1)
    assert all((0, j, 1) in got for j in range(1, len(variants)))
    assert got == _brute(items, 1)


def test_edit_join_insertions_and_deletions(spark):
    s = "abcdefghij"
    variants = [s] + [s[:i] + s[i + 1:] for i in range(len(s))] \
        + [s[:i] + "!" + s[i:] for i in range(len(s) + 1)]
    items = list(enumerate(variants))
    assert _spark_pairs(spark, items, 1) == _brute(items, 1)


def test_edit_join_short_stratum_guard(spark):
    import pytest

    items = [(i, c) for i, c in enumerate("abcdefgh")]
    with pytest.raises(ValueError):
        edit_distance_pairs(
            spark.createDataFrame(items, ["id", "text"]),
            k=1, max_short=3).collect()


def test_edit_join_rejects_k0(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], ["id", "text"])
    with pytest.raises(ValueError):
        edit_distance_pairs(df, k=0)
