"""Portable Bloom filter + bloom-pruned semi-join as DataFrame ops.

Spark has a runtime bloom-filter join (`spark.sql.optimizer.runtime.
bloomFilter.enabled`), but it only fires when the optimizer's cost model
elects it, its sketch is engine-private, and it can't be materialized,
reused across jobs, or checked by another engine. This one follows the
same md5 recipe as operators/sketch.py: bit positions are a DETERMINISTIC
function of the key set — hash i of key k is the first 32 bits of
md5(f"{i}:{k}") mod m — so the driver's DuckDB oracle recomputes the
position table bit-for-bit (``bloom_bits``), and a filter built today can
prune a scan next week.

The scale story: a semi-join of a 100 TB fact table against a small key
set normally shuffles (or at least broadcast-hash-probes) every fact row.
Here the bitmap is packed into ONE hex-string literal embedded in the
plan, so the prefilter is pure whole-stage-codegen column arithmetic — no
join, no shuffle, evaluated inside the scan stage — and only rows whose
key *might* match (false-positive rate (1 - e^{-kn/m})^k, ~2e-6 at the
defaults for n=1000 keys) reach the exact semi-join behind it. Bloom
filters never produce false negatives, so correctness is exactly the
plain semi-join's (oracle-verified end to end by ``bloom_prune_orders``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(i: int, key: Column, num_bits: int) -> Column:
    h = F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % num_bits


def bloom_positions(df: DataFrame, key_col: str, num_bits: int = 1 << 16,
                    k: int = 5) -> DataFrame:
    """Distinct bit positions set by the key set: one ``pos`` column. The
    k per-key positions are computed in one projection (no join), then
    deduped — output is at most min(k * n_keys, num_bits) rows."""
    if num_bits % 4:
        raise ValueError("num_bits must be a multiple of 4")
    key = F.col(key_col)
    return (df.select(F.explode(F.array(
        *[_position(i, key, num_bits) for i in range(k)])).alias("pos"))
        .distinct())


def bloom_hex(positions: DataFrame, num_bits: int = 1 << 16) -> str:
    """Pack a position table into a hex string (driver-side; the position
    table is bounded by num_bits rows — 64 KiB of bitmap = a 16 Ki-char
    string, a broadcast-literal-sized artifact by construction). Nibble
    j holds bits 4j..4j+3, hex-encoded so the lookup needs only
    substring + conv — both codegen-able."""
    nibbles = bytearray(num_bits // 4)
    for r in positions.collect():
        nibbles[r.pos >> 2] |= 1 << (r.pos & 3)
    return "".join("%x" % v for v in nibbles)


def might_contain(key: Column, hex_bitmap: str, num_bits: int = 1 << 16,
                  k: int = 5) -> Column:
    """Membership test against a packed bitmap literal: k substring+conv
    probes ANDed together. No false negatives ever; false positives at
    the standard Bloom rate. Pure column arithmetic — Catalyst keeps the
    whole predicate inside the scan's WholeStageCodegen."""
    lit_map = F.lit(hex_bitmap)
    cond = F.lit(True)
    for i in range(k):
        pos = _position(i, key, num_bits)
        nib = F.conv(
            F.substring(lit_map, (pos / 4).cast("int") + 1, 1),
            16, 10).cast("int")
        rem = (pos % 4).cast("int")
        # shiftleft() takes only a literal shift count; the in-nibble bit
        # is one of four values, so a CASE stays fully codegen-able
        bit = (F.when(rem == 0, 1).when(rem == 1, 2)
               .when(rem == 2, 4).otherwise(8))
        cond = cond & (nib.bitwiseAND(bit) != 0)
    return cond


def bloom_semi_join(large: DataFrame, small: DataFrame, large_key: str,
                    small_key: str, num_bits: int = 1 << 16,
                    k: int = 5) -> DataFrame:
    """Exact semi-join with a bloom prefilter: rows of ``large`` whose
    ``large_key`` is in ``small``'s ``small_key`` set. The bitmap prunes
    the scan shuffle-free; the broadcast semi-join behind it removes the
    false positives, so the result equals the plain semi-join exactly."""
    keys = small.select(small_key).distinct()
    bitmap = bloom_hex(bloom_positions(keys, small_key, num_bits, k),
                       num_bits)
    pruned = large.filter(
        might_contain(F.col(large_key), bitmap, num_bits, k))
    return pruned.join(F.broadcast(keys),
                       pruned[large_key] == keys[small_key], "left_semi")


def bloom_fp_rate(n_keys: int, num_bits: int = 1 << 16, k: int = 5) -> float:
    """Theoretical false-positive rate (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-k * n_keys / num_bits)) ** k
