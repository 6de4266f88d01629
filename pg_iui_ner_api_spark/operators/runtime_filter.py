"""Bloom-filter runtime pre-filtering for selective semi-joins.

Provenance: the reference resolves foreign keys one row at a time with
ORM point lookups (/root/reference/src/utils/crud.py:62-77); at corpus
scale the same "keep only facts whose key appears in a filtered
dimension" question is a semi-join whose shuffle cost is dominated by
the FACT side. This module is the engine-side runtime-filter pattern
(what Spark's own `spark.sql.optimizer.runtimeFilter.bloomFilter` /
dynamic partition pruning do for suitable plans, expressed explicitly
so it applies to ANY key expression and survives plan shapes the
optimizer's heuristic skips).

100 TB shape:

  * Build: the filtered dimension's keys reduce to a fixed-size bitmap
    — k hash positions per key, exploded to (word, bit) and OR-combined
    by a single partial-aggregable ``groupBy(word)``. The shuffle
    carries at most ``m_bits/64`` groups regardless of key count, and
    the driver collect is the bitmap itself (``m_bits/8`` bytes, e.g.
    128 KiB for the default 2^20 bits) — bounded by a CONFIG constant,
    never by data size, same contract as the broadcast collects in
    operators/linking.py.
  * Probe: the bitmap is embedded as a constant array literal in the
    plan (NOT a single-row cross-join: Catalyst reorders that join
    family and can hoist the membership test ABOVE the semi-join,
    filtering after the shuffle it was meant to save). A literal keeps
    the probe a plain ``Filter`` sitting directly on the fact scan —
    provably below the join, map-side, pre-Exchange — and codegen
    materializes a Literal once per task, not per row. The membership
    test itself is pure in-row Column algebra (xxhash64 → getbit), so
    shuffle input shrinks to matches + false positives.
  * Exactness: the surviving candidates still flow through a real
    left-semi join, so false positives never reach the output — the
    bloom stage only saves work, it never changes the answer. The
    registered oracle is therefore the plain ``IN (subquery)``.

Zero Python on the hot path; the only driver work is the bounded bitmap
collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """k bit positions for ``key``: pmod(xxhash64(key, seed_i), m)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k_hashes: int = 5
) -> list[int]:
    """Aggregate ``keys[key_col]`` into an ``m_bits``-bit Bloom bitmap,
    returned as ``m_bits // 64`` longs (word ``w`` holds bits
    ``64*w .. 64*w+63``, LSB-first).

    One distributed aggregation: explode each key's k positions to
    (word, mask) and ``bit_or`` per word — partial-aggregable, so the
    shuffle moves at most ``m_bits/64`` rows however many keys there
    are.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k_hashes)))
    words = (
        keys.select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def bloom_might_contain(
    key: Column, bloom_col: Column, m_bits: int, k_hashes: int
) -> Column:
    """In-row membership test: all k bits set in the bitmap array."""
    cond = None
    for pos in _positions(key, m_bits, k_hashes):
        w = (pos / 64).cast("int")
        b = (pos % 64).cast("int")
        bit = F.getbit(F.element_at(bloom_col, w + 1), b) == 1
        cond = bit if cond is None else (cond & bit)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """``fact LEFT SEMI JOIN keys`` with a Bloom pre-filter on the fact
    side: build the bitmap from ``keys[keys_key]``, drop fact rows that
    cannot match BEFORE the join's shuffle, then run the exact semi-join
    over the survivors. Output is exactly the semi-join (false positives
    are eliminated by the join), so the DuckDB oracle is the plain
    ``WHERE fact_key IN (SELECT keys_key FROM keys)``.
    """
    bitmap = bloom_build(keys, keys_key, m_bits, k_hashes)
    probe = fact.where(
        bloom_might_contain(F.col(fact_key), F.lit(bitmap), m_bits, k_hashes)
    )
    return probe.join(
        keys.select(F.col(keys_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )


def bloom_candidates(
    fact: DataFrame,
    bitmap: list[int],
    fact_key: str,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """Just the Bloom-passed candidates (matches + false positives) —
    the diagnostic surface for measuring the observed false-positive
    rate against the theoretical ``(1 - e^{-kn/m})^k`` bound."""
    return fact.where(
        bloom_might_contain(F.col(fact_key), F.lit(bitmap), m_bits, k_hashes)
    )
