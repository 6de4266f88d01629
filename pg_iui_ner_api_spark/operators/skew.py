"""Explicit skew remediation: the salted equi-join.

Provenance: the north rule demands partitioning/shuffle/skew handled
EXPLICITLY. The engine already leans on three implicit layers — AQE
skew-join splitting (session.py), broadcast hints for dims, and the
salted-star trick inside operators/similarity — but none of them covers
the case AQE handles worst: a shuffle join where ONE side has a hot key
(a hub entity, a default value, an empty-string surface) and the other
side is too big to broadcast yet small enough to replicate a few times.
This module is that remedy as a reusable operator.

Mechanics: LEFT (the skewed side) scatters each row across ``salt``
sub-keys with a per-row hash; RIGHT replicates every row to all
``salt`` sub-keys via an in-row ``sequence`` explode; the join key
becomes (keys..., _salt), so a hot key's rows spread over ``salt``
shuffle partitions instead of one straggler task.

Invariants:

  * The RESULT is exactly the plain equi-join — salt assignment only
    moves rows between partitions, never changes matches. The oracle is
    therefore the unsalted join.
  * The salt is a pure function of the left row's join-key hash PLUS a
    disambiguator column (pick a high-cardinality one, e.g. the fact
    PK). A rand()-based salt would also be correct but not reproducible.
  * ``how`` supports inner and left (each left row carries exactly one
    salt, so left-join null-extension still emits exactly one row).

Cost model: right side shuffles salt× its size. Use when
|right| * salt << |left|'s hot-key partition skew — the classic
medium-dimension regime between "broadcast it" and "let AQE split".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt: int = 8,
    disambig: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``keys`` with the hot-key
    shuffle spread across ``salt`` sub-partitions. ``disambig`` names a
    left column of high cardinality that decorrelates the salt from the
    join key (default: all left columns)."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")
    if not keys:
        raise ValueError("keys must be non-empty")
    dis = [F.col(disambig)] if disambig else [F.col(c) for c in left.columns]
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*dis, F.lit("salt")), F.lit(salt)).cast("int")
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, keys + ["_salt"], how)
    return out.drop("_salt")
