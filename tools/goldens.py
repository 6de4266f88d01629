"""Golden row-count + content-hash oracles for the driver queries that
have no DuckDB twin (``oracle_sql`` omits them): the KG pipeline slices
over the deterministic synth corpus, the media plumbing, and the
approximate-by-construction IVF variants.

The synth corpus is seeded and wall-clock-free (SURVEY.md §7 step 0),
and every float the queries emit is rounded before hashing, so the
digest is stable across partition counts, thread counts and JVMs —
which is what lets a committed hash serve as a hard oracle.

Digest contract (mirrors the driver's compare in tools/check_entry.py):
columns sorted by NAME, each value canonicalized (floats rounded,
nested arrays/structs recursed, None -> "NULL"), rows sorted by their
string form, sha256 over the joined lines.

Regenerate ONLY via::

    python tools/goldens.py          # rewrites tests/goldens/golden_queries.json

after an INTENDED semantics change — the point of the committed file is
that unintended changes fail tests/test_golden_queries.py.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the driver's correctness gate runs at sf0.01; goldens pin the same
# input so the pytest oracle certifies exactly what the driver runs
GOLDEN_SF_DIR = "/root/testdata/sf0.01"
GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "golden_queries.json",
)
# every query the driver records as rows-only (err: no_oracle)
GOLDEN_QUERIES = (
    "kg_mentions", "kg_edges", "kg_nodes", "kg_edges_canonical",
    "kg_distant_pairs",
    "media_features", "media_resize",
    "ann_ivf", "ann_ivf_trained", "ann_pq",
    "bpe_merges", "bpe_token_count",
)
FLOAT_ROUND = 4


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        r = round(v, FLOAT_ROUND)
        return "0.0" if r == 0 else repr(r)  # fold -0.0
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "asDict"):  # Row / struct
        d = v.asDict()
        return "{" + ",".join(f"{k}:{_canon(d[k])}" for k in sorted(d)) + "}"
    return str(v)


def golden_digest(df) -> dict:
    """(row count, sha256) of a DataFrame under the canonical ordering."""
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    lines = sorted("|".join(_canon(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return {"rows": len(rows), "columns": cols, "sha256": h}


def compute_all(spark) -> dict[str, dict]:
    import __spark_entry__ as E

    qs = E.queries()
    return {name: golden_digest(qs[name](spark, GOLDEN_SF_DIR))
            for name in GOLDEN_QUERIES}


def main() -> None:
    from pg_iui_ner_api_spark.session import get_spark

    spark = get_spark(app_name="regen-goldens", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    got = compute_all(spark)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(got, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {GOLDEN_PATH}")
    for k, v in got.items():
        print(f"  {k}: rows={v['rows']} sha256={v['sha256'][:16]}…")
    spark.stop()


if __name__ == "__main__":
    main()
