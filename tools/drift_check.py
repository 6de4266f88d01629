"""r4 VERDICT item #8: confirm the r4 per-query time drifts were host
noise, not plan regressions.

Probe-bracketed best-of-3 rerun of the queries whose BENCH_r04 times
drifted 1.3-1.9x vs r3, compared against their r3 times. Prints one
JSON line: per-query {r3, r4, now} seconds plus the same-minute host
ceiling probes, and a verdict per query (within 1.2x of r3 or not).

Usage: python tools/drift_check.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["scan_project", "join_agg", "kg_edges", "minhash_pairs", "topk",
           "anti_join"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__ as E
    from bench import _noop_write, cpu_probe
    from pg_iui_ner_api_spark.session import get_spark

    hist = {}
    for rnd in ("BENCH_r03.json", "BENCH_r04.json"):
        try:
            d = json.load(open(os.path.join(os.path.dirname(__file__), "..", rnd)))
            d = d.get("parsed", d)
            hist[rnd[:9]] = d.get("queries", {})
        except Exception:
            hist[rnd[:9]] = {}

    spark = get_spark(app_name="drift", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def ceiling() -> float:
        p8, p32 = cpu_probe(8), cpu_probe(32)
        return round((p32 / p8) / 4.0, 4)

    out = {"sf": sf_dir, "probes": [ceiling()], "queries": {}}
    for name in QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            _noop_write(qs[name](spark, sf_dir))
            runs.append(round(time.monotonic() - t0, 3))
        r3 = hist.get("BENCH_r03", {}).get(name)
        r4 = hist.get("BENCH_r04", {}).get(name)
        now = min(runs)
        out["queries"][name] = {
            "r3": r3, "r4": r4, "now": now, "runs": runs,
            "within_1_2x_of_r3": bool(r3 is not None and now <= 1.2 * r3),
        }
    out["probes"].append(ceiling())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
