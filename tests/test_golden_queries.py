"""Hard oracles for the driver queries registered WITHOUT a DuckDB twin
(``oracle_sql`` omits them, so CORRECTNESS_r*.json records rows-only).

Each is checked against a committed golden (row count + sorted-row
content sha256) computed over the same deterministic inputs the driver
uses (synth corpus for kg_*/media_*, /root/testdata/sf0.01 for ann_*).
Regenerate goldens only via ``python tools/goldens.py`` after an
INTENDED semantics change — see tools/goldens.py for the digest
contract.
"""

import json
import os

import pytest

from tools.goldens import GOLDEN_PATH, GOLDEN_QUERIES, GOLDEN_SF_DIR, golden_digest


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def entry_queries():
    import __spark_entry__ as E

    return E.queries()


needs_sf001 = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_SF_DIR), reason=f"{GOLDEN_SF_DIR} absent"
)


@needs_sf001
@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden(name, spark, goldens, entry_queries):
    got = golden_digest(entry_queries[name](spark, GOLDEN_SF_DIR))
    want = goldens[name]
    assert got["rows"] == want["rows"], f"{name}: row count drifted"
    assert got["columns"] == want["columns"], f"{name}: schema drifted"
    assert got["sha256"] == want["sha256"], (
        f"{name}: content hash drifted — if the semantics change is "
        f"intended, regenerate via `python tools/goldens.py`"
    )
