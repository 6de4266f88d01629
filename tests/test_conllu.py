"""CoNLL-U source tests — reference parser semantics
(/root/reference/src/utils/process_input_file.py:26-86): 3-field lines
only, blank-line sentence boundaries, order-preserving batch merge."""

import pytest

from pg_iui_ner_api_spark.sources import conllu as C

SAMPLE = """\
1\tAlice\tB-PER
2\tworks\tO
3\tat\tO
4\tAcme\tB-ORG

1\tmalformed line without tabs
2\tBerlin\tB-LOC
3\tis\tO
4\tnice\tO

1\tshort\tO
"""


@pytest.fixture()
def sample_path(tmp_path):
    p = tmp_path / "sample.conllu"
    p.write_text(SAMPLE)
    return str(p)


def test_sentences_parse(spark, sample_path):
    rows = sorted(
        C.read_conllu(spark, sample_path).collect(), key=lambda r: r["sentence_id"]
    )
    assert len(rows) == 3
    assert rows[0]["tokens"] == ["Alice", "works", "at", "Acme"]
    # label ids per reference vocabulary (B-PER=1, O=0, B-ORG=3)
    assert rows[0]["ner_tags"] == [1, 0, 0, 3]
    # malformed line silently dropped (reference line 53)
    assert rows[1]["tokens"] == ["Berlin", "is", "nice"]
    assert rows[1]["ner_tags"] == [5, 0, 0]
    assert rows[2]["tokens"] == ["short"]


def test_unknown_label_maps_to_O(spark, tmp_path):
    p = tmp_path / "bad.conllu"
    p.write_text("1\tfoo\tB-WEIRD\n")
    rows = C.read_conllu(spark, str(p)).collect()
    assert rows[0]["ner_tags"] == [0]


def test_batch_merge_preserves_order(spark, sample_path):
    sents = C.read_conllu(spark, sample_path)
    batches = C.merge_batches(sents, batch_size=2).collect()
    by_batch = {int(b["batch"]): b for b in batches}
    assert by_batch[0]["tokens"][0][0] == "Alice"
    assert by_batch[0]["tokens"][1][0] == "Berlin"
    assert by_batch[1]["tokens"][0][0] == "short"
