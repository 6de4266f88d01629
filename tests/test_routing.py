"""Per-language model routing tests (reference config.py:14-15 /
tools.py:21-40: one NER model per language, picked per request)."""

import pytest
from pyspark.sql import functions as F

from pg_iui_ner_api_spark.operators import routing as R
from pg_iui_ner_api_spark.operators.tagger import GazetteerTagger


def _docs(spark):
    rows = [
        ("d-en", "en", [("text", "Acme opened. Wawel stands.", None, 0)]),
        ("d-pl", "pl", [("text", "Acme opened. Wawel stands.", None, 0)]),
        ("d-de", "de", [("text", "Acme opened. Wawel stands.", None, 0)]),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, lang string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_route_documents_broadcast_join(spark):
    routed = R.route_documents(_docs(spark), R.default_routing_df(spark))
    got = {r["doc_id"]: r["model_path"] for r in routed.collect()}
    assert got == {
        "d-en": "models/roberta_eng",
        "d-pl": "models/roberta_pl",
        "d-de": "models/roberta_eng",  # unrouted lang -> English fallback
    }


def test_routing_dim_follows_registry(spark, tmp_path):
    """A registry UPDATE (newly trained model path) re-routes."""
    from pg_iui_ner_api_spark.sources.registry import bootstrap_model_registry

    reg = bootstrap_model_registry(spark, str(tmp_path))
    reg.update("base_model", "roberta_pl", {"file_path": "models/roberta_pl_v2"})
    routing = R.model_routing_df(spark, reg.read())
    got = {r["lang"]: r["model_path"] for r in routing.collect()}
    assert got == {"en": "models/roberta_eng", "pl": "models/roberta_pl_v2"}


def test_extract_routed_uses_per_language_tagger(spark):
    """Each doc's text is tagged by the model its lang routes to: the
    factory hands out language-specific lexicons, so which alias is
    found proves which tagger ran."""
    lex_en = {"Acme": ("ORG", 0.9)}
    lex_pl = {"Wawel": ("LOC", 0.9)}

    def factory(model_path):
        return GazetteerTagger(lex_pl if "roberta_pl" in model_path else lex_en)

    out = R.extract_routed(_docs(spark), R.default_routing_df(spark),
                           tagger_factory=factory)
    mentions = out.where(F.col("row_kind") == "mention")
    got = {(r["doc_id"], r["word"]) for r in mentions.collect()}
    assert got == {
        ("d-en", "Acme"),   # en model: only the en lexicon matches
        ("d-pl", "Wawel"),  # pl model: only the pl lexicon matches
        ("d-de", "Acme"),   # fallback routes de to the en model
    }


def test_route_join_is_broadcast(spark):
    routed = R.route_documents(_docs(spark), R.default_routing_df(spark))
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
