"""Entity-linking tests: broadcast candidate gen + embedding rerank,
including the ambiguous-alias case the rerank exists for."""

import pyspark.sql.functions as F

from pg_iui_ner_api_spark import synth
from pg_iui_ner_api_spark.operators import linking, ner


def _linked_for_texts(spark, texts):
    docs = spark.createDataFrame(
        [
            {
                "doc_id": f"t{i}",
                "spans": [{"kind": "text", "text": t, "media_ref": None, "offset": 0}],
            }
            for i, t in enumerate(texts)
        ],
        schema=__import__("pg_iui_ner_api_spark.schema", fromlist=["DOCUMENTS"]).DOCUMENTS,
    )
    mentions = ner.mentions_of(ner.extract(docs))
    return linking.link_mentions(mentions, synth.alias_df(spark), synth.entity_emb_df(spark))


def test_ambiguous_alias_resolved_by_context(spark):
    linked = _linked_for_texts(
        spark,
        [
            "Hopper works for Phoenix, the company.",       # -> ORG
            "Acme Corp, the company, is located in Phoenix.",  # -> LOC
        ],
    ).collect()
    by_doc = {}
    for r in linked:
        by_doc.setdefault(r["doc_id"], {})[r["word"]] = r["entity_id"]
    assert by_doc["t0"]["Phoenix"] == "ORG:phoenix_sys"
    assert by_doc["t1"]["Phoenix"] == "LOC:phoenix_az"


def test_every_gazetteer_alias_links_to_itself(spark):
    rows = synth.alias_table()
    texts = [f"{alias} works for Initech, the company." for alias, *_ in rows]
    linked = _linked_for_texts(spark, texts).collect()
    # every doc has >= 1 linked mention; surfaces link to a holder of
    # that alias
    holders = {}
    for alias, eid, *_ in rows:
        holders.setdefault(alias.lower(), set()).add(eid)
    assert len({r["doc_id"] for r in linked}) == len(texts)
    for r in linked:
        assert r["entity_id"] in holders[r["word"].lower()], r


def test_unknown_surface_is_dropped(spark):
    linked = _linked_for_texts(spark, ["Bob works for Nobody Inc."])
    assert linked.where(F.col("word").isin("Bob", "Nobody Inc.")).count() == 0


def test_rerank_is_arrow_vectorized(spark):
    # guard: the rerank must be Arrow-batched (ArrowEvalPython), never a
    # row-at-a-time Python UDF (BatchEvalPython) — the north_star's
    # "dense-embedding rerank in Arrow batches, no per-row Python"
    linked = _linked_for_texts(spark, ["Hopper works for Phoenix, the company."])
    plan = linked._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BatchEvalPython") == 0
    assert plan.count("ArrowEvalPython") == 1


def test_decomposed_api_matches_map_only_path(spark):
    """candidates() + rerank() + links() (the decomposed round-1 API,
    kept public) must agree with the map-only link_mentions on
    (mention_id -> entity_id, link_score)."""
    texts = [
        "Hopper works for Phoenix, the company.",
        "Acme Corp, the company, is located in Phoenix.",
        "Globex hired Turing in Paris.",
    ]
    docs = spark.createDataFrame(
        [
            {
                "doc_id": f"t{i}",
                "spans": [{"kind": "text", "text": t, "media_ref": None, "offset": 0}],
            }
            for i, t in enumerate(texts)
        ],
        schema=__import__("pg_iui_ner_api_spark.schema", fromlist=["DOCUMENTS"]).DOCUMENTS,
    )
    mentions = ner.mentions_of(ner.extract(docs))
    alias, embs = synth.alias_df(spark), synth.entity_emb_df(spark)
    fused = {
        r["mention_id"]: (r["entity_id"], round(r["link_score"], 9))
        for r in linking.link_mentions(mentions, alias, embs).collect()
    }
    scored = linking.rerank(
        linking.candidates(mentions.select("mention_id", "word", "ctx"), alias), embs
    )
    decomposed = {
        r["mention_id"]: (r["entity_id"], round(r["link_score"], 9))
        for r in linking.links(scored).collect()
    }
    assert fused == decomposed and fused
