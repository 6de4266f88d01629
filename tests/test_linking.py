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


def test_fuzzy_candidates_recover_typo_surfaces(spark):
    """'Acm' (typo) must reach the Acme entity through the fuzzy path
    with match_dist=1 and a discounted prior; exact surfaces must be
    untouched (match_dist=0, full prior); unrelated words still miss."""
    from pg_iui_ner_api_spark import synth as S

    aliases = S.alias_df(spark)
    some_alias = S.alias_table()[0][0]           # a real gazetteer surface
    typo = some_alias[:-1] if len(some_alias) > 2 else some_alias + "x"
    mentions = spark.createDataFrame(
        [
            (0, some_alias, "ctx a"),
            (1, typo, "ctx b"),
            (2, "zzzzqqqq", "ctx c"),
        ],
        "mention_id long, word string, ctx string",
    )
    got = linking.fuzzy_candidates(mentions, aliases).collect()
    by_m = {}
    for r in got:
        by_m.setdefault(r["mention_id"], []).append(r)
    assert all(r["match_dist"] == 0 for r in by_m[0])
    assert 1 in by_m and all(r["match_dist"] == 1 for r in by_m[1])
    # the typo reaches at least one holder of the original alias
    holders = {eid for a, eid, *_ in S.alias_table() if a == some_alias}
    assert holders & {r["entity_id"] for r in by_m[1]}
    # fuzzy priors are discounted relative to the exact row's prior
    exact_prior = {r["entity_id"]: r["prior"] for r in by_m[0]}
    for r in by_m[1]:
        if r["entity_id"] in exact_prior:
            assert r["prior"] == exact_prior[r["entity_id"]] * 0.5
    assert 2 not in by_m
    # no duplicate (mention, entity) pairs from shared deletion variants
    for rs in by_m.values():
        eids = [r["entity_id"] for r in rs]
        assert len(eids) == len(set(eids))
