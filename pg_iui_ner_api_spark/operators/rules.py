"""Horn-rule mining over the constructed knowledge graph (AMIE-lite).

The reference pipeline's end product is a (subj, pred, obj) triple
table (/root/reference/src/routers/main_endpoints.py emits per-document
entity rows; ``operators/triples.py`` assembles them into edges). The
canonical next step of KG *construction* — after extraction, linking,
canonicalization and fusion — is mining the regularities the graph
itself implies: closed Horn rules of the form

    p1(x, z)  AND  p2(z, y)   ==>   head(x, y)

with their support / confidence / head-coverage statistics (Galarraga
et al., "AMIE: Association Rule Mining under Incomplete Evidence in
Ontological Knowledge Bases", WWW 2013 — the public algorithm this
module re-expresses as DataFrame algebra; we mine the 2-atom path shape,
which is AMIE's workhorse rule class). Mined rules drive KG completion
(predict missing edges) and error detection (an edge contradicting a
conf~1.0 rule is suspect — the same role ``fusion.functional_violations``
plays for functional predicates).

Definitions (matching AMIE, on the DISTINCT triple set):

  * body pair  — an (x, y) entity pair with SOME z s.t. p1(x,z), p2(z,y);
  * support    — # distinct body pairs (x, y) with head(x, y) also a triple;
  * n_body     — # distinct body pairs for (p1, p2);
  * n_head     — # distinct (s, o) pairs of the head predicate;
  * confidence = support / n_body   (standard CWA confidence);
  * head_coverage = support / n_head.

Scale shape (the point of the implementation):

  * The path join pivots on the MIDDLE entity z — inherently
    sum(in(z) * out(z)), so a celebrity entity with 10^6 in- and
    out-edges would emit 10^12 grounded paths. Same hub contract as
    ``cooccurrence_edges`` / ``adamic_adar``: ``max_mid_degree`` caps
    the pivot, and :func:`rule_mid_dropped` reports exactly which
    entities were excluded (never silently). A dropped hub stops
    acting as a JOIN-THROUGH variable; triples touching it still
    count in every head/body marginal they ground directly.
  * Predicates are vocabulary-sized, entities corpus-sized — so every
    aggregation keyed by predicate ends tiny, and the only large
    shuffles are (a) the path join, hash-partitioned on z, and (b) the
    body-pair distinct, a partial-aggregable groupBy on
    (p1, p2, x, y). Shuffles carry 4 ids; never text, never payloads.
  * The support probe re-joins distinct body pairs against the triple
    table on (x, y) — co-partitioned with the distinct's output, and
    counts are exact (every surviving row is already unique).

Zero Python on the hot path; the registered query has a full DuckDB
oracle replaying the identical cap + distinct + join chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_hash64


def _distinct_triples(
    triples: DataFrame, s_col: str, p_col: str, o_col: str
) -> DataFrame:
    return triples.select(
        F.col(s_col).alias("s"), F.col(p_col).alias("p"), F.col(o_col).alias("o")
    ).distinct()


def _mid_degrees(t: DataFrame) -> DataFrame:
    """Total (in + out) distinct-edge degree per entity — the pivot-fan
    proxy the cap acts on. Computed over the DISTINCT triple set so a
    re-asserted triple never inflates a degree."""
    ends = t.select(F.col("s").alias("node")).unionAll(
        t.select(F.col("o").alias("node"))
    )
    return ends.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def prepare_triples(
    triples: DataFrame,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
) -> DataFrame:
    """Distinct ``(s, p, o)`` triple table, checkpointed. Build ONCE
    and pass to :func:`mine_path_rules` / :func:`predict_edges` with
    ``prepared=True`` when running both — sharing the scan + distinct
    halves the dominant cost of a mine-then-predict pipeline."""
    return _distinct_triples(triples, s_col, p_col, o_col).localCheckpoint()


def mine_path_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_conf: float = 0.1,
    max_mid_degree: int | None = None,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    prepared: bool = False,
    pair_sample_mod: int | None = None,
) -> DataFrame:
    """Mine 2-atom path rules ``p1(x,z) AND p2(z,y) => head(x,y)``.

    Returns ``(p1, p2, head, support, n_body, n_head, confidence,
    head_coverage)`` — one row per rule with ``support >= min_support``
    and ``confidence >= min_conf``; confidence / head_coverage are
    doubles rounded to 6 places (cross-engine float contract).

    ``max_mid_degree`` excludes entities whose total distinct-edge
    degree exceeds the cap from serving as the join-through variable z
    (see module docstring; report the exclusions with
    :func:`rule_mid_dropped`). n_body shrinks consistently with the
    capped path enumeration, so confidence stays a true ratio of the
    mined (capped) body universe.

    Counting internals run on 64-bit md5 hashes of the (x, y) entity
    pair, not the id strings — the body distinct is the dominant
    shuffle (tens of millions of rows on a dense graph region) and only
    ever feeds COUNTS, so the wire carries (p1, p2, 8B, 8B). Hash
    collisions (~2^-60 per pair) are accepted and identical in the
    DuckDB oracle, which replays the same hash — the repeated_spans
    contract.

    ``pair_sample_mod=k`` is the second scale lever (AMIE+'s
    approximate-confidence idea made deterministic): keep only body
    pairs whose (xh, yh) hash lands in the 1/k bucket, BEFORE the
    distinct — the dominant shuffle shrinks k-fold. support and n_body
    restrict to the SAME sampled pair universe (membership is a pure
    function of the pair), so confidence is the exact confidence of an
    unbiased 1/k pair sample; scale min_support accordingly. The filter
    is engine-portable, so sampled runs stay oracle-exact.
    """
    t = (
        triples
        if prepared
        else _distinct_triples(triples, s_col, p_col, o_col).localCheckpoint()
    )

    right = t.select(
        F.col("s").alias("z"), F.col("p").alias("p2"), F.col("o").alias("y")
    )
    if max_mid_degree is not None:
        ok_mid = _mid_degrees(t).filter(F.col("degree") <= max_mid_degree)
        # the degree join doubles as the cap: hub pivots vanish from the
        # right side before the path join fans out
        right = right.join(ok_mid.select(F.col("node").alias("z")), "z")
    left = t.select(
        F.col("s").alias("x"), F.col("p").alias("p1"), F.col("o").alias("z")
    )

    # grounded paths -> distinct body pairs: THE big shuffle, keyed
    # (p1, p2, xh, yh); partial-aggregable, hashes only
    hashed = left.join(right, "z").select(
        "p1",
        "p2",
        portable_hash64(F.col("x")).alias("xh"),
        portable_hash64(F.col("y")).alias("yh"),
    )
    if pair_sample_mod is not None:
        if pair_sample_mod < 1:
            raise ValueError("pair_sample_mod must be >= 1")
        # nested mods keep the sum in range under ANSI overflow checks;
        # xh/yh are non-negative by construction (15-hex-digit md5)
        m = int(pair_sample_mod)
        hashed = hashed.where(
            ((F.col("xh") % m) + (F.col("yh") % m)) % m == 0
        )
    body = (
        hashed.distinct()
        .localCheckpoint()  # consumed by n_body AND the support probe
    )
    n_body = body.groupBy("p1", "p2").agg(F.count(F.lit(1)).alias("n_body"))

    # support: body pairs that are also asserted head triples — inner
    # join on the hash pair, co-partitioned with the distinct above
    head = t.select(
        portable_hash64(F.col("s")).alias("xh"),
        F.col("p").alias("head"),
        portable_hash64(F.col("o")).alias("yh"),
    )
    support = (
        body.join(head, ["xh", "yh"])
        .groupBy("p1", "p2", "head")
        .agg(F.count(F.lit(1)).alias("support"))
    )

    n_head = t.groupBy(F.col("p").alias("head")).agg(
        F.count(F.lit(1)).alias("n_head")
    )

    out = (
        support.join(n_body, ["p1", "p2"])
        .join(n_head, "head")
        .select(
            "p1",
            "p2",
            "head",
            "support",
            "n_body",
            "n_head",
            F.round(
                F.col("support").cast("double") / F.col("n_body").cast("double"), 6
            ).alias("confidence"),
            F.round(
                F.col("support").cast("double") / F.col("n_head").cast("double"), 6
            ).alias("head_coverage"),
        )
    )
    return out.filter(
        (F.col("support") >= F.lit(int(min_support)))
        & (F.col("confidence") >= F.lit(float(min_conf)))
    )


def rule_mid_dropped(
    triples: DataFrame,
    max_mid_degree: int,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
) -> DataFrame:
    """The never-silent half of the :func:`mine_path_rules` cap
    contract: ``(node, degree)`` of every entity the cap excluded from
    the join-through position."""
    t = _distinct_triples(triples, s_col, p_col, o_col)
    return _mid_degrees(t).filter(F.col("degree") > max_mid_degree)


def predict_edges(
    triples: DataFrame,
    rules: DataFrame,
    min_conf: float = 0.5,
    max_mid_degree: int | None = None,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    prepared: bool = False,
) -> DataFrame:
    """KG completion: apply mined rules back to the graph and emit the
    head triples they predict but the KG does not assert —
    ``(subj, pred, obj, confidence)``, keeping each prediction's BEST
    supporting rule confidence (AMIE's max-aggregation for scoring
    candidate facts). The anti-join against the asserted triple set is
    what makes these *new* edges; a 100 TB run feeds them to human /
    model verification, not straight back into the KG.

    Grounding keeps the real id STRINGS (the predictions are the
    output), unlike the mining counts — so the broadcast rule join is
    what prunes the path fan before the max-aggregation.
    """
    t = (
        triples
        if prepared
        else _distinct_triples(triples, s_col, p_col, o_col).localCheckpoint()
    )
    right = t.select(
        F.col("s").alias("z"), F.col("p").alias("p2"), F.col("o").alias("y")
    )
    if max_mid_degree is not None:
        ok_mid = _mid_degrees(t).filter(F.col("degree") <= max_mid_degree)
        right = right.join(ok_mid.select(F.col("node").alias("z")), "z")
    left = t.select(
        F.col("s").alias("x"), F.col("p").alias("p1"), F.col("o").alias("z")
    )
    r = rules.filter(F.col("confidence") >= F.lit(float(min_conf))).select(
        "p1", "p2", "head", "confidence"
    )
    # rules are a vocabulary-sized dim: broadcast; the path join stays
    # the only large shuffle
    grounded = (
        left.join(right, "z")
        .join(F.broadcast(r), ["p1", "p2"])
        .select(
            F.col("x").alias("s"),
            F.col("head").alias("p"),
            F.col("y").alias("o"),
            "confidence",
        )
        .groupBy("s", "p", "o")
        .agg(F.max("confidence").alias("confidence"))
    )
    return grounded.join(t, ["s", "p", "o"], "left_anti").select(
        F.col("s").alias(s_col),
        F.col("p").alias(p_col),
        F.col("o").alias(o_col),
        "confidence",
    )


def schema_induction(
    triples: DataFrame,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    type_sep: str = ":",
) -> DataFrame:
    """Induce the KG's type-level schema graph: ``(subj_type, pred,
    obj_type, n_triples, n_subjects, n_objects)`` — one row per observed
    (domain, predicate, range) combination, with usage counts and
    per-side distinct-entity counts. Entity types are the id namespace
    prefix (the engine's ids are ``TYPE:name`` — pipeline output and the
    FK-derived corpus alike).

    This is the ontology-usage summary KG curation gates on: a predicate
    spanning two domain types is either polymorphism or a linking bug
    (the type-level twin of ``fusion.functional_violations``), and the
    counts feed rule-mining priors. ONE partial-aggregable groupBy on
    (type, pred, type) — vocabulary-sized output regardless of corpus
    size; distinct-entity counts ride the same shuffle as count
    distincts.
    """
    t = _distinct_triples(triples, s_col, p_col, o_col)
    styp = F.split(F.col("s"), type_sep).getItem(0)
    otyp = F.split(F.col("o"), type_sep).getItem(0)
    return (
        t.select(
            styp.alias("subj_type"),
            F.col("p").alias("pred"),
            otyp.alias("obj_type"),
            "s",
            "o",
        )
        .groupBy("subj_type", "pred", "obj_type")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("s").alias("n_subjects"),
            F.countDistinct("o").alias("n_objects"),
        )
    )
