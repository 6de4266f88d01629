"""Deterministic synthetic interleaved-document corpus + ground truth.

The BASELINE.json input_hint mandates a corpus of shape
``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.
No external data is allowed, so this module synthesizes it: seeded,
wall-clock-free, and **a pure function of the doc index** — doc ``i`` is
byte-identical no matter the partitioning, scale factor, or parallelism.
That property is what makes the two-parallelism scaling bench (local[8]
vs local[32] on the same input) and the kill/resume test meaningful.

Text spans are built from templates over a fixed gazetteer
(PER/ORG/LOC/MISC — the reference's 4 entity kinds,
/root/reference/src/utils/models_utils.py:6-16), so ground-truth
mentions AND (subj, pred, obj) triples are known by construction; the
triple-parity harness (P/R >= 0.95, BASELINE.json) scores against them.

Scale note: generation runs as ``mapInPandas`` over ``spark.range`` —
embarrassingly parallel, no shuffle, no driver materialization — so the
same generator produces the 10^12-doc corpus on a real cluster.
"""

from __future__ import annotations

import random
import zlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np

from . import schema as S

EMB_DIM = 64  # fixed-vocabulary BoW space (padded); see embed_text.

# ---------------------------------------------------------------------------
# Gazetteer: entity_id -> (kind, canonical_name, aliases, context hint words)
# The context hint is what our deterministic stand-in "encoder" keys on to
# disambiguate ambiguous aliases (e.g. 'Phoenix' city vs company) — the role
# the dense-embedding rerank plays in the north_star pipeline.
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Entity:
    entity_id: str
    kind: str
    canonical_name: str
    aliases: tuple[str, ...]
    context: str  # disambiguating descriptor words


GAZETTEER: tuple[Entity, ...] = (
    Entity("PER:marie_curie", "PER", "Marie Curie", ("Marie Curie", "Curie"), "person scientist"),
    Entity("PER:alan_turing", "PER", "Alan Turing", ("Alan Turing", "Turing"), "person mathematician"),
    Entity("PER:ada_lovelace", "PER", "Ada Lovelace", ("Ada Lovelace", "Lovelace"), "person countess"),
    Entity("PER:grace_hopper", "PER", "Grace Hopper", ("Grace Hopper", "Hopper"), "person admiral"),
    Entity("PER:jan_kowalski", "PER", "Jan Kowalski", ("Jan Kowalski", "Kowalski"), "person engineer"),
    Entity("ORG:acme", "ORG", "Acme Corp", ("Acme Corp", "Acme"), "company manufacturer"),
    Entity("ORG:globex", "ORG", "Globex", ("Globex",), "company conglomerate"),
    Entity("ORG:initech", "ORG", "Initech", ("Initech",), "company software"),
    Entity("ORG:umbrella", "ORG", "Umbrella Group", ("Umbrella Group", "Umbrella"), "company pharma"),
    Entity("ORG:phoenix_sys", "ORG", "Phoenix Systems", ("Phoenix Systems", "Phoenix"), "company startup"),
    Entity("LOC:paris", "LOC", "Paris", ("Paris",), "city capital"),
    Entity("LOC:warsaw", "LOC", "Warsaw", ("Warsaw",), "city capital"),
    Entity("LOC:berlin", "LOC", "Berlin", ("Berlin",), "city capital"),
    Entity("LOC:new_york", "LOC", "New York", ("New York", "NYC"), "city metropolis"),
    Entity("LOC:phoenix_az", "LOC", "Phoenix", ("Phoenix",), "city desert"),
    Entity("MISC:nobel_prize", "MISC", "Nobel Prize", ("Nobel Prize",), "award prize"),
    Entity("MISC:olympics", "MISC", "Olympics", ("Olympics",), "games event"),
    Entity("MISC:world_cup", "MISC", "World Cup", ("World Cup",), "tournament event"),
)

ENTITY_BY_ID = {e.entity_id: e for e in GAZETTEER}

# alias -> list[(entity_id, prior)] ; priors sum to 1 per alias.
# 'Phoenix' is deliberately ambiguous (LOC city vs ORG company): the
# embedding rerank must resolve it from sentence context.
def alias_table() -> list[tuple[str, str, str, str, float]]:
    """Rows (alias, entity_id, kind, canonical_name, prior)."""
    from collections import defaultdict

    holders: dict[str, list[Entity]] = defaultdict(list)
    for e in GAZETTEER:
        for a in e.aliases:
            holders[a].append(e)
    rows = []
    for alias, ents in sorted(holders.items()):
        for e in ents:
            # deterministic prior: full-name alias outranks short alias;
            # among ambiguous holders, LOC slightly preferred (tests that
            # rerank can overturn the prior).
            base = 0.9 if alias == e.canonical_name else 0.5
            if len(ents) > 1:
                base = 0.6 if e.kind == "LOC" else 0.4
            rows.append((alias, e.entity_id, e.kind, e.canonical_name, base))
    return rows


# Tagging model view of the gazetteer: for ambiguous aliases the tagger
# (stand-in for the NER model, which only predicts a BIO tag) assigns the
# highest-prior holder's kind; linking may later relink to the other entity.
def tagger_lexicon() -> dict[str, tuple[str, float]]:
    """alias -> (entity_group, deterministic pseudo-score in [0.5, 1))."""
    best: dict[str, tuple[str, float]] = {}
    for alias, _eid, kind, _cn, prior in alias_table():
        score = 0.5 + (zlib.crc32(alias.encode()) % 500) / 1000.0
        if alias not in best or prior > best[alias][1]:
            best[alias] = (kind, prior)
    return {a: (k, 0.5 + (zlib.crc32(a.encode()) % 500) / 1000.0) for a, (k, _p) in best.items()}


# Predicate lexicon: surface phrase -> predicate id. Subject = nearest
# linked mention left of the phrase in the same sentence; object = nearest
# right. The synthesizer only ever emits these phrases in template slots,
# so ground truth is exact.
PRED_LEXICON = {
    "works for": "works_for",
    "is located in": "located_in",
    "met": "met",
    "won the": "won",
    "acquired": "acquired",
}

FILLERS = (
    "The quarterly report was filed on time.",
    "Nothing unusual happened during the audit.",
    "Weather stayed calm for the whole week.",
    "The committee adjourned without a vote.",
)

_PERS = [e for e in GAZETTEER if e.kind == "PER"]
_ORGS = [e for e in GAZETTEER if e.kind == "ORG"]
_LOCS = [e for e in GAZETTEER if e.kind == "LOC"]
_MISCS = [e for e in GAZETTEER if e.kind == "MISC"]


def _pick(rng: random.Random, pool: list[Entity], hub_bias: bool = False) -> Entity:
    # ~35% of ORG picks land on Acme: a deliberate hub entity so the
    # linking/self-join stages see realistic key skew (AQE skew-join path).
    if hub_bias and pool is _ORGS and rng.random() < 0.35:
        return ENTITY_BY_ID["ORG:acme"]
    return pool[rng.randrange(len(pool))]


def _alias(rng: random.Random, e: Entity) -> str:
    return e.aliases[rng.randrange(len(e.aliases))]


def gen_sentences(rng: random.Random) -> tuple[str, list[tuple[str, str, str]]]:
    """One template sentence -> (text, ground-truth triples)."""
    t = rng.randrange(7)
    if t == 0:
        p, o = _pick(rng, _PERS), _pick(rng, _ORGS, hub_bias=True)
        # context word ("company"/"startup"...) feeds the embedding rerank
        ctx = o.context.split()[0]
        return (
            f"{_alias(rng, p)} works for {_alias(rng, o)}, the {ctx}.",
            [(p.entity_id, "works_for", o.entity_id)],
        )
    if t == 1:
        o, l = _pick(rng, _ORGS, hub_bias=True), _pick(rng, _LOCS)
        ctx = o.context.split()[0]
        return (
            f"{_alias(rng, o)}, the {ctx}, is located in {_alias(rng, l)}.",
            [(o.entity_id, "located_in", l.entity_id)],
        )
    if t == 2:
        p1, p2 = _pick(rng, _PERS), _pick(rng, _PERS)
        while p2.entity_id == p1.entity_id:
            p2 = _pick(rng, _PERS)
        return (
            f"{_alias(rng, p1)} met {_alias(rng, p2)} yesterday.",
            [(p1.entity_id, "met", p2.entity_id)],
        )
    if t == 3:
        p, m = _pick(rng, _PERS), _pick(rng, _MISCS)
        return (
            f"{_alias(rng, p)} won the {_alias(rng, m)} last year.",
            [(p.entity_id, "won", m.entity_id)],
        )
    if t == 4:
        o1, o2 = _pick(rng, _ORGS, hub_bias=True), _pick(rng, _ORGS)
        while o2.entity_id == o1.entity_id:
            o2 = _pick(rng, _ORGS)
        ctx1, ctx2 = o1.context.split()[0], o2.context.split()[0]
        return (
            f"The {ctx1} {_alias(rng, o1)} acquired {_alias(rng, o2)}, the {ctx2}.",
            [(o1.entity_id, "acquired", o2.entity_id)],
        )
    return FILLERS[rng.randrange(len(FILLERS))], []


def gen_doc(i: int, seed: int = 42) -> tuple[dict, list[tuple[str, str, str, str]]]:
    """Generate doc ``i`` deterministically.

    Returns (document row dict, list of (doc_id, subj, pred, obj)).
    Pure function of (i, seed): safe under any partitioning.
    """
    rng = random.Random((seed << 32) ^ i)
    doc_id = f"doc{i:010d}"
    n_spans = 2 + rng.randrange(5)
    spans, triples = [], []
    offset = 0
    for si in range(n_spans):
        if rng.random() < 0.25:
            kind = "image" if rng.random() < 0.6 else "audio"
            spans.append(
                {
                    "kind": kind,
                    "text": "",
                    "media_ref": f"media://{doc_id}/{si}",
                    "offset": offset,
                }
            )
            offset += 1  # U+FFFC placeholder char in the virtual document
        else:
            n_sent = 1 + rng.randrange(3)
            parts = []
            for _ in range(n_sent):
                text, tr = gen_sentences(rng)
                parts.append(text)
                triples.extend((doc_id, s, p, o) for s, p, o in tr)
            text = " ".join(parts)
            spans.append({"kind": "text", "text": text, "media_ref": None, "offset": offset})
            offset += len(text)
    return {"doc_id": doc_id, "spans": spans}, triples


# ---------------------------------------------------------------------------
# Deterministic stand-in "context encoder": bag-of-words over the CLOSED
# entity-descriptor vocabulary (canonical-name tokens + context-descriptor
# tokens), exact token->index mapping, L2-normed. No hashing: hashed-BoW
# at small dims produced bucket collisions ('city'~'located' at crc32%128)
# that flipped the ambiguous-alias rerank nondeterministically w.r.t.
# vocabulary growth. Out-of-vocabulary tokens contribute nothing — the
# rerank keys purely on descriptor overlap, which is the property the
# entity-link stage needs from a real encoder.
# ---------------------------------------------------------------------------
import re as _re

_TOK = _re.compile(r"\w+", _re.UNICODE)


def _build_vocab() -> dict[str, int]:
    toks: set[str] = set()
    for e in GAZETTEER:
        toks |= set(_TOK.findall(f"{e.canonical_name} {e.context}".lower()))
    ordered = sorted(toks)
    assert len(ordered) <= EMB_DIM, "grow EMB_DIM with the gazetteer"
    return {t: i for i, t in enumerate(ordered)}

VOCAB = _build_vocab()


def embed_text(text: str) -> np.ndarray:
    v = np.zeros(EMB_DIM, dtype=np.float64)
    for tok in _TOK.findall(text.lower()):
        i = VOCAB.get(tok)
        if i is not None:
            v[i] += 1.0
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def entity_embeddings() -> list[tuple[str, list[float]]]:
    return [
        (e.entity_id, embed_text(f"{e.canonical_name} {e.context}").tolist())
        for e in GAZETTEER
    ]


# ---------------------------------------------------------------------------
# Spark-side distributed generation (no driver materialization, no shuffle).
# ---------------------------------------------------------------------------
def synth_documents(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed corpus: mapInPandas over spark.range — scales linearly."""
    import pandas as pd

    rng_seed = seed

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [gen_doc(int(i), rng_seed)[0] for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r["doc_id"] for r in rows], "spans": [r["spans"] for r in rows]}
            )

    base = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return base.mapInPandas(gen, schema=S.DOCUMENTS)


def synth_truth_triples(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed ground-truth triples for the same corpus."""
    import pandas as pd

    rng_seed = seed

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            recs = []
            for i in pdf["id"]:
                _, tr = gen_doc(int(i), rng_seed)
                recs.extend(tr)
            yield pd.DataFrame(recs, columns=["doc_id", "subj", "pred", "obj"])

    base = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return base.mapInPandas(gen, schema="doc_id string, subj string, pred string, obj string")


def _sql_lit(v) -> str:
    """Render a Python value as a SQL literal (strings, numbers, float lists)."""
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(f"CAST({float(x)!r} AS FLOAT)" for x in v) + ")"
    if isinstance(v, float):
        return repr(v) + "D"
    return str(v)


def local_dim_df(spark, rows, colnames: list[str]):
    """Small dimension table as a pure-JVM LocalRelation (VALUES literal).

    ``spark.createDataFrame(list)`` builds a Python-RDD-backed plan
    (applySchemaToPythonRDD) whose every materialization — notably the
    collect step of a BroadcastExchange — launches Python worker tasks;
    measured at 30-60 s per broadcast under local mode. A VALUES literal
    is a LocalRelation: broadcast collect is instant and the dim
    participates in constant folding. Always use this for dims.
    """
    values = ",".join("(" + ",".join(_sql_lit(v) for v in r) + ")" for r in rows)
    cols = ",".join(colnames)
    return spark.sql(f"SELECT * FROM VALUES {values} AS t({cols})")


def alias_df(spark):
    """Small alias dimension — broadcast side of the candidate-gen join (J3)."""
    return local_dim_df(
        spark, alias_table(), ["alias", "entity_id", "kind", "canonical_name", "prior"]
    )


def entity_emb_df(spark):
    return local_dim_df(spark, entity_embeddings(), ["entity_id", "emb"])
