"""Pure-Python reference-semantics oracle — INDEPENDENT of the engine.

Re-implements, row-at-a-time (the way the reference service works,
/root/reference/src/routers/main_endpoints.py:118-178), what the Spark
pipeline computes distributed: NER span extraction with HF-"simple"
aggregation semantics, entity linking with context rerank, and
nearest-left/nearest-right triple assembly. Deliberately uses different
algorithms (per-alias scanning with a taken-mask instead of one
alternation regex; explicit loops instead of joins) so agreement with
the engine is evidence, not tautology.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from pg_iui_ner_api_spark.synth import (
    GAZETTEER,
    PRED_LEXICON,
    alias_table,
    embed_text,
    entity_embeddings,
)

CTX_WINDOW = 20
SENT_RE = re.compile(r"(?<=[.!?])\s+")
TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
MAX_LEN = 512

_ALIASES = sorted({a for a, *_ in alias_table()}, key=len, reverse=True)
_ALIAS_HOLDERS: dict[str, list[tuple[str, str, str, float]]] = {}
for _a, _eid, _kind, _cn, _prior in alias_table():
    _ALIAS_HOLDERS.setdefault(_a, []).append((_eid, _kind, _cn, _prior))
_EMB = {eid: np.array(v) for eid, v in entity_embeddings()}


def _score(alias: str) -> float:
    return float(np.float32(0.5 + (zlib.crc32(alias.encode()) % 500) / 1000.0))


def _tag_group(alias: str) -> str:
    holders = _ALIAS_HOLDERS[alias]
    return max(holders, key=lambda h: h[3])[1]  # highest-prior holder's kind


def oracle_mentions(text: str) -> list[dict]:
    """Longest-match gazetteer NER via per-alias scan + taken mask."""
    toks = TOKEN_RE.findall(text)
    if len(toks) > MAX_LEN:
        cutoff = list(TOKEN_RE.finditer(text))[MAX_LEN].start()
    else:
        cutoff = len(text)
    taken = [False] * len(text)
    found = []
    for alias in _ALIASES:  # longest first
        start = 0
        while True:
            i = text.find(alias, start)
            if i < 0:
                break
            start = i + 1
            # word-boundary check
            before_ok = i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
            j = i + len(alias)
            after_ok = j >= len(text) or not (text[j].isalnum() or text[j] == "_")
            if not (before_ok and after_ok):
                continue
            if i >= cutoff:
                continue
            if any(taken[i:j]):
                continue
            for k in range(i, j):
                taken[k] = True
            found.append((i, j, alias))
    bounds = [m.end() for m in SENT_RE.finditer(text)]

    def sid_of(pos: int) -> int:
        return sum(1 for b in bounds if b <= pos)

    out = []
    for i, j, alias in sorted(found):
        sid = sid_of(i)
        s_lo = bounds[sid - 1] if sid > 0 else 0
        s_hi = bounds[sid] if sid < len(bounds) else len(text)
        ctx = text[max(s_lo, i - CTX_WINDOW) : min(s_hi, j + CTX_WINDOW)]
        out.append(
            {
                "entity_group": _tag_group(alias),
                "word": alias,
                "start": i,
                "end": j,
                "score": _score(alias),
                "sentence_id": sid,
                "ctx_emb": embed_text(ctx),
            }
        )
    return out


def oracle_link(mention: dict) -> str | None:
    holders = _ALIAS_HOLDERS.get(mention["word"])
    if not holders:
        return None
    best, best_key = None, None
    for eid, _kind, _cn, prior in holders:
        sim = float(mention["ctx_emb"] @ _EMB[eid])
        key = (0.7 * sim + 0.3 * prior, eid)
        if best_key is None or key > best_key:
            best, best_key = eid, key
    return best


def oracle_triples(doc: dict) -> set[tuple[str, str, str, str]]:
    """(doc_id, subj, pred, obj) for one document row."""
    out = set()
    pred_rx = re.compile(
        r"\b(?:" + "|".join(re.escape(p) for p in sorted(PRED_LEXICON, key=len, reverse=True)) + r")\b"
    )
    for span in doc["spans"]:
        if span["kind"] != "text":
            continue
        text = span["text"]
        mentions = oracle_mentions(text)
        linked = [(m, oracle_link(m)) for m in mentions]
        linked = [(m, e) for m, e in linked if e]
        bounds = [m.end() for m in SENT_RE.finditer(text)]

        def sid_of(pos: int) -> int:
            return sum(1 for b in bounds if b <= pos)

        for pm in pred_rx.finditer(text):
            sid = sid_of(pm.start())
            lefts = [
                (m["end"], e) for m, e in linked
                if m["sentence_id"] == sid and m["end"] <= pm.start()
            ]
            rights = [
                (m["start"], e) for m, e in linked
                if m["sentence_id"] == sid and m["start"] >= pm.end()
            ]
            if lefts and rights:
                subj = max(lefts)[1]
                obj = min(rights)[1]
                out.add((doc["doc_id"], subj, PRED_LEXICON[pm.group(0)], obj))
    return out


def oracle_spans(doc: dict) -> list[tuple[str, str, str | None, int]]:
    """The span-sequence invariant tuple list for one doc."""
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in doc["spans"]]
