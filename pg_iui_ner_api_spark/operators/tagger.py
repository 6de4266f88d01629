"""Taggers: the pluggable "model" behind the NER operator (SURVEY.md M1).

The reference runs ``pipeline('ner', model, tokenizer,
aggregation_strategy="simple")`` per request
(/root/reference/src/routers/main_endpoints.py:161-167). Its output
semantics — which we reproduce exactly — are:

  * tokenize with char offsets; inputs beyond MAX_LEN=512 tokens are
    silently truncated (training.py:13,23-25 — replicated for parity);
  * per-token BIO tag over {O, B/I-PER, B/I-ORG, B/I-LOC, B/I-MISC}
    (models_utils.py:6-16);
  * "simple" aggregation: consecutive tokens of the same entity type
    merge into one span with entity_group=type, score=mean token score,
    word=the exact input substring, start/end=char offsets; spans are
    emitted in text order (main_endpoints.py:129-143).

Two implementations:

  * ``GazetteerTagger`` — deterministic, dependency-free; the "model" is
    longest-leftmost gazetteer match. Used by pytest/bench so tests are
    hermetic. Its per-token scores are a stable hash of the surface, so
    the mean-score aggregation path is exercised for real.
  * ``HFTagger`` — the real transformer path, import-gated (torch /
    transformers are not in this container). Loads the model once per
    executor worker (singleton), fixing the reference's
    reload-per-request anti-pattern (main_endpoints.py:161-166).

Both emit the same row shape consumed by operators/ner.py.
"""

from __future__ import annotations

import bisect
import re
import zlib
from dataclasses import dataclass

import numpy as np

from .. import schema as S
from ..synth import PRED_LEXICON, tagger_lexicon

TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
SENT_BOUND_RE = re.compile(r"(?<=[.!?])\s+")
# Chars of context on each side fed to the stand-in encoder. 20 keeps a
# mention's own appositive descriptor (", the company," ~ 14 chars) in
# window while excluding the other relation argument's descriptor
# (", the company, is located in " ~ 29 chars away).
CTX_WINDOW = 20


@dataclass(frozen=True)
class Mention:
    entity_group: str
    word: str
    start: int
    end: int
    score: float
    sentence_id: int
    ctx: str  # ±CTX_WINDOW chars around the surface, sentence-clipped


@dataclass(frozen=True)
class PredMatch:
    pred: str
    start: int
    end: int
    sentence_id: int


class GazetteerTagger:
    """Deterministic stand-in NER model with HF-"simple"-aggregation output.

    Matching is a single pass of one compiled alternation regex
    (longest-alias-first, word-boundary anchored) — C-speed per Arrow
    batch, no per-row Python beyond the regex scan itself.
    """

    def __init__(self, lexicon: dict[str, tuple[str, float]] | None = None,
                 long_text: str = "truncate"):
        """``long_text``: 'truncate' drops matches beyond the MAX_LEN-th
        token — exact parity with the reference's 512-subword cap
        (training.py:13,23-25), the default for the parity tests;
        'full' processes the whole span (the chunk-with-overlap result
        for a lexicon tagger, since regex matching needs no window) —
        the production choice when dropped tail entities matter more
        than bitwise reference parity (SURVEY §4)."""
        if long_text not in ("truncate", "full"):
            raise ValueError(long_text)
        self.long_text = long_text
        # pre-box scores through float32 ONCE per alias (the reference
        # emits np.float32 scores, main_endpoints.py:170-175); boxing
        # per mention showed up in the batch profile
        self.lexicon = {
            a: (k, float(np.float32(s)))
            for a, (k, s) in (lexicon or tagger_lexicon()).items()
        }
        # split maps for the vectorized batch path (pd.Series.map)
        self._groups = {a: ks[0] for a, ks in self.lexicon.items()}
        self._scores = {a: ks[1] for a, ks in self.lexicon.items()}
        aliases = sorted(self.lexicon, key=len, reverse=True)
        self._rx = re.compile(
            r"\b(?:" + "|".join(re.escape(a) for a in aliases) + r")\b"
        )
        self._pred_rx = re.compile(
            r"\b(?:" + "|".join(re.escape(p) for p in sorted(PRED_LEXICON, key=len, reverse=True)) + r")\b"
        )

    # -- semantics helpers ------------------------------------------------
    @staticmethod
    def _truncation_cutoff(text: str) -> int:
        """Char position of token MAX_LEN — parity with the reference's
        512-subword truncation; matches starting at/after it are dropped."""
        toks = TOKEN_RE.finditer(text)
        for idx, m in enumerate(toks):
            if idx >= S.MAX_LEN:
                return m.start()
        return len(text)

    @staticmethod
    def _sentence_bounds(text: str) -> list[int]:
        return [m.end() for m in SENT_BOUND_RE.finditer(text)]

    def tag(self, text: str) -> tuple[list[Mention], list[PredMatch]]:
        """One text span -> (mentions in text order, predicate matches)."""
        if self.long_text == "full" or len(text) <= 1024:
            cutoff = len(text)
        else:
            cutoff = self._truncation_cutoff(text)
        bounds = self._sentence_bounds(text)

        def sent_id(pos: int) -> int:
            return bisect.bisect_right(bounds, pos)

        mentions: list[Mention] = []
        for m in self._rx.finditer(text):
            if m.start() >= cutoff:
                break
            alias = m.group(0)
            group, score = self.lexicon[alias]
            sid = sent_id(m.start())
            # mention context: ±CTX_WINDOW chars around the surface,
            # clipped to the mention's sentence (a whole-sentence or
            # cross-sentence context leaks the *other* relation
            # argument's descriptor and flips ambiguous links). Emitted
            # as a short STRING — the embedding itself is computed
            # JVM-side in the link stage (operators/linking.py), so no
            # float array ever crosses the Arrow boundary or shuffles.
            s_lo = bounds[sid - 1] if sid > 0 else 0
            s_hi = bounds[sid] if sid < len(bounds) else len(text)
            lo = max(s_lo, m.start() - CTX_WINDOW)
            hi = min(s_hi, m.end() + CTX_WINDOW)
            mentions.append(
                Mention(
                    entity_group=group,
                    word=alias,
                    start=m.start(),
                    end=m.end(),
                    score=score,  # already float32-boxed in __init__
                    sentence_id=sid,
                    ctx=text[lo:hi],
                )
            )
        preds: list[PredMatch] = []
        for m in self._pred_rx.finditer(text):
            if m.start() >= cutoff:
                break
            preds.append(
                PredMatch(
                    pred=PRED_LEXICON[m.group(0)],
                    start=m.start(),
                    end=m.end(),
                    sentence_id=sent_id(m.start()),
                )
            )
        return mentions, preds


    # -- vectorized batch path --------------------------------------------
    def tag_batch(self, pdf: "object") -> "object":
        """Whole-Arrow-batch form of :meth:`tag` — SURVEY §2.8's "zero
        per-row Python" promise made literal for the hot path.

        All texts of the batch are joined into ONE blob with a ``\\x00``
        separator (matches neither ``\\w``, ``\\s`` nor any alias, so
        ``\\b``/sentence semantics at text edges are identical to
        per-text matching), each regex runs ONCE per batch, and matches
        map back to their rows via ``np.searchsorted`` over the
        cumulative text offsets. Field materialization is numpy/
        ``Series.map`` — no dataclasses, no per-mention appends. Output
        rows are ordered exactly as the per-row loop emitted them
        (per input row: mentions in text order, then predicate
        matches), pinned by ``test_span_parity``'s batch-parity test.

        Returns a pandas DataFrame in the EXTRACTION column layout, or
        ``None`` when the batch yields no rows.
        """
        import pandas as pd

        texts = pdf["text"].tolist()
        nrows = len(texts)
        if nrows == 0:
            return None
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=nrows)
        starts = np.zeros(nrows, dtype=np.int64)
        if nrows > 1:
            np.cumsum(lens[:-1] + 1, out=starts[1:])
        text_end = starts + lens
        if self.long_text == "full":
            cutoffs = lens
        else:
            cutoffs = np.fromiter(
                (len(t) if len(t) <= 1024 else self._truncation_cutoff(t)
                 for t in texts),
                dtype=np.int64, count=nrows,
            )
        blob = "\x00".join(texts)
        bounds = np.fromiter(
            (m.end() for m in SENT_BOUND_RE.finditer(blob)), dtype=np.int64
        )

        def _matches(rx):
            s, e, w = [], [], []
            ap_s, ap_e, ap_w = s.append, e.append, w.append
            for m in rx.finditer(blob):
                ap_s(m.start())
                ap_e(m.end())
                ap_w(m.group(0))
            g_s = np.array(s, dtype=np.int64)
            g_e = np.array(e, dtype=np.int64)
            row = np.searchsorted(starts, g_s, side="right") - 1
            keep = (g_s - starts[row]) < cutoffs[row]
            return (row[keep], g_s[keep], g_e[keep],
                    np.array(w, dtype=object)[keep])

        def _sentence_info(g_s, row):
            idx = np.searchsorted(bounds, g_s, side="right")
            base = np.searchsorted(bounds, starts[row], side="right")
            n = len(g_s)
            if len(bounds):
                prev_b = np.where(idx > 0, bounds[np.maximum(idx - 1, 0)], -1)
                next_b = np.where(idx < len(bounds),
                                  bounds[np.minimum(idx, len(bounds) - 1)],
                                  np.int64(1) << 62)
            else:
                prev_b = np.full(n, -1, dtype=np.int64)
                next_b = np.full(n, np.int64(1) << 62, dtype=np.int64)
            return idx - base, prev_b, next_b

        m_row, m_gs, m_ge, m_words = _matches(self._rx)
        m_sid, m_prev, m_next = _sentence_info(m_gs, m_row)
        s_lo = np.maximum(m_prev, starts[m_row])
        s_hi = np.minimum(m_next, text_end[m_row])
        c_lo = np.maximum(s_lo, m_gs - CTX_WINDOW)
        c_hi = np.minimum(s_hi, m_ge + CTX_WINDOW)
        ctx = np.fromiter(
            (blob[a:b] for a, b in zip(c_lo.tolist(), c_hi.tolist())),
            dtype=object, count=len(m_gs),
        )
        wser = pd.Series(m_words, copy=False)

        p_row, p_gs, p_ge, p_words = _matches(self._pred_rx)
        p_sid = _sentence_info(p_gs, p_row)[0]

        n_m, n_p = len(m_row), len(p_row)
        total = n_m + n_p
        if total == 0:
            return None
        rows_all = np.concatenate([m_row, p_row])
        kind_all = np.concatenate(
            [np.zeros(n_m, np.int8), np.ones(n_p, np.int8)]
        )
        start_all = np.concatenate([m_gs - starts[m_row], p_gs - starts[p_row]])
        end_all = np.concatenate([m_ge - starts[m_row], p_ge - starts[p_row]])
        # reproduce the per-row loop's emit order exactly
        order = np.lexsort((start_all, kind_all, rows_all))

        # float64 with NaN for preds — exactly what the per-row loop's
        # mixed [float..., None] lists became under pandas inference
        score_obj = np.full(total, np.nan)
        score_obj[:n_m] = wser.map(self._scores).to_numpy()
        group_obj = np.full(total, None, dtype=object)
        group_obj[:n_m] = wser.map(self._groups).to_numpy(dtype=object)
        ctx_obj = np.full(total, None, dtype=object)
        ctx_obj[:n_m] = ctx
        word_all = np.concatenate(
            [m_words,
             pd.Series(p_words, copy=False).map(PRED_LEXICON).to_numpy(dtype=object)]
        ) if n_p else m_words

        doc_np = pdf["doc_id"].to_numpy()
        span_np = pdf["span_idx"].to_numpy()
        kind_str = np.where(kind_all == 0, "mention", "pred")
        return pd.DataFrame({
            "doc_id": doc_np[rows_all][order],
            "span_idx": span_np[rows_all][order],
            "row_kind": kind_str[order],
            "entity_group": group_obj[order],
            "word": word_all[order],
            "start": start_all[order],
            "end": end_all[order],
            "score": score_obj[order],
            "sentence_id": np.concatenate([m_sid, p_sid])[order],
            "ctx": ctx_obj[order],
        })


def align_offsets_to_probs(
    offset_mapping: list[tuple[int, int]], probs: "np.ndarray"
) -> tuple[list[tuple[int, int]], "np.ndarray"]:
    """Drop special tokens from a fast-tokenizer offset mapping and keep
    probs ALIGNED BY INDEX.

    HF fast tokenizers mark specials (<s>, </s>, <pad>, and some
    zero-width artifacts) with the offset (0, 0). Round 1 filtered
    offsets by value but sliced probs positionally
    (``probs[1:1+len(offsets)]``), which silently misaligns every token
    after a mid-sequence (0, 0) entry — e.g. a <pad>-free pair encoding
    or a zero-width normalization artifact. Index-based selection keeps
    (offset, prob) rows paired no matter where specials sit.

    ``offset_mapping`` is the full per-token mapping INCLUDING specials;
    ``probs`` must have one row per entry of it.
    """
    if len(offset_mapping) != len(probs):
        raise ValueError(
            f"offset_mapping has {len(offset_mapping)} rows, probs {len(probs)}"
        )
    keep = [i for i, (a, b) in enumerate(offset_mapping) if not (a == 0 and b == 0)]
    return [offset_mapping[i] for i in keep], probs[keep]


class HFTagger:
    """Real transformer NER, loaded once per executor (S4/S5).

    The DECODE path is fully implemented and tested
    (operators/bio_decode.decode_bio_simple — HF "simple" aggregation
    semantics); only the model FORWARD is import-gated because
    torch/transformers are absent in this container. Model artifacts
    ship to executors via ``--archives`` / ``SparkFiles`` (never
    re-downloaded per task), and the instance is a per-worker singleton
    — the fix for the reference's reload-per-request anti-pattern
    (main_endpoints.py:161-166).
    """

    _SINGLETON = None

    def __init__(self, model_path: str):
        try:
            import torch  # noqa: F401
            from transformers import (  # noqa: F401
                RobertaForTokenClassification,
                RobertaTokenizerFast,
            )
        except ImportError as e:  # pragma: no cover - sandbox has no torch
            raise NotImplementedError(
                "HFTagger needs torch+transformers (not in this container); "
                "use GazetteerTagger for hermetic runs"
            ) from e
        self.model_path = model_path  # pragma: no cover
        self._tok = RobertaTokenizerFast.from_pretrained(model_path)  # pragma: no cover
        self._model = RobertaForTokenClassification.from_pretrained(model_path)  # pragma: no cover

    @classmethod
    def get(cls, model_path: str) -> "HFTagger":  # pragma: no cover
        if cls._SINGLETON is None or cls._SINGLETON.model_path != model_path:
            cls._SINGLETON = cls(model_path)
        return cls._SINGLETON

    def tag(self, text: str):  # pragma: no cover - needs torch
        """str -> (mentions, predicate matches). Forward pass + the
        shared decode; truncation at MAX_LEN for reference parity."""
        import torch

        from .bio_decode import decode_bio_simple

        enc = self._tok(
            text, return_offsets_mapping=True, truncation=True,
            max_length=S.MAX_LEN, return_tensors="pt",
        )
        mapping = [(int(a), int(b)) for a, b in enc.pop("offset_mapping")[0].tolist()]
        with torch.no_grad():
            logits = self._model(**enc).logits[0]
        offsets, probs = align_offsets_to_probs(
            mapping, torch.softmax(logits, dim=-1).numpy()
        )
        spans = decode_bio_simple(text, offsets, probs)
        bounds = GazetteerTagger._sentence_bounds(text)
        import bisect as _b

        mentions = [
            Mention(
                entity_group=s.entity_group,
                word=s.word,
                start=s.start,
                end=s.end,
                score=s.score,
                sentence_id=_b.bisect_right(bounds, s.start),
                ctx=text[max(0, s.start - CTX_WINDOW) : s.end + CTX_WINDOW],
            )
            for s in spans
        ]
        return mentions, []

    def tag_batch(self, pdf, max_batch_tokens: int = 8192):
        """One Arrow batch -> EXTRACTION pandas frame: MANY text spans
        per model forward (SURVEY §2.8 M3 "batching"; r4 VERDICT #3 —
        without this, ``tag_frame`` fell back to its per-row loop and
        the HF path paid one forward per span).

        Batching strategy: rows are length-SORTED then packed into
        micro-batches under a token budget (``batch_rows x padded_len <=
        max_batch_tokens``), so (a) each forward amortizes the
        per-invocation overhead over many spans, and (b) padding waste
        is minimal because neighbors in sort order have similar lengths
        (the standard length-bucketing trick). One tokenizer pass
        measures lengths; each micro-batch re-tokenizes its text list
        with ``padding=True`` so HF emits aligned padded tensors.
        Padding/special positions carry offset (0, 0) and are dropped
        by :func:`align_offsets_to_probs` index alignment.

        Emits rows in the SAME order as the per-row ``tag`` loop
        (original row order, mentions in text order) — parity pinned by
        ``test_hf_tagger_e2e.py``'s batch==per-row test.
        """
        import bisect as _b

        import pandas as pd
        import torch

        from .bio_decode import decode_bio_simple

        texts = list(pdf["text"])
        n = len(texts)
        if n == 0:
            return None
        lengths = []
        for t in texts:
            enc = self._tok(
                t, return_offsets_mapping=True, truncation=True,
                max_length=S.MAX_LEN, return_tensors="pt",
            )
            lengths.append(len(enc["offset_mapping"][0].tolist()))
        order = sorted(range(n), key=lambda i: lengths[i])
        batches: list[list[int]] = []
        cur: list[int] = []
        cur_max = 0
        for i in order:
            grown = max(cur_max, lengths[i])
            if cur and grown * (len(cur) + 1) > max_batch_tokens:
                batches.append(cur)
                cur, cur_max = [], 0
                grown = lengths[i]
            cur.append(i)
            cur_max = grown
        if cur:
            batches.append(cur)

        spans_by_row: list[list] = [[] for _ in range(n)]
        for idx_list in batches:
            enc = self._tok(
                [texts[i] for i in idx_list],
                return_offsets_mapping=True, truncation=True, padding=True,
                max_length=S.MAX_LEN, return_tensors="pt",
            )
            mappings = enc.pop("offset_mapping")
            with torch.no_grad():
                logits = self._model(**enc).logits
            probs = torch.softmax(logits, dim=-1).numpy()
            for r, i in enumerate(idx_list):
                mapping = [
                    (int(a), int(b)) for a, b in mappings[r].tolist()
                ]
                offs, pr = align_offsets_to_probs(mapping, probs[r])
                spans_by_row[i] = decode_bio_simple(texts[i], offs, pr)

        out: dict[str, list] = {k: [] for k in (
            "doc_id", "span_idx", "row_kind", "entity_group", "word",
            "start", "end", "score", "sentence_id", "ctx",
        )}
        for i, (doc_id, span_idx) in enumerate(
            zip(pdf["doc_id"], pdf["span_idx"])
        ):
            text = texts[i]
            bounds = GazetteerTagger._sentence_bounds(text)
            for s in spans_by_row[i]:
                out["doc_id"].append(doc_id)
                out["span_idx"].append(span_idx)
                out["row_kind"].append("mention")
                out["entity_group"].append(s.entity_group)
                out["word"].append(s.word)
                out["start"].append(s.start)
                out["end"].append(s.end)
                out["score"].append(s.score)
                out["sentence_id"].append(_b.bisect_right(bounds, s.start))
                out["ctx"].append(
                    text[max(0, s.start - CTX_WINDOW) : s.end + CTX_WINDOW]
                )
        return pd.DataFrame(out) if out["doc_id"] else None


def mention_score_of(alias: str) -> float:
    """Stable pseudo-confidence for a gazetteer alias (test oracle helper)."""
    return float(np.float32(0.5 + (zlib.crc32(alias.encode()) % 500) / 1000.0))
