"""Product-quantization (PQ) vector compression + asymmetric-distance
top-k — the 100 TB scale path for the embedding column.

At 10^12 documents a float32 embedding column is the single largest
thing in the warehouse (dim=32 -> 128 B/row -> 128 TB of raw vectors).
PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011) splits each vector into ``m`` contiguous subvectors and
replaces every subvector with the id of its nearest codeword from a
per-subspace codebook of ``ksub`` entries: the stored row shrinks to
``m`` small ints plus one reconstruction norm (dim=32, m=4 -> 4 B of
codes vs 128 B of floats, 32x). Search never decompresses: a query
precomputes one dot product per (subspace, codeword) — the ADC lookup
table, ``m*ksub`` doubles — and scores a database row by summing ``m``
table entries selected by its codes.

Spark shapes (everything JVM Column algebra — zero Python on the row
path, mirroring operators/ann.py):

  * ``pq_encode`` — MAP-ONLY: codebooks fold into the plan as literal
    nested arrays and each code is an in-row argmin (the same
    struct-max trick as ann.assign_cells). Vectors never shuffle; at
    scale you write the encoded table once and drop the raw column
    from the hot path.
  * ``train_pq_codebooks`` — per-subspace k-means, all subspaces in ONE
    distributed pass per iteration: map-only code assignment, then a
    (subspace, code, pos) hash aggregate whose shuffle carries
    ``dim*ksub`` partial sums per partition after map-side combine —
    never the vectors. Train on a sample at warehouse scale, exactly
    as FAISS does.
  * ``pq_topk`` — broadcast the (small) query set against the encoded
    table; the ADC sum is an indexed ``F.transform`` fold over the
    ``m`` codes. The big side contributes only (id, m codes, rnorm) to
    the scan and nothing to any shuffle except the bounded per-query
    top-k window.

Approximation contract: ``acos`` estimates cosine(q, v) by
cosine(q, v̂) where v̂ is the PQ reconstruction of v. Subspaces are
disjoint coordinate blocks, so ||v̂||² is exactly the sum of the chosen
codewords' squared norms — ``rnorm`` is computed at encode time from
the codes alone. When every subvector appears verbatim in its
codebook, v̂ == v and the scores equal the exact brute-force cosine
(pinned in tests/test_pq.py); otherwise recall is traded explicitly
and measured against ``ann.brute_force_topk``.

Reference parity note: the reference has no vector search at all (its
NER service stores no embeddings); this module is part of the
beyond-reference LLM-data-pipeline surface, sibling to operators/ann.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import spread

Codebooks = "list[list[list[float]]]"  # [m][ksub][dsub]


def seed_codebooks(dim: int, m: int = 4, ksub: int = 16) -> list[list[list[float]]]:
    """Deterministic md5-seeded codebooks in [-1, 1] (same seeding
    discipline as ann._centroids, so encode is reproducible with no
    training dependency — the golden-query path uses exactly these)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        book = []
        for c in range(ksub):
            book.append([
                int(hashlib.md5(f"pq{j}#{c}#{i}".encode()).hexdigest()[:15], 16)
                / float(16 ** 15) * 2.0 - 1.0
                for i in range(dsub)
            ])
        books.append(book)
    return books


def _sub(emb, j: int, dsub: int):
    """Subvector j of an array column (1-based slice), double-cast."""
    return F.slice(emb, j * dsub + 1, dsub)


def _code_expr(emb, book: list[list[float]], j: int, dsub: int):
    """In-row argmin-L2 code for subspace j over a foldable codebook
    literal. max of struct(-dist2, -c) == lowest distance, ties to the
    LOWEST codeword id (same tie-break as ann._argmax_cell)."""
    sub = _sub(emb, j, dsub)
    scored = F.array(*[
        F.struct(
            (-F.aggregate(
                F.zip_with(sub, F.array(*[F.lit(float(x)) for x in cw]),
                           lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            )).alias("neg_d2"),
            F.lit(-c).alias("neg_c"),
        )
        for c, cw in enumerate(book)
    ])
    return (-F.array_max(scored)["neg_c"]).cast("int")


def _norm2_lit(codebooks) -> "F.Column":
    """Literal array<array<double>>: norm2[j][c] = ||codeword[j][c]||²."""
    return F.array(*[
        F.array(*[F.lit(float(sum(x * x for x in cw))) for cw in book])
        for book in codebooks
    ])


def pq_encode(vectors: DataFrame, dim: int, m: int = 4, ksub: int = 16,
              codebooks=None, id_col: str = "vec_id",
              emb_col: str = "embedding") -> DataFrame:
    """(vec_id, code array<int> length m, rnorm double) — map-only.

    ``rnorm`` is the reconstruction's L2 norm, exact from the codes
    because subspaces are disjoint coordinate blocks."""
    books = codebooks if codebooks is not None else seed_codebooks(dim, m, ksub)
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    code = F.array(*[_code_expr(F.col(emb_col), books[j], j, dsub) for j in range(m)])
    out = spread(vectors).select(
        F.col(id_col).alias("vec_id"), code.alias("code")
    )
    rnorm2 = F.aggregate(
        F.zip_with(F.col("code"), _norm2_lit(books),
                   lambda c, row: F.element_at(row, c + F.lit(1))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return out.withColumn("rnorm", F.sqrt(rnorm2))


def train_pq_codebooks(vectors: DataFrame, dim: int, m: int = 4,
                       ksub: int = 16, iters: int = 3,
                       emb_col: str = "embedding") -> list[list[list[float]]]:
    """Lloyd refinement of the seed codebooks, every subspace in the
    same distributed pass (shuffle carries dim*ksub partials, not rows).

    Empty codewords keep their seed (standard k-means practice; FAISS
    warns and does the same)."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    books = seed_codebooks(dim, m, ksub)
    v = spread(vectors).select(F.col(emb_col).cast("array<double>").alias("emb"))
    for _ in range(iters):
        code = F.array(*[_code_expr(F.col("emb"), books[j], j, dsub) for j in range(m)])
        assigned = v.select(code.alias("code"), "emb")
        # (j, c, pos, val) scalars -> (j, c, pos) partial sums. posexplode
        # over the FULL vector; subspace j = pos // dsub, local pos % dsub.
        stats = (
            assigned.select(
                F.posexplode("emb").alias("pos", "val"), "code"
            )
            .select(
                (F.col("pos") / dsub).cast("int").alias("j"),
                F.element_at(F.col("code"), (F.col("pos") / dsub).cast("int") + F.lit(1)).alias("c"),
                F.pmod(F.col("pos"), F.lit(dsub)).alias("p"),
                "val",
            )
            .groupBy("j", "c", "p")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums = np.zeros((m, ksub, dsub))
        counts = np.zeros((m, ksub))
        for r in stats:
            sums[r["j"]][r["c"]][r["p"]] = r["s"]
            counts[r["j"]][r["c"]] = r["n"]
        new_books = []
        for j in range(m):
            book = []
            for c in range(ksub):
                if counts[j][c] > 0:
                    book.append([float(x) for x in sums[j][c] / counts[j][c]])
                else:
                    book.append(books[j][c])
            new_books.append(book)
        books = new_books
    return books


def pq_topk(encoded: DataFrame, queries: DataFrame, codebooks,
            k: int = 10, q_id_col: str = "q_id",
            q_emb_col: str = "q_emb") -> DataFrame:
    """Approximate cosine top-k per query over the PQ-encoded table via
    asymmetric distance: score = Σ_j dot(q_sub_j, codeword[j][code_j])
    / (||q|| * rnorm). Self-matches (vec_id == q_id) excluded, ranking
    ties broken by vec_id — identical contract to ann.brute_force_topk
    so the two are drop-in comparable."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb_lit = F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in cw]) for cw in book])
        for book in codebooks
    ])
    q = F.broadcast(queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_emb_col).cast("array<double>").alias("q_emb"),
    ))
    qnorm = F.sqrt(F.aggregate(
        F.transform(F.col("q_emb"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    # ADC: indexed transform over the m codes; each term is a dsub-fold
    # dot of the query's j-th slice with the selected codeword literal.
    adc = F.aggregate(
        F.transform(
            F.col("code"),
            lambda c, j: F.aggregate(
                F.zip_with(
                    F.slice(F.col("q_emb"), j * dsub + 1, dsub),
                    F.element_at(F.element_at(cb_lit, j + F.lit(1)), c + F.lit(1)),
                    lambda a, b: a * b,
                ),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    denom = qnorm * F.col("rnorm")
    scored = (
        encoded.join(q, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id",
            F.round(
                F.when(denom == 0.0, F.lit(0.0)).otherwise(adc / denom), 6
            ).alias("acos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "vec_id", "acos", "rank")
    )


def pq_search(vectors: DataFrame, queries: DataFrame, dim: int,
              k: int = 10, m: int = 4, ksub: int = 16, codebooks=None,
              id_col: str = "vec_id", emb_col: str = "embedding",
              q_id_col: str = "q_id", q_emb_col: str = "q_emb") -> DataFrame:
    """encode + ADC top-k in one call (the driver-query surface; real
    deployments materialize ``pq_encode`` once and call ``pq_topk``)."""
    books = codebooks if codebooks is not None else seed_codebooks(dim, m, ksub)
    enc = pq_encode(vectors, dim, m, ksub, books, id_col, emb_col)
    return pq_topk(enc, queries, books, k, q_id_col, q_emb_col)
