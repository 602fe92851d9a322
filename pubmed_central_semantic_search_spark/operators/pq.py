"""Product quantization (PQ) — the compressed-ANN tier (SURVEY §2.9 X2/X3
scale path, alongside hyperplane-LSH and IVF-flat).

Public method: Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search" (TPAMI 2011). The reference's HNSW index keeps full
768-float vectors hot (``/root/reference/src/backend/database/qdrant.py``);
at 100 TB that is the dominant storage/IO cost. PQ splits each vector into
``m`` subspaces, k-means-quantizes each subspace to ``ksub`` codes, and
stores ``m`` small ints per vector — 32× smaller at (dim=64, m=8,
ksub=16) — while queries score the CODES via per-subspace lookup tables
(ADC: asymmetric distance computation) and only a tiny re-rank candidate
set ever touches full vectors.

Spark-first shapes (everything deterministic → unit-testable end to end):

- **Train** (`train_pq`): seeds = the ksub lowest-id vectors' subvectors
  (one TakeOrdered job); each Lloyd iteration is ONE job for ALL m
  subspaces jointly — posexplode the vector, derive (subspace, subpos)
  from the component index, look up the row's code for that subspace from
  the narrow `pq_encode` column, and wide-agg means per
  (subspace, code, subpos). Empty codes keep their previous centroid, so
  codebooks stay DENSE (codes are always 0..ksub-1).
- **Encode** (`pq_encode`): array<int> of m codes as ONE pure per-row
  expression — a ``transform`` loop over the single folded codebook
  tensor literal, argmin-L2 ``zip_with`` folds inside (the packed-literal
  pattern from operators/clustering.py, one leaf at any m). Zero shuffle.
- **Score** (`pq_adc_score`): dot(query, vector) ≈ Σ_s lut[s][code_s],
  with the m×ksub LUT computed driver-side from the query and folded in
  as literals — the scan does m integer lookups + adds per row, no
  vector math, no join.
- **Search** (`pq_topk`): ADC top-R (TakeOrderedAndProject) → broadcast
  re-rank join back to full vectors → exact cosine top-k. Only R rows
  (not the corpus) ever load full vectors at query time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import array_lit, as_double, cosine_similarity, tensor_lit
from .topk import top_k

# codebooks: books[s] = list of ksub sub-centroids (each dsub floats)
Codebooks = list[list[list[float]]]


def pq_encode(vec_col: Column | str, books: Codebooks) -> Column:
    """m-code PQ encoding as array<int> — narrow, zero shuffle.

    ONE expression regardless of m: the full codebook tensor rides as a
    single folded 3-level literal and the per-subspace argmin runs inside
    a ``transform`` loop — the earlier form instantiated m independent
    ``_argmin_l2`` trees (m × ksub×dsub literal payloads through every
    analyzer pass). Identical folds per subspace, bit-for-bit.

    Requires a rectangular codebook tensor (uniform ksub and dsub across
    subspaces): the shared ``cids`` ramp is sized from ``books[0]`` and
    ``zip_with`` null-pads ragged arrays, which would silently corrupt
    codes — so ragged books are rejected loudly at entry."""
    if any(len(b) != len(books[0]) for b in books):
        raise ValueError("pq_encode: ragged codebooks (unequal ksub per subspace)")
    if any(len(c) != len(books[0][0]) for b in books for c in b):
        raise ValueError("pq_encode: ragged codebooks (unequal dsub)")
    dsub = len(books[0][0])
    books3 = tensor_lit(books)
    cids = F.lit(list(range(len(books[0]))))
    v = as_double(vec_col)

    def _code(book: Column, s: Column) -> Column:
        sub = F.slice(v, s * dsub + 1, dsub)
        ranked = F.array_sort(
            F.zip_with(
                book,
                cids,
                lambda c, i: F.struct(
                    F.aggregate(
                        F.zip_with(sub, c, lambda x, y: y * y - 2.0 * x * y),
                        F.lit(0.0),
                        lambda acc, t: acc + t,
                    ).alias("d"),
                    i.alias("c"),
                ),
            )
        )
        return F.element_at(ranked, 1).getField("c")

    # Row-level geometry guard, same rationale as the ragged-books checks
    # above but for the VECTOR side: a too-short embedding makes zip_with
    # null-pad the subspace slice, every candidate distance folds to NULL,
    # and array_sort's nulls-first struct order silently emits code 0 —
    # poisoned codes instead of an error. Null vectors stay null (Catalyst
    # convention); wrong-length vectors raise at evaluation time.
    dim = len(books) * dsub
    codes = F.transform(books3, lambda book, s: _code(book, s))
    return (
        F.when(v.isNull(), F.lit(None).cast("array<int>"))
        .when(F.size(v) == dim, codes)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"pq_encode: vector length "),
                    F.size(v).cast("string"),
                    F.lit(f" != m*dsub = {dim}"),
                )
            ).cast("array<int>")
        )
    )


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Deterministic PQ codebooks: ksub lowest-id seeds, ``n_iter`` joint
    Lloyd rounds (ONE job per round for all m subspaces). Driver traffic
    is m × ksub × dsub doubles per round — never data-sized. Train on a
    sample at scale (pass ``vectors.filter(...)``); encoding the full
    corpus is the narrow part."""
    dsub = dim // m
    if dsub * m != dim:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    seed_rows = (
        vectors.select(F.col(id_col).alias("_i"), as_double(vec_col).alias("_v"))
        .orderBy("_i")
        .limit(ksub)
        .collect()
    )
    if len(seed_rows) < ksub:
        raise ValueError(f"need >= {ksub} vectors to seed, got {len(seed_rows)}")
    books: Codebooks = [
        [list(r["_v"])[s * dsub : (s + 1) * dsub] for r in seed_rows]
        for s in range(m)
    ]
    for _ in range(n_iter):
        codes = pq_encode(vec_col, books)
        # two-step select: a generator (posexplode) in the same projection
        # as the lambda-struct codes expression makes the analyzer drop the
        # struct field names (FIELD_NOT_FOUND on `c`) — materialize the
        # codes column first, then explode.
        comp = vectors.select(
            codes.alias("_codes"), as_double(vec_col).alias("_v")
        ).select(
            "_codes",
            F.posexplode("_v").alias("_pos", "_val"),
        ).select(
            (F.col("_pos") / dsub).cast("int").alias("_s"),
            F.element_at("_codes", (F.col("_pos") / dsub).cast("int") + 1).alias(
                "_c"
            ),
            (F.col("_pos") % dsub).alias("_sp"),
            "_val",
        )
        from ..session import collect_bounded

        # ≤ m × ksub × dsub = dim × ksub cells by the groupBy key
        rows = collect_bounded(
            comp.groupBy("_s", "_c", "_sp").agg(F.avg("_val").alias("_m")),
            dim * ksub,
            "pq codebook cells",
        )
        means: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            means.setdefault((int(r["_s"]), int(r["_c"])), {})[int(r["_sp"])] = r["_m"]
        books = [
            [
                [means[(s, c)][i] for i in range(dsub)]
                if (s, c) in means
                else books[s][c]  # empty code keeps its previous centroid
                for c in range(ksub)
            ]
            for s in range(m)
        ]
    return books


def adc_lut(query: list[float], books: Codebooks) -> list[list[float]]:
    """Per-subspace dot-product lookup tables: lut[s][c] = q_s · books[s][c].

    The query length is validated against the codebook geometry (review
    find): ``zip()`` silently truncates, so a wrong-length query zeroed
    the tail subspaces' LUT entries and the ADC ranking quietly used half
    the space — the same silent-geometry class pq_encode guards loudly
    on the vector side."""
    dsub = len(books[0][0])
    dim = len(books) * dsub
    if len(query) != dim:
        raise ValueError(
            f"adc_lut: query length {len(query)} != m*dsub = {dim} — the "
            "query must live in the codebooks' space"
        )
    return [
        [
            sum(q * c for q, c in zip(query[s * dsub : (s + 1) * dsub], cent))
            for cent in book
        ]
        for s, book in enumerate(books)
    ]


def adc_norm2_lut(books: Codebooks) -> list[list[float]]:
    """Per-subspace squared-norm tables: lut2[s][c] = ‖books[s][c]‖² —
    query-independent, so at scale it's computed once per codebook. With
    it the ADC stage can rank by approximate COSINE:
    ‖reconstructed(codes)‖² = Σ_s lut2[s][code_s] (subspaces are
    orthogonal coordinate blocks), the same m lookups+adds shape as the
    dot."""
    return [[sum(c * c for c in cent) for cent in book] for book in books]


def pq_adc_score(codes_col: Column | str, query: list[float], books: Codebooks) -> Column:
    """Approximate dot(query, vector) from the codes alone: m lookups + m
    adds per row. Pure projection — the 100 TB scan never touches floats."""
    codes_col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    score = None
    for s, lut in enumerate(adc_lut(query, books)):
        term = F.element_at(array_lit(lut), codes_col[s] + 1)
        score = term if score is None else score + term
    return score


def pq_adc_cosine(
    codes_col: Column | str, query: list[float], books: Codebooks
) -> Column:
    """Approximate COSINE(query, vector) from the codes alone: the ADC
    dot divided by the RECONSTRUCTED vector's norm (Σ_s lut2[s][code_s],
    one extra lookup table) and the query norm. Why it exists (review
    find): the final search contract is cosine top-k, and ranking
    candidates by the raw ADC dot systematically excludes small-norm true
    neighbors on corpora whose vector norms vary — a norm-100 vector at
    cosine 0.3 out-dots a norm-0.01 vector at cosine 1.0, and no exact
    rerank can recover a candidate that never entered the list. Same
    per-row cost shape: 2m lookups + adds. Degenerate rows (zero
    reconstructed norm) and a zero query score 0.0, the package-wide
    cosine convention."""
    codes_col = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    dot = pq_adc_score(codes_col, query, books)
    n2 = None
    for s, lut2 in enumerate(adc_norm2_lut(books)):
        term = F.element_at(array_lit(lut2), codes_col[s] + 1)
        n2 = term if n2 is None else n2 + term
    qn = sum(x * x for x in query) ** 0.5
    if qn == 0.0:
        return F.lit(0.0)
    denom = F.sqrt(n2) * F.lit(qn)
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def pq_topk(
    vectors: DataFrame,
    query: list[float],
    books: Codebooks,
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ search: ADC top-``rerank`` over the codes (per-
    partition heaps, no shuffle of the corpus), then exact cosine over
    just those candidates (broadcast semi-join back to full vectors),
    final top-k. Returns (id, adc_score, score).

    At scale, codes live in their own skinny table/column — the ADC scan
    reads m bytes per vector; only ``rerank`` full vectors are fetched."""
    codes = vectors.select(
        F.col(id_col), pq_encode(vec_col, books).alias("_codes")
    )
    return _adc_rank_then_exact(
        codes, vectors, query, books, k, rerank, id_col, vec_col
    )


def _adc_rank_then_exact(
    codes: DataFrame,
    vectors: DataFrame,
    query: list[float],
    books: list[list[list[float]]],
    k: int,
    rerank: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared tail of ``pq_topk``/``ivfpq_topk`` (one definition so the
    rerank contract cannot drift between them): ADC top-``rerank`` over a
    ``(_codes, id)`` frame via TakeOrderedAndProject, broadcast the
    candidate ids back onto the full vectors, exact-cosine top-k with id
    tie-break. Candidates are RANKED by the approximate COSINE
    (pq_adc_cosine — the final contract's metric; the raw dot loses
    small-norm true neighbors on norm-varying corpora), while the
    returned ``adc_score`` column stays the ADC dot, the value q47's
    oracle replays."""
    cand = (
        codes.select(
            id_col,
            pq_adc_score("_codes", query, books).alias("adc_score"),
            pq_adc_cosine("_codes", query, books).alias("_adc_cos"),
        )
        .orderBy(F.desc("_adc_cos"), F.asc(id_col))
        .limit(rerank)
        .drop("_adc_cos")
    )
    exact = vectors.join(F.broadcast(cand), id_col).select(
        id_col,
        "adc_score",
        cosine_similarity(vec_col, array_lit(query)).alias("score"),
    )
    return top_k(exact, "score", k, tiebreak=[id_col])


def ivfpq_topk(
    vectors: DataFrame,
    query: list[float],
    centroids,
    books: Codebooks,
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the production big-ANN composition (coarse quantizer routes
    the query to ``nprobe`` inverted lists; ADC scores only those lists'
    CODES; exact re-rank on the survivors). ``centroids`` is the coarse
    quantizer (operators/clustering.py ``Centroids``); ``books`` the PQ
    codebooks.

    At 100 TB the code table is written ``partitionBy(cluster_id)`` so the
    probe filter is partition pruning (same storage layout the IVF-flat
    tier proves in tests/test_clustering.py) — the query touches
    nprobe/k of an already-32×-compressed table, and only ``rerank`` full
    vectors are ever read. The coarse probe is computed driver-side (the
    query is one vector; k×dim dots)."""
    from .clustering import _unit, nearest_centroid

    # the coarse probe's zip() would silently truncate a wrong-length
    # query (same class as the adc_lut guard) — validate by name
    bad = [cid for cid, vec in centroids if len(list(vec)) != len(query)]
    if bad:
        raise ValueError(
            f"ivfpq_topk: query length {len(query)} != coarse centroid "
            f"dimensionality (centroids {bad[:3]}...) — the query must "
            "live in the quantizer's space"
        )
    # driver-side coarse probe: nprobe nearest coarse centroids by cosine
    scored = sorted(
        (
            -sum(q * c for q, c in zip(query, _unit(list(vec)))),
            cid,
        )
        for cid, vec in centroids
    )
    probed = [cid for _, cid in scored[:nprobe]]

    lists = vectors.withColumn("cluster_id", nearest_centroid(vec_col, centroids))
    codes = lists.select(
        F.col(id_col), "cluster_id", pq_encode(vec_col, books).alias("_codes")
    ).filter(F.col("cluster_id").isin(probed))
    return _adc_rank_then_exact(
        codes, vectors, query, books, k, rerank, id_col, vec_col
    )
