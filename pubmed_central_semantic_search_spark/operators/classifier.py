"""Hashed linear text classifier (EXT X4 — the fastText-style quality
gate) with DISTRIBUTED full-batch training.

LLM curation pipelines gate documents with a small supervised linear
classifier over hashed bag-of-words features (the fastText-classifier
pattern: quality/domain filters trained on a labeled sample). The
reference has no filtering at all (``/root/reference/src/backend/
data_fetching/data_fetcher.py:48-57`` ingests everything); this module
supplies the tier Spark-first, with the same execution discipline as the
package's other trainers (Lloyd k-means, PCA, BPE): per-iteration work is
ONE aggregate pass over the data, the model state is a driver-sized
vector that rides back into the plan as a packed literal.

Stages:

- **Featurize** (`hashed_features`, pure Catalyst, narrow): token →
  content-addressed bucket (``md5_prefix_long`` — the package-wide hash
  primitive, so features are identical cross-engine/cross-run) →
  normalized per-bucket counts as a dense ``array<double>`` of length
  ``n_buckets``. No shuffle.
- **Train** (`train_logreg`): full-batch gradient descent for logistic
  regression. Each iteration: per-row residual ``sigmoid(w·x + b) − y``
  is a narrow expression against the CURRENT weights (packed literal);
  the gradient is ONE posexplode + groupBy(pos) aggregate — the
  mean-pool/recompute_centroids shape that partial-combines map-side and
  shuffles ``n_buckets`` partials per partition. The driver applies the
  update (O(n_buckets), corpus-independent) and re-broadcasts. Lineage is
  flat because each iteration reads the (persisted) feature frame, not
  the previous iteration's plan.
- **Score** (`logreg_score`): ``sigmoid(w·x + b)`` as a pure projection —
  the 100 TB inference pass is a narrow scan, exactly like the k-means
  assignment.

Deterministic end to end (zero-init weights, fixed lr/iterations, no
RNG); training is pinned against a plain-numpy full-batch reference in
tests/test_classifier.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import array_lit
from .curation import _tokens, md5_prefix_long


@dataclass(frozen=True)
class LogRegModel:
    weights: list[float]  # n_buckets
    bias: float
    n_buckets: int


def token_bucket(token_col: Column | str, n_buckets: int) -> Column:
    """Content-addressed feature bucket of a token (shared md5 primitive,
    ``#feat`` salt) — identical across engines and runs."""
    return (md5_prefix_long(token_col, "#feat") % n_buckets).cast("int")


def hashed_features(
    text_col: Column | str, n_buckets: int = 64, out_dtype: str = "array<double>"
) -> Column:
    """Dense normalized hashed-BoW vector: feat[d] = (#tokens in bucket d)
    / n_tokens. Pure Catalyst, narrow (no explode, no shuffle); empty
    texts yield the zero vector.

    Shape note: each token hashes ONCE (the bucket array is materialized
    before the fold); the fold then updates the ``n_buckets``-slot
    accumulator per token. The per-row cost is O(n_tokens × n_buckets)
    slot copies — fine at feature dims in the tens-to-hundreds this
    classifier tier uses; for larger dims switch the featurizer to the
    Arrow kernel tier (operators/vectorized.py pattern).

    Null text gets the ZERO vector (coalesced token array) — the same
    answer the Arrow twin gives for None, keeping the pinned equivalence
    total; an uncoalesced null would instead null the whole vector and
    silently drop the row from train_logreg's gradient."""
    tk = F.coalesce(_tokens(text_col), F.array().cast("array<string>"))
    tkb = F.transform(tk, lambda t: token_bucket(t, n_buckets))
    zero = F.array_repeat(F.lit(0.0), n_buckets)
    counts = F.aggregate(
        tkb,
        zero,
        lambda acc, bkt: F.transform(
            acc, lambda c, i: F.when(bkt == i, c + 1.0).otherwise(c)
        ),
    )
    n = F.size(tk)
    return F.when(n > 0, F.transform(counts, lambda c: c / n)).otherwise(
        counts
    ).cast(out_dtype)


def hashed_features_np(text_col: Column | str, n_buckets: int = 64) -> Column:
    """Arrow-kernel twin of ``hashed_features`` (equivalence test-pinned):
    one pandas_udf batch hashes tokens with the SAME md5 primitive
    (hashlib twin of ``md5_prefix_long``) and bincounts per row — the
    production featurizer for wide feature spaces or heavy corpora, where
    the Catalyst fold's O(n_tokens × n_buckets) interpreted slot copies
    dominate. Closure ships by value (imports in body, int capture)."""
    from pyspark.sql.functions import pandas_udf

    nb = int(n_buckets)

    @pandas_udf("array<double>")
    def _feat(texts):
        import hashlib

        import numpy as np
        import pandas as pd

        cache: dict[str, int] = {}

        def bucket(tok: str) -> int:
            b = cache.get(tok)
            if b is None:
                b = int(hashlib.md5(f"{tok}#feat".encode()).hexdigest()[:8], 16) % nb
                cache[tok] = b
            return b

        out = []
        for text in texts:
            toks = [t for t in (text or "").split(" ") if t]
            if not toks:
                out.append([0.0] * nb)
                continue
            counts = np.bincount([bucket(t) for t in toks], minlength=nb)
            out.append((counts / len(toks)).tolist())
        return pd.Series(out)

    return _feat(text_col if isinstance(text_col, Column) else F.col(text_col))


def _dot_lit(vec_col: Column | str, weights: list[float]) -> Column:
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.zip_with(vec, array_lit(weights), lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def train_logreg(
    feats: DataFrame,
    label_col: str = "label",
    feat_col: str = "feat",
    n_buckets: int = 64,
    lr: float = 1.0,
    n_iter: int = 10,
    sample_mod: int | None = None,
    id_col: str = "doc_id",
) -> LogRegModel:
    """Full-batch logistic-regression GD over a featurized frame
    (label ∈ {0, 1}). Per iteration: ONE partial-gradient pass — a
    ``mapInPandas`` kernel emits (n, Σr, Σr·x) per partition and the
    ≤ n_partitions rows reduce driver-side (guide §4.2: whole batches
    through numpy matmuls). Round-13 rewrite: the previous Catalyst
    gradient (a 65-slot struct explode + zip_with + groupBy(pos) whose
    weight literals changed every iteration, forcing a fresh optimize +
    codegen of the giant expression tree per iteration) measured
    ~2.5 s/iteration at sf0.1; the Arrow kernel is a single narrow
    stage with no exchange. Numerics: per-row residuals are identical
    IEEE-754 ops; only the summation ORDER changes (BLAS partials per
    partition, partition-ordered driver fold vs the shuffled F.sum) —
    inside the 1e-9 numpy-reference pin, like every partial-agg sum in
    the package. Weights start at zero — deterministic. Callers should
    persist ``feats`` (n_iter scans).

    ``sample_mod`` selects the SAMPLE-FIT tier (the x768_kmeans rule:
    classifier quality saturates at sample sizes far below the corpus, so
    training cost should be sample-sized at any scale): fit on the
    deterministic ``id_col % sample_mod == 0`` slice — persisted here for
    the n_iter gradient scans, unpersisted before returning — and let the
    caller run the ONE full-corpus pass that actually needs every row
    (``logreg_score`` is a narrow projection). Identical to calling the
    full-batch fit on the pre-filtered sample (parity-pinned in tests).
    """
    import numpy as np

    sampled = None
    if sample_mod is not None:
        if sample_mod < 1:
            raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
        sampled = feats.filter(F.col(id_col) % sample_mod == 0).persist()
        feats = sampled

    try:
        w = np.zeros(n_buckets, dtype=np.float64)
        b = 0.0
        # only the two needed columns cross the Arrow boundary (guide §4)
        slim = feats.select(
            F.col(label_col).cast("double").alias("_y"),
            F.col(feat_col).alias("_x"),
        )
        nb = int(n_buckets)
        for _ in range(n_iter):
            w_now, b_now = w.tolist(), float(b)

            def _partial(batches):
                # per-partition partial gradient: rows with a NULL feature
                # array are dropped entirely (the old explode dropped
                # them); rows with a null label or null COMPONENT count
                # toward n but contribute 0 to every sum (the old F.sum
                # skipped their null gv) — nan_to_num implements both.
                import numpy as _np
                import pandas as _pd

                ww = _np.array(w_now, dtype=_np.float64)
                n = 0
                gb = 0.0
                gw = _np.zeros(nb, dtype=_np.float64)
                for pdf in batches:
                    sub = pdf[pdf["_x"].notna()]
                    if len(sub) == 0:
                        continue
                    x = _np.array(
                        [
                            (list(v) + [_np.nan] * nb)[:nb]
                            for v in sub["_x"]
                        ],
                        dtype=_np.float64,
                    )
                    y = sub["_y"].to_numpy(dtype=_np.float64, na_value=_np.nan)
                    r = 1.0 / (1.0 + _np.exp(-(x @ ww + b_now))) - y
                    rr = _np.nan_to_num(r, nan=0.0)
                    n += len(sub)
                    gb += float(rr.sum())
                    # nan feature cells only occur on rows whose r is
                    # already nan (the dot poisons first), so rr is 0
                    # there and zeroing the nans keeps 0·x = 0
                    gw += _np.nan_to_num(x).T @ rr
                yield _pd.DataFrame(
                    {"n": [n], "gb": [gb], "gw": [gw.tolist()]}
                )

            g = slim.mapInPandas(
                _partial, "n long, gb double, gw array<double>"
            ).collect()
            n_rows = sum(int(r["n"]) for r in g)
            if n_rows == 0:
                raise ValueError(
                    "train_logreg: empty training frame (or every row's "
                    "feature array is null) — nothing to fit"
                )
            grad_w = np.zeros(nb, dtype=np.float64)
            grad_b = 0.0
            for r in g:  # partition order — deterministic fold
                grad_w += np.array(r["gw"], dtype=np.float64)
                grad_b += float(r["gb"])
            w -= (lr / n_rows) * grad_w
            b -= (lr / n_rows) * grad_b
    finally:
        # released on EVERY exit path — a failed gradient job must
        # not leave the internal sample pinned in the cache
        if sampled is not None:
            sampled.unpersist()
    return LogRegModel(weights=w.tolist(), bias=float(b), n_buckets=n_buckets)


def logreg_score(
    model: LogRegModel, feat_col: Column | str = "feat"
) -> Column:
    """Inference as a pure projection: sigmoid(w·x + b) with the weights
    as ONE packed literal — the narrow 100 TB scoring scan."""
    return _sigmoid(_dot_lit(feat_col, model.weights) + F.lit(model.bias))


# ---------------------------------------------------------------------------
# Quantized-GD tier — the CROSS-ENGINE-CERTIFIABLE trainer. The float
# trainer above is pinned against numpy in-repo, but its gradient is a
# float sum whose value depends on aggregation ORDER, so no independent
# engine can replay it bit for bit. This tier designs the trap out (the
# DSIR rule: quantize to integers rather than round at the end):
#
# - features: x_milli[d] = floor(1000 * count_d / n_tokens) — integer
#   milli-units of the normalized hashed-BoW histogram (one exact double
#   division + floor, identical in any IEEE engine).
# - weights/bias: integer micro-units. The per-doc logit
#   z = (Σ x_milli·w_micro + 1000·bias_micro) / 1e9 is INTEGER arithmetic
#   until one final exact division (all sums far below 2^53).
# - residual: r_micro = round(1e6·sigmoid(z)) − 1e6·y — the only float is
#   sigmoid itself; engines' exp() differ by ≤1 ulp, so the rounding at
#   micro resolution flips with probability ~1e-10 (and the w=0 first
#   iteration is sigmoid(0) = 0.5 EXACTLY on every row).
# - gradient: Σ r_micro·x_milli — an integer sum, order-free, exact.
# - update: w_micro −= floor(lr·G_d / (1000·n)); bias_micro −=
#   floor(lr·G_b / n). One correctly-rounded double division + floor —
#   bit-identical across engines.
#
# The q28 oracle replays the WHOLE training loop (unrolled CTEs, the
# q38/q55 precedent) and the scoring pass value for value.


@dataclass(frozen=True)
class QuantLogRegModel:
    weights_micro: list[int]  # n_buckets, integer micro-units
    bias_micro: int
    n_buckets: int


def hashed_counts_milli(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Sparse integer features: (id, b, x) with x = floor(1000·count_b /
    n_tokens) — zero rows omitted (a no-token doc has NO rows; consumers
    left-join and coalesce). One narrow explode + one keyed aggregate."""
    toks = docs.select(
        F.col(id_col),
        F.size(F.filter(F.split(text_col, " "), lambda t: t != "")).alias("_n"),
        F.explode(F.split(text_col, " ")).alias("_tok"),
    ).filter(F.col("_tok") != "")
    return (
        toks.groupBy(id_col, "_n", token_bucket("_tok", n_buckets).alias("b"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            id_col,
            "b",
            F.floor(F.lit(1000) * F.col("_c") / F.col("_n"))
            .cast("long")
            .alias("x"),
        )
    )


def _logit_micro_times_1e9(sparse_dot: Column, bias_micro: int) -> Column:
    """Integer nano-units of the logit: Σ x_milli·w_micro + 1000·bias."""
    return F.coalesce(sparse_dot, F.lit(0)) + F.lit(1000 * bias_micro)


def _p_micro(z_nano: Column) -> Column:
    """round(1e6·sigmoid(z)) as BIGINT — the shared scoring formula
    (round is half-away-from-zero in both engines for the always-positive
    sigmoid)."""
    return F.round(
        F.lit(1000000.0)
        / (F.lit(1.0) + F.exp(-(z_nano.cast("double") / F.lit(1.0e9)))),
        0,
    ).cast("long")


def train_logreg_quantized(
    docs: DataFrame,
    label_col: Column | str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    lr: int = 8,
    n_iter: int = 6,
) -> QuantLogRegModel:
    """Integer-quantized full-batch GD (header comment above for the
    cross-engine arithmetic contract). Per iteration ONE aggregate job:
    the sparse-feature join carries gradient rows per bucket plus a
    b = −1 row per doc for the bias gradient and the row count. ``docs``
    is the TRAINING frame (callers pass the deterministic sample — the
    sample-fit rule); featurization is computed once and persisted."""
    labels = docs.select(
        F.col(id_col).alias("_id"),
        (F.col(label_col) if isinstance(label_col, str) else label_col)
        .cast("long")
        .alias("_y"),
    )
    sparse = hashed_counts_milli(docs, id_col, text_col, n_buckets).select(
        F.col(id_col).alias("_id"), "b", "x"
    )
    # Per-doc dense carrier, built ONCE: (id, y, [(b, x)...]). Each
    # iteration is then a NARROW dot/residual projection (the weights as
    # a packed literal — the train_logreg shape) plus ONE explode +
    # groupBy(b) shuffle for the gradient; the first cut joined three
    # shuffles per iteration and was scheduling-bound at any data size.
    # Gradient sums are integers, so the regrouped aggregation order
    # cannot change a single bit of the result.
    empty_f = F.expr("CAST(array() AS array<struct<b: int, x: bigint>>)")
    base = (
        labels.join(
            sparse.groupBy("_id").agg(
                F.collect_list(F.struct("b", "x")).alias("_f")
            ),
            "_id",
            "left",
        )
        .select("_id", "_y", F.coalesce("_f", empty_f).alias("_f"))
        .persist()
    )
    try:
        bias_row = F.struct(
            F.lit(-1).alias("b"), F.lit(1).cast("long").alias("x")
        )
        w = [0] * n_buckets
        bias = 0
        import math

        for _ in range(n_iter):
            w_lit = F.array(*[F.lit(int(v)).cast("long") for v in w])
            dot = F.aggregate(
                F.col("_f"),
                F.lit(0).cast("long"),
                lambda acc, s: acc + s["x"] * F.element_at(w_lit, s["b"] + 1),
            )
            r = (
                _p_micro(_logit_micro_times_1e9(dot, bias))
                - F.lit(1000000) * F.col("_y")
            )
            g = (
                base.select(
                    r.alias("_r"),
                    F.explode(F.concat(F.array(bias_row), F.col("_f"))).alias("s"),
                )
                .groupBy(F.col("s.b").alias("b"))
                .agg(
                    F.sum(F.col("_r") * F.col("s.x")).alias("gsum"),
                    F.count(F.lit(1)).alias("cnt"),
                )
                .collect()
            )
            if not g:
                raise ValueError(
                    "train_logreg_quantized: empty training frame — nothing to fit"
                )
            grad = {int(row["b"]): int(row["gsum"]) for row in g}
            n = next(int(row["cnt"]) for row in g if int(row["b"]) == -1)
            w = [
                wv - math.floor(lr * grad.get(d, 0) / (1000 * n))
                for d, wv in enumerate(w)
            ]
            bias -= math.floor(lr * grad.get(-1, 0) / n)
    finally:
        # every exit path releases the per-doc carrier
        base.unpersist()
    return QuantLogRegModel(
        weights_micro=w, bias_micro=bias, n_buckets=n_buckets
    )


def logreg_score_micro_frame(
    docs: DataFrame,
    model: QuantLogRegModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, clf_score_micro): round(1e6·sigmoid(logit)) per document under
    the quantized model — weights ride as ONE packed literal; the corpus
    pass is the featurize explode + one keyed aggregate (no join against
    anything corpus-sized)."""
    w_lit = F.array(*[F.lit(int(v)).cast("long") for v in model.weights_micro])
    dot = (
        hashed_counts_milli(docs, id_col, text_col, model.n_buckets)
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.element_at(w_lit, F.col("b") + 1)).alias("_dot"))
    )
    return docs.select(id_col).join(dot, id_col, "left").select(
        id_col,
        _p_micro(
            _logit_micro_times_1e9(F.col("_dot"), model.bias_micro)
        ).alias("clf_score_micro"),
    )
