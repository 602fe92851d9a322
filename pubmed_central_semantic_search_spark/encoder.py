"""Text → dense-vector encoders (SURVEY §2.5 E1 — the engine's flagship UDF).

The reference calls ``SentenceTransformer.encode`` inline at ingest and
query time (``/root/reference/src/backend/database/qdrant.py:59,118-120,236``;
model ``multi-qa-mpnet-base-dot-v1``, 768-dim, ``app.py:17``). In Spark the
encoder is an Arrow-batched ``pandas_udf``:

- SCALAR_ITER form → the model loads ONCE per python worker, then streams
  Arrow batches (the analog of the reference's ``batch_size=32/64`` GPU
  batching, ``qdrant.py:59``, ``armac_scientific_papers.py:56,61``).
- Batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Two implementations behind one seam:

- ``fake``: deterministic hash-seeded unit vectors (FIXTURES.md A5) — the
  correctness/test path; no torch dependency; stable goldens.
- ``sbert``: real sentence-transformers, gated behind an import-try (the
  library is not in this container); same UDF shape, so swapping it in is
  a config change, not a code change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_DIM = 64  # tests/fixtures; the reference's real model is 768-dim


def fake_encode_matrix(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic unit vectors, one row per text (FIXTURES.md A5).

    Construction chosen for BIT-EXACT reproducibility in ANSI SQL (the
    q21 oracle recomputes it in DuckDB — every op below is an IEEE-754
    correctly-rounded double op in a fixed sequential order):

    - component pair 2j, 2j+1 ← md5(text ∥ 0x1f ∥ str(j)): little-endian
      u64 of digest bytes [0:8] (DuckDB ``md5_number_upper``) and [8:16]
      (``md5_number_lower``)
    - u64 → double (round-nearest) / 2^63 − 1.0 → uniform in [−1, 1)
    - L2 norm from a SEQUENTIAL left-fold of squares (np.cumsum here,
      ``list_reduce`` there — np.sum's pairwise summation would diverge)
    - divide in float64, then one rounding cast to float32.

    Properties: identical text → identical vector; distinct texts →
    distinct near-orthogonal vectors; no wall-clock or global RNG.
    """
    n_h = (dim + 1) // 2  # one md5 per component PAIR
    buf = bytearray(len(texts) * n_h * 16)
    for i, t in enumerate(texts):
        # md5(text ∥ 0x1f) absorbed ONCE, then copy()+update(j) per pair:
        # identical digests to md5(text ∥ 0x1f ∥ j) at O(len + dim)
        # instead of O(len · dim) — the text is only hashed once per row.
        h0 = hashlib.md5((t if t is not None else "").encode("utf-8") + b"\x1f")
        off = i * n_h * 16
        for j in range(n_h):
            h = h0.copy()
            h.update(str(j).encode())
            buf[off + j * 16 : off + (j + 1) * 16] = h.digest()
    m = np.frombuffer(bytes(buf), dtype="<u8").reshape(len(texts), 2 * n_h)[:, :dim]
    u = m.astype(np.float64) / 9223372036854775808.0 - 1.0
    norms = np.sqrt(np.cumsum(u * u, axis=1)[:, -1:])
    norms[norms == 0.0] = 1.0
    return (u / norms).astype(np.float32)


def fake_encode_one(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    return fake_encode_matrix([text], dim)[0]


def fake_encoder_udf(dim: int = DEFAULT_DIM):
    """SCALAR_ITER pandas_udf: Series[str] → Series[array<float>].

    Deliberately SELF-CONTAINED (no references to this module's globals):
    cloudpickle then ships the closure by value, so executors need neither
    this package on PYTHONPATH nor an addPyFile'd wheel — the UDF runs in
    any session, including the driver harness's. Every Python UDF in this
    package follows this rule.
    """

    @F.pandas_udf("array<float>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # "model load" happens here, once per worker — the fake has nothing
        # to load, but the seam is identical to the sbert path.
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def _matrix(texts):
            n_h = (dim + 1) // 2
            buf = bytearray(len(texts) * n_h * 16)
            for i, t in enumerate(texts):
                h0 = _hashlib.md5(
                    (t if t is not None else "").encode("utf-8") + b"\x1f"
                )
                off = i * n_h * 16
                for j in range(n_h):
                    h = h0.copy()
                    h.update(str(j).encode())
                    buf[off + j * 16 : off + (j + 1) * 16] = h.digest()
            m = _np.frombuffer(bytes(buf), dtype="<u8").reshape(
                len(texts), 2 * n_h
            )[:, :dim]
            u = m.astype(_np.float64) / 9223372036854775808.0 - 1.0
            norms = _np.sqrt(_np.cumsum(u * u, axis=1)[:, -1:])
            norms[norms == 0.0] = 1.0
            return (u / norms).astype(_np.float32)

        for texts in batches:
            yield _pd.Series(list(_matrix(texts.tolist())), index=texts.index)

    return encode


def sbert_encoder_udf(
    model_name: str = "sentence-transformers/multi-qa-mpnet-base-dot-v1",
    batch_size: int = 32,
):
    """Real encoder (reference parity: qdrant.py:59,118-120). Requires
    sentence-transformers at runtime on the executors; raises ImportError
    eagerly if unavailable so the caller can fall back."""
    import sentence_transformers  # noqa: F401  (gate: not in this container)

    @F.pandas_udf("array<float>")
    def encode(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import sentence_transformers as _st
        from sentence_transformers import SentenceTransformer

        # SCALAR_ITER bodies run once per TASK; cache the loaded model on
        # the module object so reused python workers (the default
        # spark.python.worker.reuse=true) keep it ACROSS tasks — without
        # this a thousand small tasks pay a thousand multi-second loads
        cache = getattr(_st, "_spark_model_cache", None)
        if cache is None:
            cache = {}
            _st._spark_model_cache = cache
        model = cache.get(model_name)
        if model is None:
            model = SentenceTransformer(model_name)
            cache[model_name] = model
        for texts in batches:
            vecs = model.encode(
                texts.fillna("").tolist(), batch_size=batch_size
            )
            yield pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

    return encode


SBERT_MODEL_DIMS = {
    # the reference's model (app.py:17) and its output width
    "sentence-transformers/multi-qa-mpnet-base-dot-v1": 768,
}


def get_encoder_udf(kind: str = "fake", dim: int = DEFAULT_DIM, **kwargs):
    if kind == "fake":
        return fake_encoder_udf(dim)
    if kind == "sbert":
        # dim is NOT forwarded to the model (its output width is fixed by
        # the architecture) — but silently ignoring a mismatched dim let
        # an engine built with dim=64 store 768-dim chunk vectors, pool
        # doc vectors truncated to 64, and score cosine(64, 768) = all
        # NULL. Validate eagerly instead.
        model_name = kwargs.get(
            "model_name", "sentence-transformers/multi-qa-mpnet-base-dot-v1"
        )
        known = SBERT_MODEL_DIMS.get(model_name)
        if known is None:
            # silently skipping validation for an unlisted model would
            # reinstate the exact all-NULL-cosine hazard this guard was
            # added for (review find) — fail loud, ask for the fact
            raise ValueError(
                f"encoder kind='sbert': unknown model {model_name!r} — "
                "add its output width to encoder.SBERT_MODEL_DIMS so the "
                "engine dim can be validated eagerly"
            )
        if dim != known:
            raise ValueError(
                f"encoder kind='sbert' model {model_name!r} emits "
                f"{known}-dim vectors but dim={dim} was requested — "
                f"construct the engine with dim={known}"
            )
        return sbert_encoder_udf(**kwargs)
    raise ValueError(f"unknown encoder kind: {kind}")


def encode_column(
    col: Column | str, kind: str = "fake", dim: int = DEFAULT_DIM, **kwargs
) -> Column:
    """E1 as a column expression: ``encode_column("paragraph")``.
    ``dim``/``kwargs`` thread through to the encoder (review find: the
    streaming ingest path could not pass dim, so encoder='sbert' always
    tripped the eager dim guard there)."""
    col = F.col(col) if isinstance(col, str) else col
    return get_encoder_udf(kind, dim, **kwargs)(col)
