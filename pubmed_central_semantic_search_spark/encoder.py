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


def fake_encode_one(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic unit vector from the text's md5 (FIXTURES.md A5).

    Properties: identical text → identical vector; distinct texts →
    (near-orthogonal) distinct vectors; no wall-clock or global RNG.
    """
    seed = int.from_bytes(hashlib.md5(text.encode("utf-8")).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def fake_encode_batch(texts: pd.Series, dim: int = DEFAULT_DIM) -> pd.Series:
    return texts.map(lambda t: fake_encode_one(t if t is not None else "", dim))


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

        def _one(text):
            seed = int.from_bytes(
                _hashlib.md5(text.encode("utf-8")).digest()[:4], "little"
            )
            rng = _np.random.RandomState(seed)
            v = rng.standard_normal(dim).astype(_np.float32)
            n = float(_np.linalg.norm(v))
            return v / n if n > 0 else v

        for texts in batches:
            yield texts.map(lambda t: _one(t if t is not None else ""))

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
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)  # once per python worker
        for texts in batches:
            vecs = model.encode(
                texts.fillna("").tolist(), batch_size=batch_size
            )
            yield pd.Series([np.asarray(v, dtype=np.float32) for v in vecs])

    return encode


def get_encoder_udf(kind: str = "fake", dim: int = DEFAULT_DIM, **kwargs):
    if kind == "fake":
        return fake_encoder_udf(dim)
    if kind == "sbert":
        return sbert_encoder_udf(**kwargs)
    raise ValueError(f"unknown encoder kind: {kind}")


def encode_column(col: Column | str, kind: str = "fake", dim: int = DEFAULT_DIM) -> Column:
    """E1 as a column expression: ``encode_column("paragraph")``."""
    col = F.col(col) if isinstance(col, str) else col
    return get_encoder_udf(kind, dim)(col)
