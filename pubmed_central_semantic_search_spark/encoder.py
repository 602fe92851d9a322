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

    shake_128(text) → 8·dim digest bytes → uint32 pairs → Box-Muller
    normals → L2-normalize. Fully numpy-vectorized over the batch (the
    per-row hashing is the only Python-loop work, ~1 µs/row) — an earlier
    per-row ``np.random.RandomState`` version cost ~300 µs/row and
    dominated the whole document pipeline.

    Properties: identical text → identical vector; distinct texts →
    (near-orthogonal) distinct vectors; no wall-clock or global RNG.
    """
    nb = 8 * dim  # 2 uint32 per normal (Box-Muller pair)
    buf = bytearray(len(texts) * nb)
    for i, t in enumerate(texts):
        buf[i * nb : (i + 1) * nb] = hashlib.shake_128(
            (t if t is not None else "").encode("utf-8")
        ).digest(nb)
    m = np.frombuffer(bytes(buf), dtype="<u4").reshape(len(texts), 2 * dim)
    u = (m.astype(np.float64) + 0.5) / 2.0**32
    z = (np.sqrt(-2.0 * np.log(u[:, :dim])) * np.cos(2.0 * np.pi * u[:, dim:])).astype(
        np.float32
    )
    norms = np.linalg.norm(z, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return z / norms


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
            nb = 8 * dim
            buf = bytearray(len(texts) * nb)
            for i, t in enumerate(texts):
                buf[i * nb : (i + 1) * nb] = _hashlib.shake_128(
                    (t if t is not None else "").encode("utf-8")
                ).digest(nb)
            m = _np.frombuffer(bytes(buf), dtype="<u4").reshape(len(texts), 2 * dim)
            u = (m.astype(_np.float64) + 0.5) / 2.0**32
            z = (
                _np.sqrt(-2.0 * _np.log(u[:, :dim]))
                * _np.cos(2.0 * _np.pi * u[:, dim:])
            ).astype(_np.float32)
            norms = _np.linalg.norm(z, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            return z / norms

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
