"""Multimodal columns (SURVEY §2.9 X5; north star "multimodal columns").

Anchor: the reference's only non-text modality is the unimplemented PDF
source (S6). Design: media are opaque ``binary`` columns + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

The actual codec work is STUBBED (image/audio libs are not in this
container — each stub either raises ``NotImplementedError`` or, for
pipeline testing, produces a deterministic fake). What IS real and tested:
the schemas, the UDF signatures and batch shapes, the partitioning
pattern, and the binaryFile reader plumbing — swapping a stub for
PIL/ffmpeg is a one-function change, not an architecture change.

Scale notes: binary payloads ride the same columnar path as everything
else; keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` low for wide
media rows so a batch fits executor memory, and partition media tables by
(modality, size bucket) so decode stages don't straggle on mixed sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """X5 source — directory of media files → (path, modificationTime,
    length, content) via Spark's binaryFile source, normalized to
    MEDIA_SCHEMA (modality from extension; decode fills real meta later)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality = (
        F.when(ext.isin("png", "jpg", "jpeg", "gif"), "image")
        .when(ext.isin("wav", "mp3", "flac"), "audio")
        .when(ext.isin("mp4", "avi", "mkv"), "video")
        .otherwise("unknown")
    )
    return raw.select(
        F.col("path").alias("media_id"),
        modality.alias("modality"),
        F.col("content"),
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


DECODED_SCHEMA = (
    "media_id string, modality string, n_bytes bigint, content_md5 string, "
    "feature array<float>, error string"
)


def extract_features(df: DataFrame, dim: int = 16, real_decode: bool = False) -> DataFrame:
    """X5 decode + feature-extract stage (mapInPandas, Arrow-batched).

    ``real_decode=True`` is the seam for an actual codec (PIL/torchaudio)
    — deliberately unimplemented here (no media libs in this container).
    The default path computes a deterministic fake feature (hash-seeded,
    like encoder.py) from the raw bytes, so downstream plumbing (ANN over
    media embeddings, dedup by feature) is testable end to end."""
    if real_decode:
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio/ffmpeg — not in "
            "this container. The mapInPandas plumbing below is the "
            "production shape; plug the codec into `_feature`."
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np

        def _feature(content: bytes):
            seed = int.from_bytes(
                _hashlib.md5(content).digest()[:4], "little"
            )
            rng = _np.random.RandomState(seed)
            v = rng.standard_normal(dim).astype(_np.float32)
            n = float(_np.linalg.norm(v))
            return (v / n) if n > 0 else v

        for pdf in batches:
            out = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                try:
                    blob = bytes(content) if content is not None else b""
                    # content_md5 certifies the binary payload survived the
                    # Spark -> Arrow -> pandas hop byte-for-byte: the driver
                    # oracle recomputes it engine-side (DuckDB md5(text)).
                    out.append(
                        (
                            mid,
                            modality,
                            len(blob),
                            _hashlib.md5(blob).hexdigest(),
                            _feature(blob),
                            None,
                        )
                    )
                except Exception as ex:
                    out.append((mid, modality, None, None, None, repr(ex)[:200]))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "modality",
                    "n_bytes",
                    "content_md5",
                    "feature",
                    "error",
                ],
            )

    return df.mapInPandas(_extract, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """X5 video frame-sampling *plan*: one output row per planned frame
    timestamp (sequence over duration) — the explode happens JVM-side;
    only the (stubbed) frame decode would touch the binary payload."""
    return df.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = (
    "media_id string, width int, height int, n_bytes_in bigint, "
    "n_bytes_out bigint, content binary, error string"
)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    real_decode: bool = False,
) -> DataFrame:
    """X5 resize stage (mapInPandas, Arrow-batched) — the remaining stub
    of the decode / feature-extract / RESIZE / frame-sample quartet.

    ``real_decode=True`` is the PIL seam (decode → resize → re-encode),
    unimplemented in this container. The default path emits a
    deterministic fake: a content-addressed byte payload whose size
    scales like a real thumbnail (proportional to width × height), so
    everything AROUND the codec — binary-in/binary-out Arrow transfer,
    per-row error isolation, output schema, downstream writes — runs and
    is testable end to end. Rows that aren't images pass to the error
    column rather than poisoning the batch."""
    if real_decode:
        raise NotImplementedError(
            "real image resizing requires PIL — not in this container. "
            "The mapInPandas plumbing below is the production shape; plug "
            "the codec into `_resize`."
        )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def _resize(content: bytes) -> bytes:
            # deterministic fake thumbnail: content-addressed bytes, size
            # ~ 3 bytes/pixel like an uncompressed RGB thumbnail
            n_out = max(1, width * height * 3)
            return _hashlib.shake_128(
                content + f"#{width}x{height}".encode()
            ).digest(n_out)

        for pdf in batches:
            out = []
            for mid, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                try:
                    if modality != "image":
                        out.append((mid, width, height, None, None, None,
                                    f"not an image: {modality}"))
                        continue
                    blob = bytes(content) if content is not None else b""
                    resized = _resize(blob)
                    out.append(
                        (mid, width, height, len(blob), len(resized), resized, None)
                    )
                except Exception as ex:
                    out.append((mid, width, height, None, None, None, repr(ex)[:200]))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_bytes_in",
                    "n_bytes_out", "content", "error",
                ],
            )

    return df.mapInPandas(_run, RESIZED_SCHEMA)
