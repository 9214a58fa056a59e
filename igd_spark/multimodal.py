"""Multimodal column plumbing — images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The Spark-side machinery (schemas, mapInPandas batch shape, partitioning,
metadata extraction) is real and tested; the actual codec step is stubbed
behind an import-try (PIL / soundfile are not in this container) with a
clearly-marked deterministic fake, per the build brief. The pattern mirrors
the reference's treatment of records as opaque fixed-width payloads streamed
block-at-a-time (src/igd_search.c:470-474): the engine never interprets the
payload bytes in the plan — only inside the vectorized kernel.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),     # opaque bytes
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

MEDIA_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("md5_8", T.StringType(), False),
        T.StructField("entropy_q", T.IntegerType(), False),  # quantized 0..8000 (milli-bits)
    ]
)

FEATURE_DIM = 16

# float64 end-to-end: the per-dim values are verified against a DuckDB oracle
# at 6 dp, and a float32 round-trip perturbs the 6th decimal
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def synth_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table derived from a text corpus: payload =
    utf-8 bytes of the text (stands in for encoded image/audio bytes), type
    cycles by id. Pure built-ins — this is a test fixture generator, not a
    decode."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        mt.alias("media_type"),
        F.encode(t, "utf-8").alias("payload"),
        F.when(mt == "image", (F.length(t) % 1024 + 1).cast("int")).alias("meta_width"),
        F.when(mt == "image", (F.length(t) % 768 + 1).cast("int")).alias("meta_height"),
        F.when(mt != "image", (F.length(t) * 40 + 1).cast("int")).alias("meta_duration_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """(media_id, media_type, n_bytes, md5_8, entropy_q) via mapInPandas —
    one Arrow batch per call, numpy byte-histogram entropy, no per-row
    Python beyond the hash call (hashlib releases the GIL on large inputs).

    Cross-engine spec (mirrored by the DuckDB oracle, which has no blob
    byte access): md5_8 = md5 of the UPPERCASE hex of the payload bytes;
    entropy (bits/byte) = log2(n) - sum(c*log2(c))/n over the positive
    byte-histogram counts c; entropy_q = floor(entropy*1000 + 0.5)
    (explicit half-up — python round() is half-even, SQL round is not)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype(np.int32)
            h8 = payloads.map(
                lambda b: hashlib.md5(bytes(b).hex().upper().encode()).hexdigest()[:8]
            )
            ents = np.zeros(len(pdf), dtype=np.int32)
            for i, b in enumerate(payloads):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    continue
                counts = np.bincount(arr, minlength=256).astype(np.float64)
                c = counts[counts > 0]
                n = float(arr.size)
                ent = float(np.log2(n) - (c * np.log2(c)).sum() / n)
                ents[i] = int(np.floor(ent * 1000.0 + 0.5))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype(np.int64),
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "md5_8": h8,
                    "entropy_q": ents,
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema=MEDIA_STATS_SCHEMA
    )


def _try_real_decode(payload: bytes, media_type: str):
    """Real codec hook. The container ships no image/audio libs, so this
    raises unless PIL/soundfile are importable — the Spark plumbing around
    it is exercised with the deterministic fake below."""
    if media_type == "image":
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError("image decode requires PIL (not in container)") from e
        return np.asarray(Image.open(io.BytesIO(payload)))
    raise NotImplementedError(f"no codec for media_type={media_type} in this container")


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """(media_id, feature[FEATURE_DIM]) — decode → featurize inside
    mapInPandas. With use_real_codec=False (default here) the decode is a
    DETERMINISTIC FAKE: feature = normalized byte-histogram of the payload
    folded to FEATURE_DIM buckets. The batch shape, schema and partition
    behavior are identical to the real path, so swapping in a real codec
    changes only `_try_real_decode`."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            feats = np.zeros((len(pdf), FEATURE_DIM), dtype=np.float64)
            for i, (b, mt) in enumerate(zip(pdf["payload"], pdf["media_type"])):
                raw = bytes(b)
                if use_real_codec:
                    decoded = _try_real_decode(raw, mt)  # pragma: no cover
                    arr = np.asarray(decoded, dtype=np.uint8).ravel()
                else:
                    arr = np.frombuffer(raw, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
                n = np.linalg.norm(hist)
                feats[i] = hist / n if n > 0 else hist
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype(np.int64), "feature": list(feats)}
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def extract_features_long(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """(media_id, dim, value) — long-format featurization: posexplode of
    extract_features with values rounded to 6 dp (F.round = half-up, same
    as SQL round). This is the externally-verifiable shape — an
    array<double> column defeats order-insensitive row canonicalization."""
    f = extract_features(media, use_real_codec=use_real_codec)
    return f.select(
        "media_id", F.posexplode("feature").alias("dim", "value")
    ).select(
        "media_id",
        F.col("dim").cast("int").alias("dim"),
        F.round("value", 6).alias("value"),
    )


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(media_id, frame_idx, frame_offset) — deterministic frame-sampling
    plan for video payloads: n_frames evenly-spaced byte offsets. A real
    demuxer would translate offsets to frames; the plan-side logic
    (explode, even spacing, video-only filter) is the real deliverable."""
    v = media.filter(F.col("media_type") == "video")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    out = v.select("media_id", F.length("payload").alias("n_bytes"), idx)
    return out.select(
        "media_id",
        "frame_idx",
        F.floor(F.col("frame_idx") * F.col("n_bytes") / n_frames).cast("int").alias("frame_offset"),
    )
