"""Multimodal column plumbing (image/audio/video as opaque binary).

Decode tiers:
- **PNG images decode for real** via the pure-stdlib codec in
  functions/png.py (zlib inflate + scanline unfilter) — width/height/
  channels/per-channel means become the leading feature dimensions.
- other codecs (JPEG, audio, video) need libraries absent from this
  container, so they remain stubbed: a clearly-marked
  NotImplementedError (real mode) or a deterministic fake (test mode).

Everything Spark-side is real and tested either way: the typed schema,
Arrow batch shapes, mapInPandas signatures, and partitioning behavior,
so swapping in PIL/torchaudio/pyav is a one-function change on a
cluster that has them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def _real_decode(data: bytes, media_type: str, feature_dim: int) -> list[float]:
    """Real decode where a stdlib codec exists (PNG); raise otherwise.

    PNG feature layout: [width/1e4, height/1e4, channels/4,
    mean_c0..mean_cN, 0-padding] truncated/padded to feature_dim."""
    from rdf_knowledge_extractor_spark.functions.png import is_png, png_stats

    if media_type == "image" and is_png(data):
        w, h, c, means = png_stats(data)
        feat = [w / 1e4, h / 1e4, c / 4.0, *means]
        feat = feat[:feature_dim]
        return feat + [0.0] * (feature_dim - len(feat))
    raise NotImplementedError(
        f"no stdlib decoder for media_type={media_type!r} with this "
        "signature — PNG is decoded natively (functions/png.py); "
        "JPEG/audio/video require PIL/torchaudio/pyav (absent in this "
        "container); use deterministic_fake=True or a cluster image "
        "that bundles the codecs"
    )


def _fake_feature(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding: bytes → blake2b → dim floats in [0,1)."""
    h = hashlib.blake2b(data or b"", digest_size=4 * dim).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def extract_media_features(
    media_df: DataFrame,
    deterministic_fake: bool = True,
    feature_dim: int = 8,
    id_col: str = "media_id",
    bin_col: str = "media",
    type_col: str = "media_type",
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[bin_col]) if r[bin_col] is not None else b""
                if deterministic_fake:
                    feature = _fake_feature(data, feature_dim)
                    decoder = "fake-blake2b-v1"
                else:
                    feature = _real_decode(data, r[type_col], feature_dim)
                    decoder = "png-stdlib-v1"
                rows.append(
                    {
                        "media_id": int(r[id_col]),
                        "byte_len": len(data),
                        "content_md5": hashlib.md5(data).hexdigest(),
                        "feature": feature,
                        "decoder": decoder,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    pruned = media_df.select(id_col, bin_col, type_col)
    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test fixture: treat document text bytes as opaque media blobs."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("image").alias("media_type"),
        F.create_map(F.lit("origin"), F.lit("documents")).alias("meta"),
    )
