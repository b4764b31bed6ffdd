"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata. The Spark-side shapes (schema, partitioning, Arrow
batch handling, UDF signatures) are real and tested; the actual codec work
is stubbed behind DECODERS because the image/audio libraries are not in
this container — swap in PIL/torchaudio/PyAV implementations per modality
on a real cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes int, sha256 string, "
    "feature array<float>, decode_ok boolean"
)


def _fake_decode(payload: bytes, modality: str, feat_dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: a hash-seeded
    projection of the payload bytes. Replace with a real decoder."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(feat_dim).astype(np.float32)


def real_decode(payload: bytes, modality: str):  # pragma: no cover
    """Entry point for real codecs — intentionally unimplemented here."""
    raise NotImplementedError(
        "media decoding requires PIL/torchaudio/PyAV; not available in this environment"
    )


DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def extract_features(media: DataFrame, feat_dim: int = 16, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction: binary payloads arrive in bounded
    Arrow batches (media rows are large — keep batches small via
    spark.sql.execution.arrow.maxRecordsPerBatch or repartition upstream)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats, oks, hashes, sizes = [], [], [], []
                for payload, modality in zip(chunk["payload"], chunk["modality"]):
                    data = bytes(payload or b"")
                    sizes.append(len(data))
                    hashes.append(hashlib.sha256(data).hexdigest())
                    dec = DECODERS.get(modality)
                    try:
                        if dec is None:
                            raise NotImplementedError(modality)
                        feats.append([float(x) for x in dec(data, modality, feat_dim)])
                        oks.append(True)
                    except NotImplementedError:
                        feats.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "modality": chunk["modality"],
                        "n_bytes": np.array(sizes, dtype=np.int32),
                        "sha256": hashes,
                        "feature": feats,
                        "decode_ok": oks,
                    }
                )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(
            hashlib.sha256(f"media-{i}".encode()).digest() * ((i % 5) + 1)
        )
        rows.append(
            (i, modality, f"application/x-fake-{modality}", payload, {"idx": str(i)})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
