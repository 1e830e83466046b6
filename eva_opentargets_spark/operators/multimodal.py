"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): set
`fake=True` for a deterministic stand-in that exercises the full Spark-side
path (schema, partitioning, UDF signature, batch shape), or `fake=False` to
get the honest NotImplementedError where a real decoder (PIL/libsndfile)
would plug in. Everything around the stub — the schemas, the mapInPandas
batching, the partition strategy — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    ArrayType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), False),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("content_sha", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': features derived from the content hash.
    Stands in for resize/frame-sample/spectrogram until a real codec lib is
    available."""
    h = hashlib.sha256(content).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow ships each partition as pandas batches; per batch we hash +
    (fake-)decode. Partitioning guidance at scale: media tables should be
    bucketed by media_id and have content sizes bounded per row group so a
    batch fits executor memory (spark.sql.execution.arrow.maxRecordsPerBatch
    interacts with row width — binary columns dominate).
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/libsndfile — not available in this container"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "content_sha": pdf["content"].map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": pdf["content"].map(lambda b: _fake_decode_features(b, dim)),
                }
            )
            yield out

    return media.mapInPandas(process, FEATURES)
