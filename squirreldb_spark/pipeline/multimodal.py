"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column (or a storage URI to fetch lazily); decode / feature
extraction runs as Arrow-batched ``mapInPandas`` so each Python worker
processes whole record batches, never single rows. Partitioning stays
payload-size aware (``spark.sql.files.maxPartitionBytes``), and decoded
features are small fixed-width columns that flow back into JVM-side
operators.

The decode step itself is STUBBED: the real image/audio libraries are not
in this container. :func:`decode_stub` raises, and
:func:`extract_features` uses a deterministic pure-Python featurizer
(byte length / md5 checksum / crude byte histogram) so the Spark-side
plumbing — schema, batch shape, Arrow round-trip — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, checksum string, head_byte long, tail_byte long"
)


def decode_stub(payload: bytes) -> None:
    """Real decode (PIL/ffmpeg/...) is unavailable in this environment."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; wire a real decoder here in production"
    )


def as_binary_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in multimodal table: utf-8 payload bytes + metadata columns.

    In production this is the parquet table of raw media blobs; here the
    documents table doubles as one so the plumbing is exercised end-to-end.
    """
    return docs.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.length(text_col).alias("declared_len"),
        ).alias("meta"),
    )


def extract_features(binary_table: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each batch is a pandas DataFrame; the featurizer is
    vectorized per batch. Deterministic (md5 checksum), so it has an exact
    SQL oracle even though it runs in Python.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len),
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "head_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "tail_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                }
            )

    return binary_table.mapInPandas(featurize, schema=FEATURE_SCHEMA)


SQL_EXTRACT_FEATURES = """
SELECT doc_id,
       strlen(text) AS byte_len,
       md5(text) AS checksum,
       ord(substr(text, 1, 1)) AS head_byte,
       ord(substr(text, strlen(text), 1)) AS tail_byte
FROM documents
"""
