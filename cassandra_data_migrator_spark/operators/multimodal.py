"""Multimodal column plumbing (north-star mandate): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
Pandas functions over ``mapInPandas``.

The Spark-side machinery here is real and tested: schemas, batch iteration,
partition-preserving transforms, deterministic fake "decode". The actual
codec work (PIL/ffmpeg/torchaudio) is NOT in this container, so the decode
kernels are stubbed behind ``NotImplementedError`` with a deterministic fake
used by tests — swapping in a real decoder changes one function, not the
pipeline (prompt: 'make the Spark-side plumbing real and tested, stub the
decode').

Design for 100 TB: binary payloads never pass through Python row-at-a-time —
mapInPandas streams Arrow record batches; metadata-only operations (filtering
by mime/size, sampling frames by index) stay in JVM expressions and never
touch the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("feat_dim", IntegerType()),
        StructField("feat_norm", StringType()),  # deterministic digest of the feature
    ]
)


def decode_image(payload: bytes) -> object:
    """Real decoder hook — intentionally unimplemented in this container.

    Production: PIL.Image.open(io.BytesIO(payload)); tests use
    ``_fake_feature`` via ``extract_features(..., use_fake=True)``.
    """
    raise NotImplementedError("image decoding requires PIL; not available in this env")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→embed: byte-histogram moments."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    total = float(len(payload))
    return [a / total for a in acc]


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata derivation stays JVM-side: no payload bytes enter Python."""
    return df.withColumn("n_bytes", F.octet_length(F.col(payload_col)).cast("bigint"))


def filter_by_mime(df: DataFrame, mimes: list[str]) -> DataFrame:
    return df.filter(F.col("mime").isin(mimes))


def extract_features(df: DataFrame, dim: int = 8, use_fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Batch shape: pandas DataFrames of the input partition; output conforms to
    FEATURE_SCHEMA. The kernel is the only stubbed piece.
    """
    # NB: the batch fn is a self-contained closure (no references to module-
    # level functions) so cloudpickle ships it by value — Python workers never
    # need this package importable.
    def _batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        def fake_feature(payload: bytes) -> list[float]:
            if not payload:
                return [0.0] * dim
            acc = [0] * dim
            for i, b in enumerate(payload):
                acc[i % dim] += b
            total = float(len(payload))
            return [a / total for a in acc]

        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if use_fake:
                    vec = fake_feature(raw)
                else:  # pragma: no cover - real decoder absent here
                    raise NotImplementedError(
                        "image decoding requires PIL; not available in this env"
                    )
                feats.append(hashlib.md5(str([round(x, 6) for x in vec]).encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feat_dim": dim,
                    "feat_norm": feats,
                }
            )

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


DIGEST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
    ]
)


def payload_digest(df: DataFrame) -> DataFrame:
    """Arrow-batched payload digestion over mapInPandas — the oracle-checkable
    half of the multimodal path: per-payload byte length and md5, computed in
    Python from the raw bytes the JVM handed over. Because both outputs are
    exactly reproducible in ANSI SQL (octet_length / md5), the driver's
    DuckDB check verifies the Arrow binary round-trip BYTE-FOR-BYTE — if
    batching, encoding, or null handling corrupted a single payload byte the
    hashes would diverge. Same batch shape as extract_features."""

    def _batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            n_bytes, digests = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                n_bytes.append(len(raw))
                digests.append(hashlib.md5(raw).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes,
                    "payload_md5": digests,
                }
            )

    return df.mapInPandas(_batches, DIGEST_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int, frame_col: str = "media_id") -> DataFrame:
    """Deterministic frame sampling by index — a pure JVM filter, the payload
    column is untouched (columnar pruning keeps it out of the scan if the
    downstream projection drops it)."""
    return df.filter((F.col(frame_col) % every_nth) == 0)
