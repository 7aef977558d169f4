"""Multimodal column plumbing (SURVEY §2.6 X6).

Images/audio/video ride through the engine as opaque `binary` payload
columns plus a typed metadata struct. The Spark-side machinery — schema,
partition-friendly batch iteration, Arrow-batched UDF signatures — is real
and tested; the actual media decode is STUBBED (no image/audio libraries in
this environment) behind `decode_stub`, which either raises
NotImplementedError (strict) or produces a deterministic fake so pipelines
can be exercised end-to-end.

At scale: payloads ≤ a few MB stay inline in parquet/binaryFile rows;
larger assets should be pointers (path + byte range) with `binaryFile`
scans per partition. `mapInPandas` keeps decode vectorized per Arrow batch
(never a row-at-a-time Python UDF).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, first_byte int, magic string, width int, height int"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + metadata struct. In this test
    environment the payload is the UTF-8 encoding of the text column (a
    stand-in for real image/audio bytes — same plumbing, fake content)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.length(payload).alias("byte_len"),
            F.lit("application/octet-stream").alias("content_type"),
        ),
    )


def decode_stub(payload: bytes, strict: bool = False) -> tuple[int, int]:
    """STUB for the media decode step. Real deployments plug PIL/ffmpeg here.

    strict=True raises NotImplementedError (the honest production posture
    when codecs are absent); otherwise returns a deterministic fake
    (width, height) derived from the bytes so downstream plumbing is
    testable and oracle-checkable."""
    if strict:
        raise NotImplementedError("media codecs are not available in this environment")
    if not payload:
        return (0, 0)
    return (payload[0] % 256, len(payload) % 256)


def decode_media(df: DataFrame, id_col: str = "doc_id", strict: bool = False) -> DataFrame:
    """Vectorized 'decode' over Arrow batches via mapInPandas.

    The UDF signature, batch iteration, and output schema are exactly what a
    real image decode would use; only the pixel work is the stub."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode_stub(p, strict) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [len(p) if p is not None else 0 for p in payloads],
                    "first_byte": [p[0] if p else None for p in payloads],
                    "magic": [p[:4].hex() if p is not None else None for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, DECODED_SCHEMA)
