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
    stand-in for real image/audio bytes — same plumbing, fake content).

    ASCII-ONLY INVARIANT: consumers that slice the payload into
    byte-indexed frames and compare against a character-indexed text
    oracle (x6_scene_cuts, x6_blockhash_near_dup) are equivalent only
    while every text codepoint is single-byte — a multibyte character
    shifts byte frame boundaries off character boundaries and makes
    CAST(binary AS STRING) lossy on a split codepoint.  The synthetic
    documents corpus is ASCII by construction; the invariant is pinned
    by tests/test_round11_operators.py::test_documents_corpus_is_ascii.
    Real media bytes don't route through this stand-in at all — the
    production path decodes via decode_media."""
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


def codecs_available() -> bool:
    """Feature probe: True when a real image codec (PIL) is importable.
    The sandbox ships none; when one appears, decode_media's real path
    activates without touching the Arrow plumbing."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    strict: bool = False,
    use_codecs: bool | None = None,
) -> DataFrame:
    """Vectorized decode over Arrow batches via mapInPandas.

    use_codecs=None probes for PIL (codecs_available) at plan build;
    True decodes real pixels (Image.open per payload, stub fallback for
    undecodable bytes); False pins the deterministic stub — the DECLARED
    x6 queries pass False so their oracle hashes cannot flip if codecs
    appear in the environment. The UDF signature, batch iteration, and
    output schema are identical on every path; only the pixel work
    changes. Probe runs driver-side: on a heterogeneous cluster where
    executors lack PIL, pass use_codecs explicitly."""
    if use_codecs is None:
        use_codecs = codecs_available()

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        if use_codecs:
            import io as _io

            from PIL import Image

            def _dims(p):
                if not p:
                    return (0, 0)
                try:
                    with Image.open(_io.BytesIO(p)) as im:
                        return im.size
                except Exception:
                    return decode_stub(p, strict)
        else:

            def _dims(p):
                return decode_stub(p, strict)

        for pdf in it:
            payloads = pdf["payload"]
            dims = [_dims(p) for p in payloads]
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


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary, frame_len int"


def frame_sample(
    df: DataFrame, every: int = 4, frame_size: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling over a binary payload: split into fixed-size blocks
    ("frames") and keep every `every`-th one — the video-keyframe pattern
    (real decoders replace the block split with container parsing; the
    partitioning, explode shape, and per-frame row contract are identical).

    Pure built-in expressions: sequence+transform over the binary column,
    exploded to one row per kept frame. No Python in the row path.
    (substring on binary is 1-based, hence the i*size+1 offset.)"""
    pair_expr = (
        f"transform(filter(sequence(0, greatest(cast(ceil(length(payload) / {frame_size}) as int) - 1, 0)), "
        f"i -> i % {every} = 0), "
        f"i -> struct(cast(i as int) as frame_idx, substring(payload, i * {frame_size} + 1, {frame_size}) as frame_bytes))"
    )
    return (
        df.where(F.length("payload") > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(F.expr(pair_expr)).alias("fr"))
        .select(
            "doc_id",
            F.col("fr.frame_idx").alias("frame_idx"),
            F.col("fr.frame_bytes").alias("frame_bytes"),
            F.length("fr.frame_bytes").alias("frame_len"),
        )
    )


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, mean_byte double, distinct_bytes int, entropy double"
)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-payload byte statistics (the feature-extraction stage of a media
    pipeline) via Arrow-batched mapInPandas — REAL computation, no codecs
    needed: byte count, mean byte value, distinct byte count, Shannon
    entropy in bits/byte. Deterministic: entropy sums over ascending byte
    value in float64."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "n_bytes": [], "mean_byte": [], "distinct_bytes": [], "entropy": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(int(b.size))
                if b.size:
                    counts = np.bincount(b, minlength=256).astype(np.float64)
                    p = counts[counts > 0] / b.size
                    out["mean_byte"].append(float(b.mean()))
                    out["distinct_bytes"].append(int((counts > 0).sum()))
                    out["entropy"].append(float(-(p * np.log2(p)).sum()))
                else:
                    out["mean_byte"].append(0.0)
                    out["distinct_bytes"].append(0)
                    out["entropy"].append(0.0)
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(batches, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """STUB for media resize (no image libs in this environment): emits the
    target dims plus a deterministic md5 of (payload, dims) standing in for
    resized bytes — the schema, Arrow batching, and partition behavior are
    exactly the real operator's."""

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized_md5": [
                        hashlib.md5((p or b"") + f"|{width}x{height}".encode()).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        batches, "doc_id bigint, width int, height int, resized_md5 string"
    )
