"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step itself is STUBBED (image/audio codecs are not in this
environment): ``register_decoder`` lets a real deployment plug in a
PIL/ffmpeg-backed decoder; the default deterministic fake derives
features from the bytes so the Spark-side plumbing — schema,
batching, partition sizing — is real and testable.

Scale story: mapInPandas streams Arrow record batches, so a 100 MB
image partition never materializes as Python lists;
``spark.sql.files.maxPartitionBytes`` + binaryFile's own partitioning
keep per-task memory bounded. Feature extraction is embarrassingly
parallel — no shuffle at all until a downstream groupBy.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

_DECODERS: dict[str, Callable[[bytes], dict[str, Any]]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], dict[str, Any]]) -> None:
    _DECODERS[media_type] = fn


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: byte-level stats."""
    if payload is None:
        return {"n_bytes": 0, "byte_sum": 0, "head_hex": ""}
    return {
        "n_bytes": len(payload),
        # integer byte sum, not a rounded mean: Python round() is
        # banker's, SQL round() is half-up — keep the contract integral
        "byte_sum": sum(payload),
        "head_hex": payload[:8].hex(),
    }


def decode_stub(media_type: str, payload: bytes) -> dict[str, Any]:
    fn = _DECODERS.get(media_type)
    if fn is not None:
        return fn(payload)
    # real decoders are not available in this container: fall back to
    # the deterministic fake rather than raising, so pipelines keep
    # flowing; plug in a codec with register_decoder() on a real
    # cluster.
    return _fake_decode(payload)


FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, byte_sum long, head_hex string"
)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (media_id, media_type,
    payload). Arrow-batched; one Python round-trip for the whole
    stage regardless of feature count."""

    # snapshot registered decoders at PLAN time: executors import this
    # module fresh, so module-level registry state must travel in the
    # closure (decoder fns must therefore be picklable)
    decoders = dict(_DECODERS)

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                fn = decoders.get(mtype)
                feats = fn(payload) if fn is not None else _fake_decode(payload)
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes": feats["n_bytes"],
                        "byte_sum": feats["byte_sum"],
                        "head_hex": feats["head_hex"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "n_bytes", "byte_sum", "head_hex"],
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(
        gen, FEATURE_SCHEMA
    )


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video frame-sampling stand-in: emit one row per sampled offset
    (the explode shape a real frame sampler produces), with the byte
    at that offset as the 'frame checksum'."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for off in range(0, len(payload), every_n_bytes):
                    rows.append(
                        {"media_id": mid, "frame_off": off, "frame_sum": payload[off]}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_off", "frame_sum"])

    return df.select("media_id", "payload").mapInPandas(
        gen, "media_id long, frame_off long, frame_sum long"
    )


def resize_stub(df: DataFrame, factor: int = 4) -> DataFrame:
    """Image/audio resize stand-in: keep every ``factor``-th byte of
    the payload (the downsampling SHAPE — a real deployment plugs a
    PIL/ffmpeg resize into the same mapInPandas slot). Emits the
    resized payload plus before/after sizes, so downstream stages see
    the true post-resize schema and batch sizes."""

    def gen(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:
                    rows.append(
                        {
                            "media_id": mid,
                            "media_type": mtype,
                            "n_bytes_in": 0,
                            "n_bytes_out": 0,
                            "resized": None,
                        }
                    )
                    continue
                resized = bytes(payload[::factor])
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes_in": len(payload),
                        "n_bytes_out": len(resized),
                        "resized": resized,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "media_type",
                    "n_bytes_in",
                    "n_bytes_out",
                    "resized",
                ],
            )

    return df.select("media_id", "media_type", "payload").mapInPandas(
        gen,
        "media_id long, media_type string, n_bytes_in long, "
        "n_bytes_out long, resized binary",
    )


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter for tests/bench: treat document text bytes as an opaque
    payload (utf-8), typed round-robin across media types."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )
