"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention (``schemas.MULTIMODAL_ASSET``): media travels as a
``BinaryType`` payload column with modality/MIME/metadata columns
alongside, so filtering, partitioning, and routing never deserialize
bytes. Byte-touching work (decode, resize, frame-sample, featurize)
runs in Arrow-batched ``mapInPandas`` stages — Python sees columnar
batches, Spark keeps the plan distributed, and the UDF's batch shape is
(partition → iterator of pandas DataFrames).

The container has no image/audio codecs, so the *decode* stages are
stubbed exactly as the interface demands (NotImplementedError or a
deterministic fake) — the Spark-side schema, partitioning, and batch
plumbing are real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Output schema of :func:`featurize_assets`.
FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, digest string, "
    "feat array<double>"
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Lift the ``documents`` fixture into the multimodal asset layout:
    utf-8 bytes as the opaque payload, metadata map alongside."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.lit("text/plain;charset=utf-8").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


def _fake_embedding(digest: bytes, dims: int = 4) -> list[float]:
    """Deterministic stand-in for a learned featurizer: unit-scaled
    bytes of the content digest."""
    return [b / 255.0 for b in digest[:dims]]


def featurize_assets(assets: DataFrame, dims: int = 4) -> DataFrame:
    """Arrow-batched featurization over binary payloads.

    Real pipelines put the model call here; the deterministic fake
    (sha256 digest + digest-derived vector) keeps the full distributed
    path — batch iteration, binary columns through Arrow, typed output
    schema — executable and oracle-checkable.
    """

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            # null payloads (e.g. null-text documents encoded to a
            # null binary) feature as NULLs, not a TypeError — the
            # row must survive with NULL stats like the SQL mirror
            digests = [
                hashlib.sha256(p).digest() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "digest": [
                        d.hex() if d is not None else None for d in digests
                    ],
                    "feat": [
                        _fake_embedding(d, dims) if d is not None else None
                        for d in digests
                    ],
                }
            )

    return assets.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def resize_assets(assets: DataFrame, max_bytes: int = 1024) -> DataFrame:
    """Downscale oversized payloads, pass small ones through unchanged —
    the resize/transcode stage with its Spark-side plumbing real and
    only the codec faked.

    The deterministic fake "resize" truncates the payload to
    ``max_bytes`` and records original/new sizes in ``meta`` (a real
    pipeline swaps in PIL's ``thumbnail`` here; schema, batching, and
    the metadata contract stay identical). Arrow-batched mapInPandas:
    payload bytes cross into Python once per batch, never per row.
    """

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            orig = [
                len(p) if p is not None else None for p in pdf["payload"]
            ]
            pdf = pdf.copy()
            pdf["payload"] = [
                p[:max_bytes] if p is not None else None
                for p in pdf["payload"]
            ]
            pdf["meta"] = [
                {
                    **(dict(m) if m is not None else {}),
                    "orig_bytes": str(o),
                    "resized": (
                        "true" if o is not None and o > max_bytes else "false"
                    ),
                }
                for m, o in zip(pdf["meta"], orig)
            ]
            yield pdf

    return assets.mapInPandas(resize, schema=assets.schema)


def decode_image(assets: DataFrame) -> DataFrame:
    """Decode image payloads to (height, width, channels) + pixels.

    STUB: requires an image codec (PIL/opencv), not present in this
    environment. The signature and schema are the contract; swap the
    body for a real decoder in a codec-equipped image.
    """
    raise NotImplementedError(
        "image decode requires a codec library (e.g. PIL); "
        "not available in this environment"
    )


def frame_sample(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every-nth video frame as image assets.

    STUB: requires a video demuxer (pyav/ffmpeg); see
    :func:`decode_image` for the stubbing convention.
    """
    raise NotImplementedError(
        "video frame sampling requires a demuxer (e.g. pyav); "
        "not available in this environment"
    )
