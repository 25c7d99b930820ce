"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Pattern (the part that matters at 100 TB): media lives as a
``BinaryType`` column with a typed metadata struct beside it; decode /
feature-extract / resize / frame-sample run as pandas iterators over
Arrow batches so the Python boundary is crossed once per batch, not
per row, and the operator composes with repartitioning upstream
(e.g. salt by byte-size so huge videos don't skew a partition).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
``decode_media`` is a clearly-marked stub: real byte-level plumbing
(schema, batching, signatures) with a deterministic fake "decode" in
place of the codec call. Swap ``_fake_decode`` for the real library on
a cluster with codec images.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload
    (the testdata ships no true image/audio table; the binary column
    plumbing is identical)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image/fake").otherwise("audio/fake").alias(
            "media_type"
        ),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB — stands in for the real codec (PIL.Image.open /
    librosa.load). Deterministic: 'width'/'height' are the first two
    payload bytes. Raises on empty payload like a real decoder would.

    Real implementation sketch::

        from PIL import Image          # not installed in this container
        img = Image.open(io.BytesIO(payload))
        return img.width, img.height
    """
    if not payload:
        raise NotImplementedError("empty payload: nothing to decode")
    return int(payload[0]), int(payload[1]) if len(payload) > 1 else 0


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": pdf["payload"].map(len),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_prefix", T.StringType()),
    ]
)

FRAME_SIZE = 16
MAX_FRAMES = 4


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stub: same mapInPandas shape as a real thumbnailer
    (PIL.Image.resize / ffmpeg scale), with a deterministic fake —
    payload truncated/padded to width*height bytes. Output partitioning
    follows input; at scale repartition by byte-size first so a few
    huge payloads don't skew one partition."""

    target = width * height

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda p: bytes(p[:target]).ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sampling stub: the ROW-EXPANDING mapInPandas shape (one
    input row -> up to MAX_FRAMES output rows), standing in for video
    keyframe extraction. Fake decode: consecutive FRAME_SIZE-byte
    chunks are 'frames'; a real implementation swaps the chunker for
    ffmpeg/pyav iteration, everything else is identical."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, sizes, prefixes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                for i in range(min(MAX_FRAMES, (len(p) + FRAME_SIZE - 1) // FRAME_SIZE)):
                    chunk = p[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                    ids.append(doc_id)
                    nos.append(i)
                    sizes.append(len(chunk))
                    prefixes.append(chunk[:4].decode("utf-8", errors="replace"))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": nos,
                    "frame_bytes": sizes,
                    "frame_prefix": prefixes,
                }
            )

    return media.mapInPandas(do_sample, schema=FRAME_SCHEMA)
