"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side plumbing (schema, batching, partition sizing, UDF
signatures) is real and tested; the codec step is stubbed behind
``_decode_image`` because no image/audio libraries exist in this
container — swap the stub for PIL/librosa and nothing else changes.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) governs partition
sizing; mapInPandas streams Arrow batches so a partition never needs to
fit in Python memory at once. Feature extraction is embarrassingly
parallel — zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha_prefix", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 8


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Codec stub: real decode requires an image library not present in
    this container. Deterministic fake: dimensions derived from content
    hash — replace with PIL.Image.open(io.BytesIO(payload)).size."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def _feature_vector(payload: bytes) -> list[float]:
    """Feature-extraction stub (deterministic byte-histogram-ish vector);
    replace with a real model forward pass. Shape/typing is the contract."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    return [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    import hashlib

    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else None
                ),
                "sha_prefix": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest()[:12]
                    if b is not None
                    else None
                ),
            }
            dims = pdf.apply(
                lambda r: _decode_image(r["payload"])
                if r["kind"] == "image" and r["payload"] is not None
                else (None, None),
                axis=1,
            )
            out["width"] = dims.map(lambda t: t[0]).astype("object")
            out["height"] = dims.map(lambda t: t[1]).astype("object")
            out["feature"] = pdf["payload"].map(
                lambda b: _feature_vector(b) if b is not None else None
            )
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode a (stubbed) frame-index sequence
    per video; the decode of each frame is the same codec seam. Shows the
    one-to-many media transform shape (explode => no shuffle)."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    idx = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        video.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(idx))
        .select("media_id", "frame_idx", "mime", "payload")
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(((i * 131 + j * 17) % 251) for j in range(64 + i % 128))
        meta = {"n_frames": str(30 + i)} if kind == "video" else {}
        rows.append((i, kind, f"x/{kind}", payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("dst_width", T.IntegerType(), False),
        T.StructField("dst_height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _resize_image(payload: bytes, w: int, h: int) -> bytes:
    """Codec stub: real resize needs PIL/opencv (absent here). The
    deterministic fake keeps the contract honest — output is a function
    of (content, target dims) only:
        PIL: Image.open(io.BytesIO(p)).resize((w, h)).tobytes()."""
    import hashlib

    seed = hashlib.sha256(payload + f"{w}x{h}".encode()).digest()
    # pretend-pixel buffer, size-proportional to the target (capped).
    n = min(w * h, 4096)
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, batch_hint: int = 256
) -> DataFrame:
    """Arrow-batched image resize over binary payloads (mapInPandas):
    rows stream through Python in Arrow record batches — no per-row
    Python UDF calls, no driver involvement; non-image rows pass through
    with a null payload. The pixel work is the codec stub above; the
    Spark-side contract (binary in/out, typed dims, batch shape,
    partition-parallel) is real and tested."""
    import pandas as pd  # noqa: F811

    def gen(batches):
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "src_width": [],
                "src_height": [],
                "dst_width": [width] * len(pdf),
                "dst_height": [height] * len(pdf),
                "payload": [],
            }
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind == "image" and payload is not None:
                    sw, sh = _decode_image(bytes(payload))
                    out["src_width"].append(sw)
                    out["src_height"].append(sh)
                    out["payload"].append(_resize_image(bytes(payload), width, height))
                else:
                    out["src_width"].append(None)
                    out["src_height"].append(None)
                    out["payload"].append(None)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=RESIZED_SCHEMA
    )
