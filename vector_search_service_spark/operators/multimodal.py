"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (LLM-data-pipeline extension; no counterpart in the reference,
whose corpus is text-only).

Model: a media row is ``(id, media_type, payload binary, meta struct)``.
Heavy per-byte work (decode, resize, frame sampling, feature
extraction) runs as Arrow-batched ``mapInPandas`` / pandas UDFs over
the binary column — bytes never leave the executor, batches stream
through Arrow, and the operator schema contracts below are the real
production plumbing.

Codecs: the real decoders (PIL / soundfile / av) are NOT in this
container. Each operator routes through ``_require_codec``: with the
library present it would decode real media (left as the
clearly-marked NotImplementedError branch); without it, a
**deterministic fake codec** (FAKE-IMG/FAKE-AUD headers, struct-packed)
exercises the identical Spark plumbing — schemas, batch iteration,
explode shapes — and, because encode is a pure function of the row id,
every operator here still has an exact DuckDB oracle (the oracle
recomputes the expected values from the id; a parsing bug on the
binary path diverges immediately).

Scale notes: payloads at 100 TB dominate row size — keep them in their
own column (parquet stores columns independently, so metadata-only
scans never touch bytes), partition by acquisition date/source, and
never ``collect`` a payload column. ``frame_sample`` is the
chunker-shaped UDTF: 1 blob row → N frame rows via explode.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMG_MAGIC = b"FIMG"
AUD_MAGIC = b"FAUD"

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def _require_codec(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


# --- deterministic fake codec (pure function of an integer id) ------------

def fake_image_bytes(seed: int) -> bytes:
    """FIMG | width u32 | height u32 | n_frames u32 | pixel bytes.
    width/height/frames derive from the seed; pixels are a repeating
    ramp — every derived statistic is predictable from the seed."""
    width = 16 + (seed % 48)
    height = 16 + ((seed * 7) % 32)
    n_frames = 1 + (seed % 5)
    header = IMG_MAGIC + struct.pack("<III", width, height, n_frames)
    n = width * height
    pixels = bytes((seed + i) % 256 for i in range(min(n, 4096)))
    return header + pixels


def fake_audio_bytes(seed: int) -> bytes:
    """FAUD | sample_rate u32 | n_samples u32 | sample bytes."""
    rate = 8000 if seed % 2 == 0 else 16000
    n_samples = 1000 + (seed % 3000)
    header = AUD_MAGIC + struct.pack("<II", rate, n_samples)
    samples = bytes((seed * 3 + i) % 256 for i in range(min(n_samples, 2048)))
    return header + samples


def decode_image_meta(payload: bytes) -> tuple[int, int, int]:
    if payload[:4] != IMG_MAGIC:
        # real-codec seam: lights up when Pillow exists in the env
        # (tests/test_realdeps.py); this container ships without it,
        # so the deterministic FIMG codec is what tests exercise
        pil = _require_codec("PIL.Image")
        if pil is None:
            raise ValueError("unknown image payload and PIL unavailable")
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, int(getattr(im, "n_frames", 1))
    w, h, nf = struct.unpack("<III", payload[4:16])
    return w, h, nf


def decode_audio_meta(payload: bytes) -> tuple[int, int]:
    if payload[:4] != AUD_MAGIC:
        sf = _require_codec("soundfile")
        if sf is None:
            raise ValueError("unknown audio payload and soundfile unavailable")
        import io

        info = sf.info(io.BytesIO(payload))
        return int(info.samplerate), int(info.frames)
    rate, n = struct.unpack("<II", payload[4:12])
    return rate, n


# --- Spark plumbing --------------------------------------------------------

@F.pandas_udf(T.BinaryType())
def _fake_image_udf(seeds: pd.Series) -> pd.Series:
    return seeds.map(lambda s: fake_image_bytes(int(s)))


@F.pandas_udf(T.BinaryType())
def _fake_audio_udf(seeds: pd.Series) -> pd.Series:
    return seeds.map(lambda s: fake_audio_bytes(int(s)))


def attach_media(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Synthesize the media column pair (payload + typed metadata) for
    a row set — images for even ids, audio for odd."""
    is_img = F.col(id_col) % 2 == 0
    return (
        df.withColumn("media_type", F.when(is_img, F.lit("image")).otherwise(F.lit("audio")))
          .withColumn(
              "payload",
              F.when(is_img, _fake_image_udf(F.col(id_col)))
               .otherwise(_fake_audio_udf(F.col(id_col))),
          )
    )


IMAGE_DECODE_SCHEMA = "id long, width int, height int, n_frames int, mean_pixel double"


def decode_images(media: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Batch image decode: binary → (dims, frame count, mean pixel).
    ``mapInPandas`` so one Arrow batch of blobs is decoded per
    iteration — the production shape for any real codec."""
    cols = media.select(F.col(id_col).alias("id"), "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                w, h, nf = decode_image_meta(bytes(payload))
                pixels = bytes(payload)[16:]
                mean = (sum(pixels) / len(pixels)) if pixels else 0.0
                rows.append((rid, w, h, nf, mean))
            yield pd.DataFrame(rows, columns=["id", "width", "height", "n_frames", "mean_pixel"])

    return cols.mapInPandas(decode, IMAGE_DECODE_SCHEMA)


def resize_images(media: DataFrame, *, id_col: str = "doc_id",
                  target_w: int = 8, target_h: int = 8) -> DataFrame:
    """Resize = re-encode with new dims (nearest-neighbor subsample on
    the fake codec; a PIL branch would do the same transform on real
    pixels). Output schema mirrors input — resize is payload→payload."""
    cols = media.select(F.col(id_col).alias("id"), "payload")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                w, h, nf = decode_image_meta(bytes(payload))
                header = IMG_MAGIC + struct.pack("<III", target_w, target_h, nf)
                src = bytes(payload)[16:]
                step = max(1, (w * h) // (target_w * target_h))
                px = src[::step][: target_w * target_h]
                out.append((rid, header + px))
            yield pd.DataFrame(out, columns=["id", "payload"])

    return cols.mapInPandas(resize, "id long, payload binary")


def sample_frames(media: DataFrame, *, id_col: str = "doc_id",
                  every: int = 1) -> DataFrame:
    """Video-ish frame sampling: 1 blob row → n_frames rows (UDTF
    shape, like the chunker: array-returning UDF + explode)."""
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def frame_ids(payloads: pd.Series) -> pd.Series:
        def frames(p):
            _w, _h, nf = decode_image_meta(bytes(p))
            return list(range(0, nf, every))
        return payloads.map(frames)

    return (
        media.select(F.col(id_col).alias("id"), "payload")
        .withColumn("frame_index", F.explode(frame_ids(F.col("payload"))))
        .select("id", "frame_index")
    )


def audio_features(media: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Audio feature extraction: sample_rate, duration, mean amplitude."""
    cols = media.select(F.col(id_col).alias("id"), "payload")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                rate, n = decode_audio_meta(bytes(payload))
                samples = bytes(payload)[12:]
                mean = (sum(samples) / len(samples)) if samples else 0.0
                rows.append((rid, rate, int(n * 1000 / rate), mean))
            yield pd.DataFrame(rows, columns=["id", "sample_rate", "duration_ms", "mean_amp"])

    return cols.mapInPandas(feats, "id long, sample_rate int, duration_ms long, mean_amp double")
