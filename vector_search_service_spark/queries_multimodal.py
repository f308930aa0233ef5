"""Registry entries — multimodal plumbing. The fake codec is a pure
function of the row id, so the oracle recomputes every expected value
arithmetically: any bug in the binary path (encode, header parse,
byte slicing, Arrow transfer) diverges from the oracle immediately."""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.multimodal import attach_media, audio_features, decode_images, sample_frames
from .registry import register
from .sources.tables import load_table

# fake-codec arithmetic, mirrored in SQL (see fake_image_bytes /
# fake_audio_bytes)
_W = "(16 + (doc_id % 48))"
_H = "(16 + ((doc_id * 7) % 32))"
_NF = "(1 + (doc_id % 5))"
_NPIX = f"least({_W} * {_H}, 4096)"


@register(
    "media_image_decode",
    survey_ref="extension: multimodal image decode (mapInPandas)",
    tags=("multimodal",),
    oracle=f"""
SELECT doc_id AS id, CAST({_W} AS INT) AS width, CAST({_H} AS INT) AS height,
       CAST({_NF} AS INT) AS n_frames,
       CAST(list_sum(list_transform(range(0, {_NPIX}), i -> (doc_id + i) % 256)) AS DOUBLE)
         / {_NPIX} AS mean_pixel
FROM documents WHERE doc_id % 2 = 0 AND doc_id < 400
ORDER BY id
""",
)
def q_media_image_decode(spark, sf_dir):
    """Binary image column → decoded stats via Arrow-batched
    mapInPandas; the whole encode→transfer→parse→aggregate path must
    agree with the oracle's pure arithmetic."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 400)
    )
    media = attach_media(docs.select("doc_id"))
    return decode_images(media).orderBy("id")


@register(
    "media_audio_features",
    survey_ref="extension: multimodal audio features (mapInPandas)",
    tags=("multimodal",),
    oracle="""
WITH a AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
         (1000 + (doc_id % 3000)) AS n
  FROM documents WHERE doc_id % 2 = 1 AND doc_id < 400
)
SELECT id, CAST(sample_rate AS INT) AS sample_rate,
       CAST(trunc(n * 1000.0 / sample_rate) AS BIGINT) AS duration_ms,
       CAST(list_sum(list_transform(range(0, least(n, 2048)), i -> (id * 3 + i) % 256)) AS DOUBLE)
         / least(n, 2048) AS mean_amp
FROM a ORDER BY id
""",
)
def q_media_audio_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 400)
    )
    media = attach_media(docs.select("doc_id"))
    return audio_features(media).orderBy("id")


@register(
    "media_frame_sample",
    survey_ref="extension: multimodal frame sampling (UDTF shape)",
    tags=("multimodal",),
    oracle=f"""
SELECT doc_id AS id, CAST(unnest(range(0, {_NF})) AS INT) AS frame_index
FROM documents WHERE doc_id % 2 = 0 AND doc_id < 400
ORDER BY id, frame_index
""",
)
def q_media_frame_sample(spark, sf_dir):
    """1 blob row → n_frames rows (explode over a frame-index array —
    the chunker-shaped multimodal UDTF)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 400)
    )
    media = attach_media(docs.select("doc_id"))
    return sample_frames(media).orderBy("id", "frame_index")
