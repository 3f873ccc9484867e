"""Real media decode inside the driver harness (SURVEY.md §2.11 L6).

q74 proves the decode→feature path with REAL codecs (the pure-NumPy
BMP/WAV ones in operators/multimodal.py — the container has no
PIL/ffmpeg): fixture rows are rendered into spec-conformant media
blobs whose pixel/sample levels are arithmetic functions of the row
key, the strict-mode extractor decodes them back, and the oracle
recomputes the expected decoded statistics from the same arithmetic —
so a hash match certifies actual pixel/sample-level decoding, not
just plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fcs_etl_reactor_spark.io import load
from fcs_etl_reactor_spark.queries import query

_BMP_W, _BMP_H = 16, 8
_WAV_RATE, _WAV_N = 8000, 64


def _render_blobs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from fcs_etl_reactor_spark.operators.multimodal import encode_bmp, encode_wav

    for pdf in batches:
        paths, blobs = [], []
        for k in pdf["n_nationkey"]:
            k = int(k)
            if k % 2 == 0:
                level = (k * 9 + 3) % 256
                img = np.full((_BMP_H, _BMP_W), level, dtype=np.uint8)
                blobs.append(encode_bmp(img))
            else:
                # k*500/32768 is an exactly-representable 16-bit PCM level
                x = np.full((_WAV_N, 1), k * 500 / 32768.0)
                blobs.append(encode_wav(_WAV_RATE, x))
            paths.append(str(k))
        yield pd.DataFrame({"path": paths, "content": blobs})


@query(
    "q74_media_decode",
    # the oracle recomputes what the decoder must see: BMP mean/255 of
    # a constant image, WAV RMS of a constant signal — quantized to
    # float32 exactly as ARRAY<FLOAT> stores it
    oracle=f"""
    SELECT
      n_nationkey,
      CASE WHEN n_nationkey % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END
        AS modality,
      CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 2 END AS kind,
      ROUND(CAST(CAST(
        CASE WHEN n_nationkey % 2 = 0
             THEN ((n_nationkey * 9 + 3) % 256) / 255.0
             ELSE n_nationkey * 500 / 32768.0
        END AS FLOAT) AS DOUBLE), 6) AS level
    FROM nation
    """,
)
def q74_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.multimodal import (
        extract_features,
        sniff_media,
    )

    n = load(spark, sf_dir, "nation")
    blobs = n.select("n_nationkey").mapInPandas(
        _render_blobs, "path STRING, content BINARY"
    )
    feats = extract_features(sniff_media(blobs), feature_dim=8, mode="strict")
    # feature[0] = kind (1=image, 2=audio); feature[4] = mean/255 (BMP)
    # or RMS (WAV) — both the decoded per-pixel/per-sample level
    return feats.select(
        F.col("path").cast("int").alias("n_nationkey"),
        "modality",
        F.element_at("feature", 1).cast("int").alias("kind"),
        F.round(F.element_at("feature", 5).cast("double"), 6).alias("level"),
    )


# --------------------------------------------------------------------------
# q7f — video frame sampling (L6): nation keys render into seekable
# RAWV containers (6–10 real BMP frames each, levels an arithmetic
# function of (key, frame)); sample_frames decodes ONLY the 3
# uniformly-indexed frames per container via the length table. The
# oracle recomputes the integer sampling indices and the decoded
# levels from the same arithmetic — a hash match certifies both the
# seek arithmetic and real per-frame decoding.
# --------------------------------------------------------------------------

_VID_H, _VID_W = 8, 8


def _render_videos(batches):
    import numpy as np

    from fcs_etl_reactor_spark.operators.multimodal import encode_rawv

    for pdf in batches:
        paths, blobs = [], []
        for k in pdf["n_nationkey"]:
            k = int(k)
            n_frames = 6 + (k % 5)
            frames = [
                np.full((_VID_H, _VID_W), (k * 17 + f * 11) % 256, dtype=np.uint8)
                for f in range(n_frames)
            ]
            paths.append(str(k))
            blobs.append(encode_rawv(frames))
        yield pd.DataFrame({"path": paths, "content": blobs})


@query(
    "q7f_frame_sample",
    oracle="""
    WITH v AS (
      SELECT n_nationkey, 6 + (n_nationkey % 5) AS n_frames FROM nation
    )
    SELECT n_nationkey,
           CAST((i * (n_frames - 1)) // 2 AS INTEGER) AS frame_idx,
           ROUND(CAST(CAST(
             ((n_nationkey * 17 + ((i * (n_frames - 1)) // 2) * 11) % 256) / 255.0
           AS FLOAT) AS DOUBLE), 6) AS level
    FROM v CROSS JOIN RANGE(0, 3) t(i)
    """,
)
def q7f_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.multimodal import sample_frames

    n = load(spark, sf_dir, "nation")
    vids = n.select("n_nationkey").mapInPandas(
        _render_videos, "path STRING, content BINARY"
    )
    out = sample_frames(vids, k=3)
    return out.select(
        F.col("path").cast("int").alias("n_nationkey"),
        "frame_idx",
        F.round(F.col("frame_mean"), 6).alias("level"),
    )


# --------------------------------------------------------------------------
# q7p — perceptual image hashing (dHash) for multimodal near-dup:
# render BMPs whose pixel field is arithmetic in a GROUP seed
# (n_nationkey % 5), push them through the REAL encode→decode
# roundtrip, compute the 56-bit difference hash from the DECODED
# pixels, and cluster by hash — identical-content images collapse to
# one hash per group. The oracle replays pixel arithmetic + hash
# bits in pure SQL, so a value-hash match certifies byte-exact
# decoding AND the dHash kernel. At 100 TB this is the image
# near-dup bucketing key: O(n) hashes, equality-join buckets, no
# pairwise pixel comparison.
# --------------------------------------------------------------------------

_DH_W, _DH_H = 8, 8  # hash grid: 8 rows × 7 adjacent-column bits = 56


def _px(g: str, x: int, y: int) -> str:
    return f"(({g} * 91 + {x} * 53 + {y} * 29) % 256)"


def _dhash_sql(g: str) -> str:
    terms = []
    for y in range(_DH_H):
        for x in range(_DH_W - 1):
            i = y * (_DH_W - 1) + x
            terms.append(
                f"(CASE WHEN {_px(g, x + 1, y)} > {_px(g, x, y)}"
                f" THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
            )
    return " + ".join(terms)


def _render_and_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from fcs_etl_reactor_spark.operators.multimodal import decode_bmp, encode_bmp

    for pdf in batches:
        keys, hashes = [], []
        for k in pdf["n_nationkey"]:
            k = int(k)
            g = k % 5
            xs = np.arange(_BMP_W)[None, :]
            ys = np.arange(_BMP_H)[:, None]
            img = ((g * 91 + xs * 53 + ys * 29) % 256).astype(np.uint8)
            dec = decode_bmp(encode_bmp(img))  # REAL codec roundtrip
            region = dec[: _DH_H, : _DH_W].astype(np.int64)
            bits = (region[:, 1:] > region[:, :-1]).ravel()
            hashes.append(int((bits << np.arange(bits.size)).sum()))
            keys.append(k)
        yield pd.DataFrame({"n_nationkey": keys, "dhash": hashes})


@query(
    "q7p_image_dhash_neardup",
    oracle=f"""
    WITH h AS (
      SELECT n_nationkey,
             CAST({_dhash_sql("(n_nationkey % 5)")} AS BIGINT) AS dhash
      FROM nation
    )
    SELECT dhash,
           COUNT(*) AS n_images,
           CAST(MIN(n_nationkey) AS BIGINT) AS min_key,
           CAST(MAX(n_nationkey) AS BIGINT) AS max_key
    FROM h GROUP BY dhash
    """,
)
def q7p_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    hashed = n.select("n_nationkey").mapInPandas(
        _render_and_hash, "n_nationkey INT, dhash BIGINT"
    )
    return hashed.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("n_nationkey").cast("bigint").alias("min_key"),
        F.max("n_nationkey").cast("bigint").alias("max_key"),
    )


# --------------------------------------------------------------------------
# q7q — REAL PNG decode (L6): nation keys render into spec-conformant
# PNGs (zlib IDAT, CRC-verified chunks) — grayscale for even keys,
# RGB for odd — with the scanline filter chosen per key (k % 5), so
# the driver run exercises ALL FIVE filter reconstruction paths
# (None/Sub/Up/Average/Paeth). The strict extractor decodes pixels
# back; the oracle recomputes the dimensions and the decoded mean
# level from the same arithmetic, so a hash match certifies real
# inflate + unfilter, not plumbing. Pure-stdlib codec
# (operators/multimodal.encode_png/decode_png) — no PIL in this
# container; swap in a real image library on a deployed cluster.
# --------------------------------------------------------------------------

_PNG_W, _PNG_H = 16, 8


def _render_pngs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from fcs_etl_reactor_spark.operators.multimodal import encode_png

    for pdf in batches:
        paths, blobs = [], []
        for k in pdf["n_nationkey"]:
            k = int(k)
            ft = k % 5
            if k % 2 == 0:
                img = np.full(
                    (_PNG_H, _PNG_W), (k * 7 + 5) % 256, dtype=np.uint8
                )
            else:
                img = np.empty((_PNG_H, _PNG_H, 3), dtype=np.uint8)
                img[:, :, 0] = (k * 3) % 256
                img[:, :, 1] = (k * 5) % 256
                img[:, :, 2] = (k * 7) % 256
            paths.append(str(k))
            blobs.append(encode_png(img, filter_type=ft))
        yield pd.DataFrame({"path": paths, "content": blobs})


@query(
    "q7q_png_decode",
    oracle=f"""
    SELECT
      n_nationkey,
      'image/png' AS modality,
      CAST(CASE WHEN n_nationkey % 2 = 0 THEN {_PNG_W} ELSE {_PNG_H} END
        AS INTEGER) AS width,
      CAST({_PNG_H} AS INTEGER) AS height,
      CAST(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 3 END AS INTEGER)
        AS channels,
      ROUND(CAST(CAST(
        CASE WHEN n_nationkey % 2 = 0
             THEN ((n_nationkey * 7 + 5) % 256) / 255.0
             ELSE (((n_nationkey * 3) % 256) + ((n_nationkey * 5) % 256)
                   + ((n_nationkey * 7) % 256)) / 3.0 / 255.0
        END AS FLOAT) AS DOUBLE), 6) AS level
    FROM nation
    """,
)
def q7q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.multimodal import (
        extract_features,
        sniff_media,
    )

    n = load(spark, sf_dir, "nation")
    blobs = n.select("n_nationkey").mapInPandas(
        _render_pngs, "path STRING, content BINARY"
    )
    feats = extract_features(sniff_media(blobs), feature_dim=8, mode="strict")
    return feats.select(
        F.col("path").cast("int").alias("n_nationkey"),
        "modality",
        F.element_at("feature", 2).cast("int").alias("width"),
        F.element_at("feature", 3).cast("int").alias("height"),
        F.element_at("feature", 4).cast("int").alias("channels"),
        F.round(F.element_at("feature", 5).cast("double"), 6).alias("level"),
    )


# --------------------------------------------------------------------------
# q7r — scene-cut detection (L6/L20 family): adjacent-frame mean
# absolute pixel difference over the RAWV containers, cut where the
# diff exceeds 100 levels. The q7f fixture's frames are flat fields at
# (k·17 + f·11) mod 256, so consecutive means differ by exactly 11 —
# except at the mod-256 wrap, where the jump is 245: the oracle
# replays that arithmetic in SQL, so a hash match certifies the
# decoded-pixel differencing (real codec work), not just plumbing.
# Scale: one sequential decode pass per container (two frames
# resident), containers independent → linear and parallel.
# --------------------------------------------------------------------------


@query(
    "q7r_scene_cuts",
    oracle="""
    WITH v AS (
      SELECT n_nationkey, 6 + (n_nationkey % 5) AS n_frames FROM nation
    ),
    pairs AS (
      SELECT n_nationkey, CAST(f AS INTEGER) AS frame_idx,
             CAST(ABS(((n_nationkey * 17 + f * 11) % 256)
                      - ((n_nationkey * 17 + (f - 1) * 11) % 256)) AS DOUBLE)
               AS frame_diff
      FROM v CROSS JOIN RANGE(1, 10) t(f)
      WHERE f < n_frames
    )
    SELECT n_nationkey, frame_idx, ROUND(frame_diff, 6) AS frame_diff,
           frame_diff > 100.0 AS is_cut
    FROM pairs
    """,
)
def q7r_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fcs_etl_reactor_spark.operators.multimodal import scene_cuts

    n = load(spark, sf_dir, "nation")
    vids = n.select("n_nationkey").mapInPandas(
        _render_videos, "path STRING, content BINARY"
    )
    out = scene_cuts(vids, threshold=100.0)
    return out.select(
        F.col("path").cast("int").alias("n_nationkey"),
        "frame_idx",
        F.round(F.col("frame_diff"), 6).alias("frame_diff"),
        "is_cut",
    )
