"""B-10 multimodal-column operators (north star: image/audio/video rows).

The engine's multimodal model: an opaque `binary` payload column + a
typed metadata struct, processed by Arrow-batched pandas UDFs over
`mapInPandas`. BMP/PPM/PNG/QOI/GIF/JPEG images, WAV-PCM16 and G.711
audio decode through REAL from-scratch codecs in `functions.multimodal`
/ `functions.jpeg` (no external library); formats beyond those refuse
behind a clearly-marked NotImplementedError, with the *plumbing* —
binary columns, schema, batch shape, partitioning — still real and
oracle-checked via a deterministic byte-level feature extractor.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netcdf4_variable_streamer_spark.registry import register
from netcdf4_variable_streamer_spark.tables import load_table


@register(
    "q_multimodal_bundle",
    oracle="""
WITH nrm AS (
  SELECT vec_id,
         SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * x)))
           AS emb_norm
  FROM embeddings
)
SELECT d.doc_id, d.lang, d.source, d.n_chars,
       e.label, ROUND(n.emb_norm, 4) AS emb_norm
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
JOIN nrm n ON n.vec_id = e.vec_id
WHERE d.lang IN ('en', 'de') AND e.label < 5
""",
    doc="Multimodal row bundle: text + metadata + embedding joined into "
        "one struct, filtered through nested access, projected flat for "
        "hashing.",
)
def q_multimodal_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    bundled = (
        d.join(e, d.doc_id == e.vec_id)
        .withColumn(
            "bundle",
            F.struct(
                F.struct("doc_id", "lang", "source", "n_chars").alias("meta"),
                F.col("text").alias("content"),
                F.struct("embedding", "label").alias("vector"),
            ),
        )
        .withColumn("emb_norm", F.sqrt(dot))
    )
    return bundled.filter(
        F.col("bundle.meta.lang").isin("en", "de")
        & (F.col("bundle.vector.label") < 5)
    ).select(
        F.col("bundle.meta.doc_id").alias("doc_id"),
        F.col("bundle.meta.lang").alias("lang"),
        F.col("bundle.meta.source").alias("source"),
        F.col("bundle.meta.n_chars").alias("n_chars"),
        F.col("bundle.vector.label").alias("label"),
        F.round("emb_norm", 4).alias("emb_norm"),
    )


@register(
    "q_multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS payload_len,
       MD5(text) AS payload_md5,
       ROUND(LIST_SUM(LIST_TRANSFORM(
               generate_series(1, LEAST(LENGTH(text), 16)),
               i -> CAST(ORD(SUBSTR(text, i, 1)) AS DOUBLE)))
             / LEAST(LENGTH(text), 16), 4) AS header_mean_byte
FROM documents
""",
    doc="Binary-column plumbing: text encoded to an opaque binary payload, "
        "features extracted by an Arrow-batched pandas UDF over "
        "mapInPandas (the slot where a real image/audio decoder plugs "
        "in; see functions.multimodal for the gated codec stubs).",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    def extract(batches):
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": [len(b) for b in payloads],
                    "payload_md5": [
                        hashlib.md5(b).hexdigest() for b in payloads
                    ],
                    "header_mean_byte": [
                        round(sum(b[:16]) / float(len(b[:16])), 4)
                        for b in payloads
                    ],
                }
            )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.mapInPandas(
        extract,
        "doc_id long, payload_len long, payload_md5 string, "
        "header_mean_byte double",
    )


@register(
    "q_multimodal_image_decode",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 31 + yy.y * 7 + xx.x * 3 + cc.c * 11) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 5)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) cc
)
SELECT doc_id,
       CAST(6 AS INTEGER) AS width,
       CAST(5 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       FLOOR(SUM(v) * 10000.0 / 90) / 10000.0 AS mean_pixel
FROM px
GROUP BY doc_id
""",
    doc="REAL image decode, no external codec: closed-form 5x6 RGB pixels "
        "per document are encoded to an uncompressed 24-bit BMP (pure "
        "NumPy, functions.multimodal.encode_bmp), shipped through Spark "
        "as an opaque binary column, then decoded back by the pure-NumPy "
        "BMP decoder (bottom-up rows, BGR order, 4-byte row padding — "
        "width 6 makes the 18-byte rows pad to 20) and reduced to "
        "features. The oracle regenerates the same pixels in SQL, so any "
        "codec bug (channel swap, row flip, padding shear) hash-"
        "mismatches. At scale this is one mapInPandas per side with no "
        "shuffle: decode parallelism = scan parallelism.",
)
def q_multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    H, W, C = 5, 6, 3
    ys, xs, cs = np.indices((H, W, C))

    def encode(batches):
        for pdf in batches:
            payloads = [
                encode_bmp(
                    ((int(d) * 31 + ys * 7 + xs * 3 + cs * 11) % 256).astype(
                        np.uint8
                    )
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                h, w, c = img.shape
                mean = math.floor(int(img.sum()) * 10000.0 / (h * w * c)) / 10000.0
                rows.append((d, w, h, c, mean))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_channels", "mean_pixel"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, mean_pixel double",
    )


@register(
    "q_pivot_lang_source",
    oracle="""
SELECT source,
       COUNT(*) FILTER (WHERE lang = 'en') AS en,
       COUNT(*) FILTER (WHERE lang = 'de') AS de,
       COUNT(*) FILTER (WHERE lang = 'es') AS es,
       COUNT(*) FILTER (WHERE lang = 'fr') AS fr,
       COUNT(*) FILTER (WHERE lang = 'zh') AS zh
FROM documents
GROUP BY source
""",
    doc="Wide matrix: document counts by source × language via pivot "
        "(explicit value list keeps the schema static at any scale).",
)
def q_pivot_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    langs = ["en", "de", "es", "fr", "zh"]
    p = d.groupBy("source").pivot("lang", langs).count()
    return p.select(
        "source",
        *[F.coalesce(F.col(lg), F.lit(0)).alias(lg) for lg in langs],
    )


@register(
    "q_multimodal_resize",
    oracle="""
WITH px AS (
  SELECT d.doc_id, yy.y, xx.x, cc.c,
         (d.doc_id * 31 + yy.y * 7 + xx.x * 3 + cc.c * 11) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) cc
),
rs AS (
  SELECT doc_id, y // 2 AS ry, x // 2 AS rx, c,
         SUM(v) // 4 AS r
  FROM px GROUP BY doc_id, y // 2, x // 2, c
)
SELECT doc_id,
       CAST(4 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(SUM(r) AS BIGINT) AS sum_resized,
       CAST(SUM(r * (ry * 12 + rx * 3 + c)) AS BIGINT) AS weighted_checksum
FROM rs
GROUP BY doc_id
""",
    doc="REAL image resize, no external libs: closed-form 8x8 RGB images "
        "round-trip through the pure-NumPy BMP codec as binary payloads, "
        "then a mapInPandas kernel decodes and 2x block-mean pools to "
        "4x4 with INTEGER arithmetic (sum//4 — exactly reproducible in "
        "SQL, unlike float interpolation). The position-weighted "
        "checksum pins every resized pixel to its location, so a "
        "transposed or shifted pool hash-mismatches. Same 100 TB shape "
        "as decode: two chained narrow mapInPandas, zero shuffles until "
        "the (absent) final agg; Pillow's Image.resize drops into the "
        "same kernel signature (functions.multimodal.resize_image_batches).",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    H = W = 8
    C = 3
    ys, xs, cs = np.indices((H, W, C))
    ry, rx, rc = np.indices((H // 2, W // 2, C))
    weights = ry * 12 + rx * 3 + rc

    def encode(batches):
        for pdf in batches:
            payloads = [
                encode_bmp(
                    ((int(d) * 31 + ys * 7 + xs * 3 + cs * 11) % 256).astype(
                        np.uint8
                    )
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def resize(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload)).astype(np.int64)
                h, w, c = img.shape
                pooled = (
                    img.reshape(h // 2, 2, w // 2, 2, c)
                    .transpose(0, 2, 4, 1, 3)
                    .reshape(h // 2, w // 2, c, 4)
                    .sum(axis=3)
                    // 4
                )
                rows.append(
                    (
                        d,
                        w // 2,
                        h // 2,
                        c,
                        int(pooled.sum()),
                        int((pooled * weights).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_channels",
                    "sum_resized",
                    "weighted_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        resize,
        "doc_id long, width int, height int, n_channels int, "
        "sum_resized long, weighted_checksum long",
    )


@register(
    "q_multimodal_frame_sample",
    oracle="""
WITH frames AS (
  SELECT d.doc_id, f.f AS frame_idx, b.j,
         (d.doc_id * 13 + f.f * 17 + b.j * 5) % 256 AS byte_val
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 5)) AS f) f
  CROSS JOIN (SELECT UNNEST(generate_series(0, 31)) AS j) b
  WHERE d.doc_id < 200 AND f.f % 2 = 0
)
SELECT doc_id, frame_idx,
       CAST(SUM(byte_val) AS BIGINT) AS frame_sum,
       COUNT(*) AS frame_bytes
FROM frames
GROUP BY doc_id, frame_idx
""",
    doc="Video frame sampling plumbing with REAL bytes: each document "
        "carries a synthetic 6-frame 'video' payload (32-byte raw frames "
        "concatenated — built with the same closed form the oracle "
        "regenerates), and a mapInPandas sampler slices out every 2nd "
        "frame and reduces it. Stride sampling over an opaque binary "
        "column IS the production shape (libav keyframe decode drops "
        "into functions.multimodal.frame_sample_batches with the same "
        "signature); narrow map, decode parallelism = scan parallelism, "
        "sampled-frame rows fan out 3x, never shuffled until aggregated.",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    N_FRAMES, FRAME_BYTES, STRIDE = 6, 32, 2
    fs, js = np.indices((N_FRAMES, FRAME_BYTES))

    def encode(batches):
        for pdf in batches:
            payloads = [
                ((int(d) * 13 + fs * 17 + js * 5) % 256)
                .astype(np.uint8)
                .tobytes()
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def sample(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(
                    N_FRAMES, FRAME_BYTES
                )
                for f in range(0, N_FRAMES, STRIDE):
                    rows.append(
                        (d, f, int(buf[f].astype(np.int64).sum()), FRAME_BYTES)
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_sum", "frame_bytes"],
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 200)
    )
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        sample,
        "doc_id long, frame_idx long, frame_sum long, frame_bytes long",
    )


@register(
    "q_multimodal_audio_decode",
    oracle="""
WITH s AS (
  SELECT d.doc_id, t.i,
         ((d.doc_id * 13 + t.i * (3 + d.doc_id % 5)) % 2001) - 1000 AS v
  FROM documents d,
       UNNEST(generate_series(0, 399 + CAST(d.doc_id % 7 AS INTEGER) * 100))
         AS t(i)
),
lagged AS (
  SELECT doc_id, i, v,
         LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
)
SELECT doc_id,
       COUNT(*) AS n_samples,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN pv IS NOT NULL AND v * pv < 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_zero_cross
FROM lagged GROUP BY doc_id
""",
    doc="REAL audio decode, no external codec: a closed-form int16 "
        "waveform per document (400-1000 samples, doc-dependent period) "
        "is encoded to a canonical RIFF/WAVE PCM16 file (pure NumPy, "
        "functions.multimodal.encode_wav_pcm16 — real WAV bytes any "
        "audio tool opens), shipped as an opaque binary column, decoded "
        "back by the chunk-walking WAV parser, and reduced to the "
        "framing features audio pipelines start from: sample count, "
        "rate, integer sum|s| and energy Σs², and the zero-crossing "
        "count (the classic voicing/pitch proxy) — all exact integers, "
        "so the oracle's SQL regeneration hash-matches bit-for-bit and "
        "any header mis-parse or byte-order slip fails loudly. Same "
        "scale shape as the image keys: encode and decode are each one "
        "mapInPandas, zero shuffles — decode parallelism = scan "
        "parallelism. Compressed formats remain import-gated stubs; "
        "PCM WAV (the dominant speech-corpus interchange format) is "
        "fully real.",
)
def q_multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 400 + (d % 7) * 100
                i = np.arange(n, dtype=np.int64)
                v = ((d * 13 + i * (3 + d % 5)) % 2001) - 1000
                payloads.append(encode_wav_pcm16(v.astype(np.int16)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                s, rate = decode_wav_pcm16(bytes(payload))
                v = s.astype(np.int64)
                rows.append(
                    (
                        d,
                        len(v),
                        rate,
                        int(np.abs(v).sum()),
                        int((v * v).sum()),
                        int(((v[1:] * v[:-1]) < 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "sum_abs", "energy", "n_zero_cross",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, n_samples long, sample_rate int, sum_abs long, "
        "energy long, n_zero_cross long",
    )


@register(
    "q_multimodal_png_decode",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 17 + yy.y * 5 + xx.x * 13 + cc.c * 7) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 5)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS c) cc
)
SELECT doc_id,
       CAST(5 AS INTEGER) AS width,
       CAST(6 AS INTEGER) AS height,
       CAST(4 AS INTEGER) AS n_channels,
       CAST(SUM(v) AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="REAL PNG decode with NO external library: zlib ships in the "
        "Python stdlib, so the round-3 pure-NumPy PNG codec "
        "(functions.multimodal.encode_png/decode_png — IHDR/IDAT/IEND "
        "chunked, CRC'd, all five row filters implemented; encoder "
        "emits Sub-filtered rows so the decoder's unfilter recurrence "
        "does real work) makes PNG a fully real format alongside "
        "BMP/PPM/WAV. Closed-form 6x5 RGBA pixels per document round-"
        "trip through encode→binary column→decode and reduce to an "
        "exact integer pixel checksum the oracle regenerates in SQL — "
        "a compression bug, filter slip, CRC mistake, or channel swap "
        "all hash-mismatch. RGBA (4 channels) deliberately exercises "
        "the alpha lane the BMP key can't. Same scale shape: one "
        "mapInPandas per side, zero shuffles.",
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    H, W, C = 6, 5, 4
    ys, xs, cs = np.indices((H, W, C))

    def encode(batches):
        for pdf in batches:
            payloads = [
                encode_png(
                    ((int(d) * 17 + ys * 5 + xs * 13 + cs * 7) % 256).astype(
                        np.uint8
                    )
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_png(bytes(payload))
                h, w, c = img.shape
                rows.append((d, w, h, c, int(img.astype(np.int64).sum())))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, "
        "pixel_checksum long",
    )


@register(
    "q_multimodal_qoi_decode",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 11 + yy.y * 7 + xx.x * 3 + cc.c * 19) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 6)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) cc
)
SELECT doc_id,
       CAST(5 AS INTEGER) AS width,
       CAST(7 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(SUM(v) AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="REAL QOI decode (round 15) — the fourth fully real image "
        "format alongside BMP/PPM/PNG: the public-domain one-page "
        "QOI spec (qoiformat.org) implemented pure-NumPy in both "
        "directions (functions.multimodal.encode_qoi/decode_qoi — "
        "all five chunk ops, the 64-entry hash index, wrapping byte "
        "arithmetic, the 8-byte end marker), so any QOI payload a "
        "standard tool writes decodes here with zero dependencies. "
        "Closed-form 7x5 RGB pixels per document round-trip through "
        "encode → binary column → decode and reduce to an exact "
        "integer checksum the oracle regenerates in SQL — a run-"
        "length slip, index-hash mistake, or diff-bias error all "
        "hash-mismatch (the formula's stride-7 rows and stride-3 "
        "pixels exercise DIFF and LUMA ops, its per-doc offset the "
        "INDEX op). The decoder refuses truncated streams, run "
        "overruns, and a missing end marker by name — swept with "
        "7k mutated/truncated/random payloads. Scale shape identical "
        "to the PNG key: one Arrow-batched mapInPandas per side, "
        "zero shuffles; the per-pixel loops are the format's nature "
        "and parallelize across rows/batches.",
)
def q_multimodal_qoi_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    H, W, C = 7, 5, 3
    ys, xs, cs = np.indices((H, W, C))

    def encode(batches):
        for pdf in batches:
            payloads = [
                encode_qoi(
                    ((int(d) * 11 + ys * 7 + xs * 3 + cs * 19) % 256)
                    .astype(np.uint8)
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_qoi(bytes(payload))
                h, w, c = img.shape
                rows.append(
                    (d, w, h, c, int(img.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, "
        "pixel_checksum long",
    )


@register(
    "q_multimodal_jpeg_decode",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 13 + yy.y * 29 + xx.x * 37) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS x) xx
)
SELECT doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(SUM(v) * 64 * 3 AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="REAL baseline JPEG decode (round 16) — the web's dominant "
        "image format, pure NumPy from the public ITU-T T.81 spec "
        "(functions.jpeg: marker parse, Annex K Huffman entropy "
        "decode with byte-stuffing and restart segmentation, "
        "dequantize, vectorized 8x8 IDCT, 4:2:0 chroma upsampling, "
        "BT.601 YCbCr->RGB; arithmetic/12-bit refuse by name; "
        "progressive SOF2 decodes too — see the _progressive twin "
        "key). JPEG is lossy, so the fixture is chosen to make the "
        "round-trip EXACT rather than merely bounded: gray-in-RGB "
        "images (R=G=B) of flat 8x8 blocks at quality 75 — the "
        "Annex-K luminance DC quantizer scales to exactly 8 there, "
        "so the block DC 8*(v-128) quantizes losslessly, every AC "
        "coefficient is exactly zero, and chroma is exactly 128 "
        "through the BT.601 transform — meaning ANY defect in the "
        "DCT, quantization, Huffman tables, bit packing, stuffing, "
        "upsampling or color transform perturbs the checksum and "
        "hash-mismatches against the closed form the oracle "
        "regenerates in SQL (the lossy envelope is pinned separately "
        "in pytest with error bounds + a custom-table differential "
        "stream). Scale shape identical to the PNG/QOI keys: one "
        "Arrow-batched mapInPandas per side, zero shuffles; the "
        "bit-serial entropy loop is the format's nature and "
        "parallelizes across rows/batches.",
)
def q_multimodal_jpeg_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    BY, BX = 2, 2  # 8x8 blocks per axis -> 16x16 images
    ys, xs = np.indices((BY, BX))

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                v = (
                    (int(d) * 13 + ys * 29 + xs * 37) % 256
                ).astype(np.uint8)
                g = v.repeat(8, axis=0).repeat(8, axis=1)
                rgb = np.stack([g, g, g], axis=2)
                payloads.append(
                    encode_jpeg(rgb, quality=75, subsampling="420")
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_jpeg(bytes(payload))
                h, w, c = img.shape
                rows.append(
                    (d, w, h, c, int(img.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, "
        "pixel_checksum long",
    )


@register(
    "q_multimodal_phash_cross_container",
    oracle="""
WITH px AS (
  SELECT d.doc_id, d.doc_id % 50 AS img, yy.y, xx.x,
         (d.doc_id % 50 * 37 + yy.y * 17 + xx.x * 29
          + (xx.x * yy.y) % 13) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS x) xx
),
blocks AS (
  SELECT doc_id, y // 2 AS by, x // 2 AS bx,
         CAST(SUM(v) AS BIGINT) // 4 AS b
  FROM px GROUP BY doc_id, y // 2, x // 2
),
tot AS (
  SELECT doc_id, CAST(SUM(v) AS BIGINT) // 256 AS t
  FROM px GROUP BY doc_id
),
bits AS (
  SELECT b.doc_id, b.by * 8 + b.bx AS k,
         CASE WHEN b.b > t.t THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN tot t USING (doc_id)
),
hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN k < 32
                       THEN bit * (CAST(1 AS BIGINT) << k)
                       ELSE 0 END) AS BIGINT) AS h_hi,
         CAST(SUM(CASE WHEN k >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                       ELSE 0 END) AS BIGINT) AS h_lo
  FROM bits GROUP BY doc_id
),
clusters AS (
  SELECT h.h_hi, h.h_lo, MIN(h.doc_id) AS keep_doc,
         COUNT(*) AS cluster_n,
         COUNT(DISTINCT h.doc_id % 7) AS n_formats
  FROM hashes h GROUP BY h.h_hi, h.h_lo
)
SELECT h.doc_id,
       CASE CAST(h.doc_id % 7 AS INTEGER)
         WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' WHEN 2 THEN 'png'
         WHEN 3 THEN 'qoi' WHEN 4 THEN 'gif' WHEN 5 THEN 'tiff'
         ELSE 'tiff_pb'
       END AS fmt,
       h.h_hi, h.h_lo, c.keep_doc,
       CAST(c.cluster_n AS BIGINT) AS cluster_n,
       CAST(c.n_formats AS BIGINT) AS n_formats,
       h.doc_id <> c.keep_doc AS is_dup
FROM hashes h
JOIN clusters c ON h.h_hi = c.h_hi AND h.h_lo = c.h_lo
""",
    doc="CROSS-CONTAINER perceptual dedup (round 16) — the composite "
        "a real image-corpus pipeline runs: the SAME image content "
        "arrives wrapped in SEVEN different lossless containers "
        "(doc_id mod 7 picks BMP/PPM/PNG/QOI/GIF/TIFF/TIFF-PackBits "
        "— 7 is coprime to the 50-image content cycle, so every "
        "duplicate cluster mixes containers), the magic-byte "
        "dispatch decodes each, and the integer average-hash "
        "clusters them: byte-level dedup (md5 of the payload) finds "
        "NOTHING here — every payload differs — while the decoded-"
        "pixel perceptual hash reunites the duplicates exactly "
        "(n_formats per cluster > 1, pytest-pinned). Keeper "
        "election and emit shape follow q_dedup_image_phash; all "
        "arithmetic floor-exact integer so the SQL oracle matches "
        "bit-for-bit. Scale: decode+hash zero-shuffle mapInPandas, "
        "one hash-keyed agg + score-back join — no pairwise stage.",
)
def q_multimodal_phash_cross_container(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        encode_tiff,
    )

    ys, xs = np.indices((16, 16))
    fmts = ("bmp", "ppm", "png", "qoi", "gif", "tiff", "tiff_pb")

    def encode(batches):
        encoders = {
            "bmp": mm.encode_bmp,
            "ppm": mm.encode_ppm,
            "png": mm.encode_png,
            "qoi": mm.encode_qoi,
            "gif": mm.encode_gif,
            "tiff": encode_tiff,
            "tiff_pb": lambda a: encode_tiff(
                a, compression="packbits"
            ),
        }
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                img = int(d) % 50
                gray = (
                    (img * 37 + ys * 17 + xs * 29 + (xs * ys) % 13)
                    % 256
                ).astype(np.uint8)
                rgb = np.repeat(gray[:, :, None], 3, axis=2)
                fmt = fmts[int(d) % 7]
                rows.append((d, fmt, encoders[fmt](rgb)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "payload"]
            )

    def ahash(batches):
        for pdf in batches:
            rows = []
            for d, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                gray = mm.decode_any(bytes(payload))[:, :, 0].astype(
                    np.int64
                )
                blocks = gray.reshape(8, 2, 8, 2).sum(axis=(1, 3)) // 4
                t = int(gray.sum()) // 256
                bits = (blocks > t).astype(np.int64).reshape(64)
                h_hi = int((bits[:32] << np.arange(32)).sum())
                h_lo = int((bits[32:] << np.arange(32)).sum())
                rows.append((d, fmt, h_hi, h_lo))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "h_hi", "h_lo"]
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        encode, "doc_id long, fmt string, payload binary"
    )
    hashes = payloads.mapInPandas(
        ahash, "doc_id long, fmt string, h_hi long, h_lo long"
    )
    clusters = hashes.groupBy("h_hi", "h_lo").agg(
        F.min("doc_id").alias("keep_doc"),
        F.count(F.lit(1)).alias("cluster_n"),
        F.countDistinct(F.col("doc_id") % 7).alias("n_formats"),
    )
    return hashes.join(clusters, ["h_hi", "h_lo"]).select(
        "doc_id",
        "fmt",
        "h_hi",
        "h_lo",
        "keep_doc",
        F.col("cluster_n").cast("long").alias("cluster_n"),
        F.col("n_formats").cast("long").alias("n_formats"),
        (F.col("doc_id") != F.col("keep_doc")).alias("is_dup"),
    )


@register(
    "q_multimodal_audio_dispatch",
    oracle="""
WITH sm AS (
  SELECT d.doc_id,
         ((d.doc_id * 5 + i.i * 19) % 2001) - 1000 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 199)) AS i) i
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS fmt,
       CAST(200 AS BIGINT) AS n_samples,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(SUM(v) AS BIGINT) AS sample_checksum
FROM sm
GROUP BY doc_id
""",
    doc="HETEROGENEOUS audio decode (round 16) — the image dispatch "
        "key's audio twin, because real speech corpora mix "
        "containers: each row carries WAV-PCM16 or FLAC (doc_id mod "
        "2), and ONE magic-byte dispatch "
        "(functions.multimodal.decode_audio_any) routes every "
        "payload inside a single mapInPandas kernel. Both formats "
        "are LOSSLESS for int16, so the same closed-form samples "
        "produce the same exact checksum regardless of container — "
        "the oracle regenerates it uniformly and any per-format "
        "defect mismatches on exactly that format's rows. Zero "
        "shuffles; dispatch is per-row.",
)
def q_multimodal_audio_dispatch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.flac import (
        encode_flac,
    )

    N = 200
    i = np.arange(N, dtype=np.int64)

    def encode(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                s = (
                    ((int(d) * 5 + i * 19) % 2001) - 1000
                ).astype(np.int16)
                if int(d) % 2 == 0:
                    fmt, payload = "wav", mm.encode_wav_pcm16(
                        s, sample_rate=16000
                    )
                else:
                    fmt, payload = "flac", encode_flac(
                        s, 16000, block=64
                    )
                rows.append((d, fmt, payload))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "payload"]
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                samples, rate = mm.decode_audio_any(bytes(payload))
                rows.append(
                    (
                        d, fmt, len(samples), rate,
                        int(samples.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "n_samples", "sample_rate",
                    "sample_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        encode, "doc_id long, fmt string, payload binary"
    )
    return payloads.mapInPandas(
        decode,
        "doc_id long, fmt string, n_samples long, sample_rate int, "
        "sample_checksum long",
    )


@register(
    "q_multimodal_video_mjpeg",
    oracle="""
WITH fr AS (
  SELECT d.doc_id, f.f
  FROM documents d,
       UNNEST(generate_series(0, 1 + CAST(d.doc_id % 3 AS INTEGER)))
         AS f(f)
),
px AS (
  SELECT fr.doc_id, fr.f,
         (fr.doc_id * 37 + fr.f * 61 + yy.y * 13 + xx.x * 7) % 256
           AS v
  FROM fr
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS x) xx
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(SUM(v) * 64 * 3 AS BIGINT) AS frame_checksum
FROM px
GROUP BY doc_id, f
""",
    doc="REAL video container decode (round 16) — MJPEG-in-AVI, the "
        "RIFF container legacy cameras and surveillance corpora "
        "ship, composed from two in-repo pieces: the RIFF chunk "
        "grammar (shared with the WAV codec) and the round-16 JPEG "
        "codec, every frame a standalone baseline JPEG "
        "(functions/avi.py: avih/strl headers validated, "
        "frame-vs-header dim and count cross-checks, idx1 emitted). "
        "Per document, 2 + doc_id%3 frames of flat 8x8 gray-in-RGB "
        "blocks (the exact-through-JPEG fixture) round-trip through "
        "encode → binary column → decode and emit one EXACT "
        "checksum row per frame — the video-frame-sampling story on "
        "an actual video container with an actual codec, not "
        "synthetic splits. Rows = docs x frames; zero shuffles; one "
        "Arrow-batched mapInPandas per side.",
)
def q_multimodal_video_mjpeg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.avi import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    ys, xs = np.indices((2, 2))

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                n = 2 + int(d) % 3
                frames = []
                for f in range(n):
                    v = (
                        (int(d) * 37 + f * 61 + ys * 13 + xs * 7)
                        % 256
                    ).astype(np.uint8)
                    g = v.repeat(8, axis=0).repeat(8, axis=1)
                    frames.append(np.stack([g, g, g], axis=2))
                payloads.append(
                    encode_avi_mjpeg(np.stack(frames), fps=10)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames, _fps = decode_avi_mjpeg(bytes(payload))
                for f in range(frames.shape[0]):
                    img = frames[f]
                    rows.append(
                        (
                            d, f, img.shape[1], img.shape[0],
                            int(img.astype(np.int64).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "frame_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, frame_idx int, width int, height int, "
        "frame_checksum long",
    )


@register(
    "q_multimodal_tiff_decode",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 29 + yy.y * 47 + xx.x * 59 + cc.c * 17) % 256
           AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 8)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 6)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) cc
)
SELECT doc_id,
       CAST(7 AS INTEGER) AS width,
       CAST(9 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(SUM(v) AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="REAL TIFF decode (round 16) — the scanned-document / OCR "
        "corpus container, pure NumPy from the public TIFF 6.0 spec "
        "(functions/tiff.py: both byte orders, IFD walk, strip "
        "assembly, none/LZW/PackBits compressions, horizontal-"
        "differencing predictor, WhiteIsZero/RGB/RGBA/palette "
        "photometrics, CCITT G4 + MH-RLE, FillOrder 2, tiled layout "
        "— tiled and G4 have their own keys since r17; the remaining "
        "named refusals are 16-bit samples, G4 extension mode, and "
        "nonzero T4Options). TIFF is lossless, so "
        "closed-form 9x7 RGB pixels per document round-trip through "
        "encode (PackBits, 4-row strips — real run compression and "
        "multi-strip assembly) → binary column → decode EXACTLY and "
        "reduce to the checksum the oracle regenerates in SQL. The "
        "TIFF-variant LZW path (EARLY-CHANGE width bumps — the "
        "detail that distinguishes it from GIF LZW) plus big-endian "
        "and predictor layouts are pinned by an independently-built "
        "differential stream in pytest; 10k-case mutation sweep "
        "clean. Scale shape identical to the other codec keys: one "
        "Arrow-batched mapInPandas per side, zero shuffles.",
)
def q_multimodal_tiff_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    H, W, C = 9, 7, 3
    ys, xs, cs = np.indices((H, W, C))

    def encode(batches):
        for pdf in batches:
            payloads = [
                encode_tiff(
                    (
                        (int(d) * 29 + ys * 47 + xs * 59 + cs * 17)
                        % 256
                    ).astype(np.uint8),
                    compression="packbits",
                    rows_per_strip=4,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_tiff(bytes(payload))
                h, w, c = img.shape
                rows.append(
                    (d, w, h, c, int(img.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, "
        "pixel_checksum long",
    )


def _adpcm_oracle() -> str:
    """The IMA ADPCM decode recursion mirrored as a DuckDB recursive
    CTE — the format is integer-exact end to end, so the ORACLE runs
    the actual sequential decoder (step table joined per iteration,
    shift arithmetic as floor division, int16 clamp) over the same
    closed-form nibble stream the Spark side packs into real WAV
    containers. No fixture compromise, unlike the perceptual codecs."""
    from netcdf4_variable_streamer_spark.functions.multimodal import (
        _IMA_STEPS,
    )

    steps = ", ".join(
        f"({i}, {int(v)})" for i, v in enumerate(_IMA_STEPS)
    )
    nib = "((r.doc_id * 3 + r.t * 5) % 16)"
    diff = (
        f"(s.step // 8"
        f" + CASE WHEN {nib} % 8 >= 4 THEN s.step ELSE 0 END"
        f" + CASE WHEN {nib} % 4 >= 2 THEN s.step // 2 ELSE 0 END"
        f" + CASE WHEN {nib} % 2 = 1 THEN s.step // 4 ELSE 0 END)"
    )
    return f"""
WITH RECURSIVE steps(i, step) AS (VALUES {steps}),
rec(doc_id, t, pred, idx) AS (
  SELECT doc_id, 0,
         CAST((doc_id * 97) % 2001 - 1000 AS BIGINT),
         CAST(doc_id % 89 AS BIGINT)
  FROM documents
  UNION ALL
  SELECT r.doc_id, r.t + 1,
         GREATEST(-32768, LEAST(32767,
           r.pred
           + CASE WHEN {nib} >= 8 THEN -{diff} ELSE {diff} END)),
         GREATEST(0, LEAST(88,
           r.idx + CASE {nib} % 8
                     WHEN 4 THEN 2 WHEN 5 THEN 4
                     WHEN 6 THEN 6 WHEN 7 THEN 8
                     ELSE -1 END))
  FROM rec r JOIN steps s ON s.i = r.idx
  WHERE r.t < 64
)
SELECT doc_id,
       CAST(65 AS BIGINT) AS n_samples,
       CAST(8000 + (doc_id % 3) * 1000 AS INTEGER) AS sample_rate,
       CAST(SUM(pred) AS BIGINT) AS sample_checksum
FROM rec
GROUP BY doc_id
"""


@register(
    "q_multimodal_scanned_archive",
    oracle="""
WITH v AS (
  SELECT doc_id, doc_id % 6 AS variant FROM documents
),
gray AS (
  SELECT v.doc_id, v.variant,
         SUM((v.doc_id * 29 + yy.y * 47 + xx.x * 59) % 256)
           AS checksum
  FROM v
  CROSS JOIN (SELECT UNNEST(generate_series(0, 17)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 25)) AS x) xx
  WHERE v.variant IN (0, 1, 3)
  GROUP BY v.doc_id, v.variant
),
bilevel AS (
  SELECT v.doc_id, v.variant,
         SUM(CASE WHEN (v.doc_id * 13 + yy.y * 7 + xx.x * 3) % 11
                       < 4
                  THEN 0 ELSE 255 END) AS checksum
  FROM v
  CROSS JOIN (SELECT UNNEST(generate_series(0, 17)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 25)) AS x) xx
  WHERE v.variant IN (2, 4, 5)
  GROUP BY v.doc_id, v.variant
),
u AS (
  SELECT * FROM gray UNION ALL SELECT * FROM bilevel
)
SELECT doc_id,
       CASE variant
         WHEN 0 THEN 'strip_none' WHEN 1 THEN 'strip_packbits'
         WHEN 2 THEN 'strip_g4' WHEN 3 THEN 'tiled_packbits'
         WHEN 4 THEN 'tiled_g4'
         ELSE 'strip_g4_lsb' END AS variant,
       CAST(26 AS INTEGER) AS width,
       CAST(18 AS INTEGER) AS height,
       CAST(checksum AS BIGINT) AS pixel_checksum
FROM u
""",
    doc="SCANNED-ARCHIVE ingest composite (round 17) — the "
        "heterogeneous-corpus story for the document-archive "
        "surface: one magic-byte-dispatched kernel ingests a corpus "
        "mixing all six TIFF variants a real archive ships "
        "(uncompressed strips, PackBits strips, CCITT-G4 strips, "
        "PackBits tiles, G4 tiles, and — round 18 — FillOrder-2 "
        "LSB-first G4 strips, the fax-derived byte-fill convention; "
        "variant chosen per doc), every "
        "page decoding through decode_any with NO per-format "
        "branching in the pipeline, and a defect in any one "
        "variant's codec localizes to exactly that variant's rows "
        "(the dispatch-key property, extended to the round-17 "
        "layout/compression surface). Gray pages and bilevel pages "
        "carry different closed forms, both regenerated in SQL. "
        "Scale shape: zero shuffles, one Arrow-batched mapInPandas "
        "per side; per-row codec CPU rides scan parallelism, so a "
        "1000-executor archive scan divides the decode bill by "
        "1000.",
)
def q_multimodal_scanned_archive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_any,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        encode_tiff,
    )

    H, W = 18, 26
    ys, xs = np.indices((H, W))
    names = [
        "strip_none", "strip_packbits", "strip_g4",
        "tiled_packbits", "tiled_g4", "strip_g4_lsb",
    ]

    def encode(batches):
        for pdf in batches:
            payloads = []
            variants = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = d % 6
                variants.append(names[v])
                if v in (2, 4, 5):  # bilevel page
                    bits = (
                        (d * 13 + ys * 7 + xs * 3) % 11 < 4
                    ).astype(np.uint8)
                    page = ((1 - bits) * 255).astype(np.uint8)
                else:  # gray page
                    page = (
                        (d * 29 + ys * 47 + xs * 59) % 256
                    ).astype(np.uint8)
                if v == 0:
                    blob = encode_tiff(page, compression="none")
                elif v == 1:
                    blob = encode_tiff(
                        page, compression="packbits", rows_per_strip=5
                    )
                elif v == 2:
                    blob = encode_tiff(
                        page, compression="g4", rows_per_strip=5
                    )
                elif v == 3:
                    blob = encode_tiff(
                        page, compression="packbits", tile=(16, 16)
                    )
                elif v == 4:
                    blob = encode_tiff(
                        page, compression="g4", tile=(16, 16)
                    )
                else:
                    blob = encode_tiff(
                        page, compression="g4", rows_per_strip=5,
                        fill_order=2,
                    )
                payloads.append(blob)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "variant": variants,
                    "payload": payloads,
                }
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, v, payload in zip(
                pdf["doc_id"], pdf["variant"], pdf["payload"]
            ):
                img = decode_any(bytes(payload))
                h, w = img.shape[:2]
                rows.append(
                    (d, v, w, h, int(img.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "variant", "width", "height",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        encode, "doc_id long, variant string, payload binary"
    )
    return payloads.mapInPandas(
        decode,
        "doc_id long, variant string, width int, height int, "
        "pixel_checksum long",
    )


@register(
    "q_multimodal_tiff_tiled",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 31 + yy.y * 41 + xx.x * 43 + cc.c * 23) % 256
           AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 19)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 29)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) cc
)
SELECT doc_id,
       CAST(30 AS INTEGER) AS width,
       CAST(20 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(SUM(v) AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="TILED TIFF decode (round 17) — the OTHER layout real "
        "scanned archives ship (TIFF 6.0 §15): a grid of "
        "independently-compressed fixed-size tiles, zero-padded at "
        "the image edges, each tile the compression unit (the "
        "horizontal predictor resets per tile, not per image row). "
        "Closes the last refusal a real TIFF corpus hits first "
        "(functions/tiff.py: tiles for none/LZW/PackBits AND CCITT "
        "G4, grid-vs-count validation, strip/tile tag-mix refusal, "
        "grid-bomb allocation guard; both directions). Lossless: "
        "closed-form 20x30 RGB pixels per document round-trip "
        "through encode (PackBits, 16x16 tiles -> a real 2x2 grid "
        "with edge cropping) -> binary column -> decode EXACTLY to "
        "the checksum the oracle regenerates in SQL. An "
        "independently-built big-endian tiled file pins grid "
        "placement in pytest; 400-case mutation sweep. Scale shape: "
        "one Arrow-batched mapInPandas per side, zero shuffles — "
        "and at 100 TB the tiled layout is WHY a hyperslab read of "
        "a scanned page region touches only its tiles' bytes.",
)
def q_multimodal_tiff_tiled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    H, W, C = 20, 30, 3
    ys, xs, cs = np.indices((H, W, C))

    def encode(batches):
        for pdf in batches:
            payloads = [
                encode_tiff(
                    (
                        (int(d) * 31 + ys * 41 + xs * 43 + cs * 23)
                        % 256
                    ).astype(np.uint8),
                    compression="packbits",
                    tile=(16, 16),
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_tiff(bytes(payload))
                h, w, c = img.shape
                rows.append(
                    (d, w, h, c, int(img.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, "
        "pixel_checksum long",
    )


@register(
    "q_multimodal_audio_adpcm",
    oracle=_adpcm_oracle(),
    doc="IMA/DVI ADPCM WAV decode (round 17) — real compressed audio "
        "at 4:1 (WAV format tag 0x11: telephony archives, game "
        "assets, older web audio), pure integer arithmetic from the "
        "public IMA algorithm (functions/multimodal.py: 89-entry "
        "step table, nibble→diff shifts, int16 clamp, per-block "
        "header predictor + step index, low-nibble-first packing, "
        "cbSize=2 samplesPerBlock fmt layout). Because the decoder "
        "is integer-exact, the DuckDB oracle runs the ACTUAL decode "
        "recursion as a recursive CTE over the same closed-form "
        "nibble stream — the strongest oracle a compressed audio "
        "format admits here (the perceptual codecs MP3/MP2 stay "
        "loud refusals: their synthesis window table can't be "
        "transcribed reliably in-sandbox). Per doc: one 36-byte "
        "block, 64 nibbles + header sample, rate varying by doc; "
        "the WAV routes through the same RIFF walker as "
        "PCM16/G.711, so the audio dispatch picks it up by fmt tag "
        "with zero new plumbing. Encoder direction (search-free "
        "quantizer tracking decoder state) is pinned in pytest by "
        "SNR + hand-derived blocks + mutation sweep. Scale: "
        "zero-shuffle mapInPandas both sides, per-row integer CPU.",
)
def q_multimodal_audio_adpcm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import struct

    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_wav_pcm16,
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                pred = (d * 97) % 2001 - 1000
                idx = d % 89
                nibs = [(d * 3 + t * 5) % 16 for t in range(64)]
                body = struct.pack("<hBB", pred, idx, 0) + bytes(
                    nibs[i] | (nibs[i + 1] << 4)
                    for i in range(0, 64, 2)
                )
                rate = 8000 + (d % 3) * 1000
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 52 + len(body))
                    + b"WAVE"
                )
                hdr += b"fmt " + struct.pack(
                    "<IHHIIHHHH",
                    20, 0x11, 1, rate,
                    (rate * 36 + 64) // 65, 36, 4, 2, 65,
                )
                hdr += b"fact" + struct.pack("<II", 4, 65)
                hdr += b"data" + struct.pack("<I", len(body))
                payloads.append(hdr + body)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_wav_pcm16(bytes(payload))
                rows.append(
                    (
                        d,
                        int(len(samples)),
                        int(rate),
                        int(samples.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "sample_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, n_samples long, sample_rate int, "
        "sample_checksum long",
    )


@register(
    "q_multimodal_tiff_g4",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         CASE WHEN (d.doc_id * 13 + yy.y * 7 + xx.x * 3) % 11 < 4
              THEN 1 ELSE 0 END AS b
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 17)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 25)) AS x) xx
)
SELECT doc_id,
       CAST(26 AS INTEGER) AS width,
       CAST(18 AS INTEGER) AS height,
       CAST(SUM(b) AS BIGINT) AS n_black,
       CAST(SUM((1 - b) * 255) AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="CCITT Group 4 TIFF decode (round 17, VERDICT r16 #3) — the "
        "compression real scanned-document archives actually ship "
        "(ITU-T T.6 two-dimensional MMR), pure stdlib/NumPy from the "
        "public T.4/T.6 code tables (functions/tiff.py: "
        "pass/horizontal/vertical modes, white+black terminating and "
        "make-up run codes with the shared extended make-ups, both "
        "directions; extension/uncompressed mode and invalid "
        "T6Options refuse by name; FillOrder 2 DECODES since round "
        "18 via raw-byte bit reversal). G4 is "
        "lossless, so a closed-form 18x26 bilevel 'text page' per "
        "document round-trips through encode (multi-strip: 4 "
        "independently-coded G4 blocks of 5 rows) → binary column → "
        "decode EXACTLY, reducing to black-pixel count + gray "
        "checksum the oracle regenerates in SQL. Two hand-built "
        "differential streams (horizontal-mode MH codes; V0/VR1/PASS "
        "modes) are pinned bit-exactly in pytest, plus a 500-case "
        "mutation sweep. Scale shape identical to the other codec "
        "keys: one Arrow-batched mapInPandas per side, zero "
        "shuffles, per-row codec CPU riding scan parallelism.",
)
def q_multimodal_tiff_g4(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    H, W = 18, 26
    ys, xs = np.indices((H, W))

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                bits = (
                    (int(d) * 13 + ys * 7 + xs * 3) % 11 < 4
                ).astype(np.uint8)
                gray = ((1 - bits) * 255).astype(np.uint8)
                payloads.append(
                    encode_tiff(
                        gray, compression="g4", rows_per_strip=5
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_tiff(bytes(payload))
                h, w = img.shape
                rows.append(
                    (
                        d, w, h,
                        int((img == 0).sum()),
                        int(img.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_black",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_black int, "
        "pixel_checksum long",
    )


@register(
    "q_multimodal_audio_flac",
    oracle="""
WITH sm AS (
  SELECT d.doc_id,
         ((d.doc_id * 7 + i.i * 13) % 2001) - 1000 AS l,
         ((d.doc_id * 11 + i.i * 17) % 2001) - 1000 AS r
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 299)) AS i) i
)
SELECT doc_id,
       CAST(300 AS BIGINT) AS n_samples,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(2 AS INTEGER) AS n_channels,
       CAST(SUM(l + r) AS BIGINT) AS sample_checksum
FROM sm
GROUP BY doc_id
""",
    doc="REAL FLAC decode (round 16) — the container speech-"
        "pretraining corpora actually ship (LibriSpeech, MLS): a "
        "from-scratch pure-Python/NumPy codec built from the public "
        "FLAC spec (functions/flac.py — STREAMINFO + frame parse "
        "with CRC-8/CRC-16 VERIFIED, all four subframe types incl. "
        "LPC, rice residual partitions with escapes, wasted bits, "
        "left/side / right/side / mid/side stereo decorrelation; "
        "the encoder picks the best fixed predictor per block and "
        "fits rice parameters — spec-valid files that genuinely "
        "compress). FLAC is LOSSLESS, so closed-form stereo int16 "
        "samples per document round-trip through encode → binary "
        "column → decode BIT-EXACTLY and reduce to an integer "
        "checksum the oracle regenerates in SQL — any prediction, "
        "rice, CRC, or channel bug hash-mismatches. Decoder paths "
        "the encoder never emits (LPC, escapes, partition orders, "
        "all stereo modes) are pinned by hand-built differential "
        "streams in pytest. Scale shape identical to the other "
        "codec keys: one Arrow-batched mapInPandas per side, zero "
        "shuffles.",
)
def q_multimodal_audio_flac(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    N = 300
    i = np.arange(N, dtype=np.int64)

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                left = ((int(d) * 7 + i * 13) % 2001) - 1000
                right = ((int(d) * 11 + i * 17) % 2001) - 1000
                st = np.stack([left, right], axis=1).astype(np.int16)
                payloads.append(encode_flac(st, 16000, block=128))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_flac(bytes(payload))
                n, c = samples.shape
                rows.append(
                    (d, n, rate, c, int(samples.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "n_channels", "sample_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, n_samples long, sample_rate int, "
        "n_channels int, sample_checksum long",
    )


@register(
    "q_multimodal_decode_dispatch",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 19 + yy.y * 43 + xx.x * 53) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS x) xx
)
SELECT doc_id,
       CASE CAST(doc_id % 7 AS INTEGER)
         WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' WHEN 2 THEN 'png'
         WHEN 3 THEN 'qoi' WHEN 4 THEN 'gif' WHEN 5 THEN 'jpeg'
         ELSE 'tiff'
       END AS fmt,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(SUM(v) * 64 * 3 AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="HETEROGENEOUS-corpus image decode (round 16) — what a real "
        "crawled binary column looks like: each row carries a "
        "DIFFERENT container format (doc_id mod 7 chooses BMP / PPM "
        "/ PNG / QOI / GIF / JPEG / TIFF), and ONE magic-byte dispatch "
        "(functions.multimodal.decode_any) routes every payload to "
        "its pure-NumPy codec inside a single mapInPandas kernel. "
        "All seven containers carry the SAME closed-form pixels (flat "
        "8x8 gray-in-RGB blocks — lossless in the five lossless "
        "formats and exact-by-construction through JPEG at Q75), so "
        "the per-doc checksum is format-independent and the oracle "
        "regenerates it uniformly: a wrong dispatch, a codec "
        "disagreement between containers, or any format-specific "
        "defect hash-mismatches on exactly the rows of that format "
        "(the emitted fmt column localizes it). Scale shape: one "
        "Arrow-batched mapInPandas per side, zero shuffles — "
        "heterogeneity costs nothing because dispatch is per-row.",
)
def q_multimodal_decode_dispatch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions import (
        multimodal as mm,
    )
    from netcdf4_variable_streamer_spark.functions.jpeg import (
        encode_jpeg,
    )
    from netcdf4_variable_streamer_spark.functions.tiff import (
        encode_tiff,
    )

    BY, BX = 2, 2
    ys, xs = np.indices((BY, BX))
    fmts = ("bmp", "ppm", "png", "qoi", "gif", "jpeg", "tiff")

    def encode(batches):
        encoders = {
            "bmp": mm.encode_bmp,
            "ppm": mm.encode_ppm,
            "png": mm.encode_png,
            "qoi": mm.encode_qoi,
            "gif": mm.encode_gif,
            "jpeg": lambda a: encode_jpeg(
                a, quality=75, subsampling="420"
            ),
            "tiff": lambda a: encode_tiff(a, compression="packbits"),
        }
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                v = (
                    (int(d) * 19 + ys * 43 + xs * 53) % 256
                ).astype(np.uint8)
                g = v.repeat(8, axis=0).repeat(8, axis=1)
                rgb = np.stack([g, g, g], axis=2)
                fmt = fmts[int(d) % 7]
                rows.append((d, fmt, encoders[fmt](rgb)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "payload"]
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                img = mm.decode_any(bytes(payload))
                h, w, c = img.shape
                rows.append(
                    (d, fmt, w, h, c, int(img.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height",
                    "n_channels", "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        encode, "doc_id long, fmt string, payload binary"
    )
    return payloads.mapInPandas(
        decode,
        "doc_id long, fmt string, width int, height int, "
        "n_channels int, pixel_checksum long",
    )


@register(
    "q_multimodal_jpeg_progressive",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 23 + yy.y * 31 + xx.x * 41) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS x) xx
)
SELECT doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS n_channels,
       CAST(SUM(v) * 64 * 3 AS BIGINT) AS pixel_checksum
FROM px
GROUP BY doc_id
""",
    doc="REAL progressive JPEG decode (round 16) — the SOF2 "
        "multi-scan variant most web JPEGs above ~10 KB actually "
        "use: the encoder re-codes the same quantized coefficients "
        "through a 4-phase scan script (interleaved DC first at "
        "Al=1, per-component full-band AC first with EOB runs, DC "
        "refinement bits, AC refinement with buffered correction "
        "bits — all four T.81 G.2 entropy modes), and the decoder "
        "accumulates scans into per-component coefficient stores "
        "before one vectorized IDCT. Same exact-by-construction "
        "fixture trick as the baseline key (flat 8x8 gray-in-RGB "
        "blocks at Q75 -> lossless DC quantization, zero AC, chroma "
        "exactly 128), different closed form — so a defect in EOB-"
        "run bookkeeping, successive-approximation shifts, "
        "correction-bit order, non-interleaved AC geometry, or the "
        "flat progressive Huffman tables hash-mismatches against "
        "SQL. Progressive==baseline pixel identity over random "
        "images is separately test-pinned. Scale shape identical: "
        "one Arrow-batched mapInPandas per side, zero shuffles.",
)
def q_multimodal_jpeg_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    BY, BX = 2, 2
    ys, xs = np.indices((BY, BX))

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                v = (
                    (int(d) * 23 + ys * 31 + xs * 41) % 256
                ).astype(np.uint8)
                g = v.repeat(8, axis=0).repeat(8, axis=1)
                rgb = np.stack([g, g, g], axis=2)
                payloads.append(
                    encode_jpeg(
                        rgb,
                        quality=75,
                        subsampling="420",
                        progressive=True,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_jpeg(bytes(payload))
                h, w, c = img.shape
                rows.append(
                    (d, w, h, c, int(img.astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "pixel_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, n_channels int, "
        "pixel_checksum long",
    )


@register(
    "q_multimodal_gif_frames",
    oracle="""
WITH fr AS (
  SELECT d.doc_id, f.f
  FROM documents d,
       UNNEST(generate_series(0, 1 + CAST(d.doc_id % 3 AS INTEGER)))
         AS f(f)
),
px AS (
  SELECT fr.doc_id, fr.f,
         ((fr.doc_id * 7 + fr.f * 31 + yy.y * 5 + xx.x * 3
           + cc.c * 11) % 4) * 60 AS v
  FROM fr
  CROSS JOIN (SELECT UNNEST(generate_series(0, 5)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) cc
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(5 AS INTEGER) AS width,
       CAST(6 AS INTEGER) AS height,
       CAST(SUM(v) AS BIGINT) AS frame_checksum
FROM px
GROUP BY doc_id, f
ORDER BY doc_id, frame_idx
""",
    doc="REAL animated-GIF frame extraction (round 15) — the video-"
        "frame-sampling story on actual bytes: a pure-NumPy GIF89a "
        "codec (functions.multimodal.encode_gif/decode_gif — full "
        "LZW decode with dictionary rebuild, code-width growth and "
        "CLEAR/EOI handling; global+local color tables; interlace "
        "deinterlacing; draw-over composition; GCE transparency; the "
        "encoder emits the spec-valid literal-code construction any "
        "standard decoder opens). Each document carries a 2-4 frame "
        "6x5 animation with closed-form pixels; decode explodes one "
        "row per frame with an exact integer checksum the oracle "
        "regenerates in SQL — an LZW slip, palette reorder, frame "
        "miscount or composition error all hash-mismatch. Refusals "
        "are loud and named (truncation at any byte, LZW codes past "
        "the dictionary, run overruns, restore-to-previous "
        "disposal); swept with 9k mutated/truncated/random payloads. "
        "Scale shape: one Arrow-batched mapInPandas per side, rows = "
        "docs x frames, zero shuffles — the exploding-frame contract "
        "q_multimodal_frame_sample stubs is here real end to end.",
)
def q_multimodal_gif_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
    )

    H, W, C = 6, 5, 3
    ys, xs, cs = np.indices((H, W, C))

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                n = 2 + int(d) % 3
                frames = np.stack(
                    [
                        (
                            (int(d) * 7 + f * 31 + ys * 5 + xs * 3
                             + cs * 11) % 4
                        ).astype(np.uint8) * 60
                        for f in range(n)
                    ]
                )
                payloads.append(encode_gif(frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_gif(bytes(payload))
                for i, img in enumerate(frames):
                    h, w, _ = img.shape
                    rows.append(
                        (d, i, w, h, int(img.astype(np.int64).sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "frame_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        decode,
        "doc_id long, frame_idx int, width int, height int, "
        "frame_checksum long",
    ).orderBy("doc_id", "frame_idx")


@register(
    "q_multimodal_audio_g711",
    oracle="""
WITH s AS (
  SELECT d.doc_id, t.i,
         (d.doc_id * 13 + t.i * 7) % 256 AS code
  FROM documents d,
       UNNEST(generate_series(0, 299 + CAST(d.doc_id % 5 AS INTEGER)
              * 50)) AS t(i)
),
mu AS (
  SELECT doc_id, code, 255 - code AS u FROM s
),
muv AS (
  SELECT doc_id,
         CASE WHEN u >= 128
              THEN 132 - (((u % 16) * 8 + 132)
                          * (1 << ((u // 16) % 8)))
              ELSE (((u % 16) * 8 + 132)
                    * (1 << ((u // 16) % 8))) - 132
         END AS v
  FROM mu
),
al AS (
  SELECT doc_id, xor(code, 85) AS a FROM s
),
alv AS (
  SELECT doc_id,
         CASE WHEN a >= 128 THEN 1 ELSE -1 END
         * CASE WHEN ((a // 16) % 8) = 0
                THEN (a % 16) * 16 + 8
                ELSE ((a % 16) * 16 + 8 + 256)
                     << (((a // 16) % 8) - 1)
           END AS v
  FROM al
)
SELECT m.doc_id,
       CAST(300 + (m.doc_id % 5) * 50 AS BIGINT) AS n_samples,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(SUM(m.v) AS BIGINT) AS sum_mulaw,
       CAST(a.sum_alaw AS BIGINT) AS sum_alaw
FROM muv m
JOIN (SELECT doc_id, SUM(v) AS sum_alaw FROM alv GROUP BY doc_id) a
  USING (doc_id)
GROUP BY m.doc_id, a.sum_alaw
ORDER BY m.doc_id
""",
    doc="REAL G.711 telephony audio decode (round 15) — mu-law AND "
        "A-law WAV payloads (fmt tags 7 / 6, the containers ASR "
        "corpora actually ship) expand natively to int16 through the "
        "public ITU companding arithmetic (CCITT reference "
        "formulas), vectorized NumPy both directions; the VALUE-"
        "level idempotency decode(encode(decode(c))) == decode(c) "
        "over all 256 codewords of BOTH laws is test-pinned — the "
        "strongest statement a lossy companding pair admits (each "
        "law has a duplicate zero codeword, so raw codeword "
        "identity deliberately is NOT claimed). Each document "
        "carries closed-form codewords in both containers; decode "
        "reduces to exact integer sample sums the oracle regenerates "
        "from the same bit arithmetic in SQL (complement, segment "
        "shift, bias — any formula slip on either engine hash-"
        "mismatches). Scale shape: one Arrow-batched mapInPandas, "
        "zero shuffles.",
)
def q_multimodal_audio_g711(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        alaw_decode,
        decode_wav_pcm16,
        encode_wav_g711,
        mulaw_decode,
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                n = 300 + int(d) % 5 * 50
                codes = (
                    (int(d) * 13 + np.arange(n) * 7) % 256
                ).astype(np.uint8)
                # build REAL WAV containers from the codewords (the
                # encoder expects linear; decode first, then wrap —
                # G.711 is value-idempotent, so the container's data
                # bytes carry codewords decoding to exactly these
                # values)
                mu, rate = decode_wav_pcm16(
                    encode_wav_g711(mulaw_decode(codes), "mulaw")
                )
                al, _ = decode_wav_pcm16(
                    encode_wav_g711(alaw_decode(codes), "alaw")
                )
                rows.append(
                    (
                        int(d), n, rate,
                        int(mu.astype(np.int64).sum()),
                        int(al.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "sum_mulaw", "sum_alaw",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        run,
        "doc_id long, n_samples long, sample_rate int, "
        "sum_mulaw long, sum_alaw long",
    ).orderBy("doc_id")


@register(
    "q_multimodal_audio_vad",
    oracle="""
WITH s AS (
  SELECT d.doc_id, t.i,
         ((d.doc_id * 13 + t.i * (3 + d.doc_id % 5)) % 2001) - 1000 AS v
  FROM documents d,
       UNNEST(generate_series(0, 399 + CAST(d.doc_id % 7 AS INTEGER) * 100))
         AS t(i)
),
frames AS (
  SELECT doc_id, i // 160 AS frame,
         CAST(SUM(v * v) AS BIGINT) AS energy
  FROM s GROUP BY doc_id, i // 160
)
SELECT doc_id,
       COUNT(*) AS n_frames,
       CAST(SUM(CASE WHEN energy > 50000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_voiced,
       CAST(SUM(CASE WHEN energy > 50000000 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS voiced_frac,
       CAST(SUM(energy) AS BIGINT) AS total_energy,
       CAST(MAX(energy) AS BIGINT) AS max_frame_energy
FROM frames GROUP BY doc_id
""",
    doc="Frame-level voice-activity detection over real WAV payloads — "
        "the first step of every speech-corpus pipeline (silence "
        "trimming, speech-ratio filtering, segment selection): the "
        "closed-form int16 waveform of q_multimodal_audio_decode is "
        "encoded to RIFF/WAVE PCM16 bytes (pure-NumPy codec), shipped "
        "as an opaque binary column, decoded back, and cut into "
        "10 ms-at-16 kHz frames (160 samples); each frame's integer "
        "energy gates a voiced/unvoiced decision and the document "
        "reports frame counts, voiced fraction, and energy stats — all "
        "exact integers (plus one exact int/int division), so the SQL "
        "regeneration hash-matches bit-for-bit. Scale shape: encode "
        "and decode+frame are each one zero-shuffle mapInPandas (the "
        "frames of a payload are colocated by construction — framing "
        "runs INSIDE the decode UDF, no per-frame rows ever shuffle); "
        "parallelism = scan parallelism at 100 TB.",
)
def q_multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    FRAME = 160
    THRESH = 50_000_000

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 400 + (d % 7) * 100
                i = np.arange(n, dtype=np.int64)
                v = ((d * 13 + i * (3 + d % 5)) % 2001) - 1000
                payloads.append(encode_wav_pcm16(v.astype(np.int16)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def vad(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                s, _rate = decode_wav_pcm16(bytes(payload))
                v = s.astype(np.int64)
                n = len(v)
                n_frames = -(-n // FRAME)
                pad = np.zeros(n_frames * FRAME, dtype=np.int64)
                pad[:n] = v
                energy = (pad * pad).reshape(n_frames, FRAME).sum(axis=1)
                voiced = int((energy > THRESH).sum())
                rows.append(
                    (
                        d,
                        n_frames,
                        voiced,
                        voiced / n_frames,
                        int(energy.sum()),
                        int(energy.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_voiced", "voiced_frac",
                    "total_energy", "max_frame_energy",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        vad,
        "doc_id long, n_frames long, n_voiced long, voiced_frac double, "
        "total_energy long, max_frame_energy long",
    )


@register(
    "q_dedup_image_phash",
    oracle="""
WITH px AS (
  SELECT d.doc_id, d.doc_id % 50 AS img, yy.y, xx.x,
         (d.doc_id % 50 * 37 + yy.y * 17 + xx.x * 29
          + (xx.x * yy.y) % 13) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS x) xx
),
blocks AS (
  SELECT doc_id, y // 2 AS by, x // 2 AS bx,
         CAST(SUM(v) AS BIGINT) // 4 AS b
  FROM px GROUP BY doc_id, y // 2, x // 2
),
tot AS (
  SELECT doc_id, CAST(SUM(v) AS BIGINT) // 256 AS t
  FROM px GROUP BY doc_id
),
bits AS (
  SELECT b.doc_id, b.by * 8 + b.bx AS k,
         CASE WHEN b.b > t.t THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN tot t USING (doc_id)
),
hashes AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN k < 32
                       THEN bit * (CAST(1 AS BIGINT) << k)
                       ELSE 0 END) AS BIGINT) AS h_hi,
         CAST(SUM(CASE WHEN k >= 32
                       THEN bit * (CAST(1 AS BIGINT) << (k - 32))
                       ELSE 0 END) AS BIGINT) AS h_lo
  FROM bits GROUP BY doc_id
),
clusters AS (
  SELECT h_hi, h_lo, MIN(doc_id) AS keep_doc,
         COUNT(*) AS cluster_n
  FROM hashes GROUP BY h_hi, h_lo
)
SELECT h.doc_id, h.h_hi, h.h_lo, c.keep_doc,
       CAST(c.cluster_n AS BIGINT) AS cluster_n,
       h.doc_id <> c.keep_doc AS is_dup
FROM hashes h JOIN clusters c ON h.h_hi = c.h_hi AND h.h_lo = c.h_lo
""",
    doc="Perceptual-hash image dedup — the multimodal sibling of the "
        "text near-dup family (crawled corpora carry the same image "
        "under many URLs; byte-level md5 misses re-encodes, a "
        "perceptual hash catches them): each document's 16x16 grayscale "
        "image is encoded to a REAL 24-bit BMP (pure-NumPy codec), "
        "shipped as an opaque binary column, decoded back, and reduced "
        "to the classic integer average-hash — 2x2 block means "
        "thresholded at the global mean, 64 bits packed as two int32 "
        "halves (a single int64 would overflow at bit 63) — entirely "
        "in floor-exact integer arithmetic, so the SQL regeneration "
        "hash-matches bit-for-bit. Dedup is then hash-equality cluster "
        "election (min-doc_id keeper), the exact-dedup shape on the "
        "64-bit perceptual key; a hamming<=k variant would add the "
        "SimHash pigeonhole bucketing of q_dedup_simhash on the same "
        "halves. Scale: encode/decode+hash are zero-shuffle "
        "mapInPandas; clustering is ONE hash-keyed agg + score-back "
        "join — no pairwise stage.",
)
def q_dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    ys, xs = np.indices((16, 16))

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                img = int(d) % 50
                gray = (
                    (img * 37 + ys * 17 + xs * 29 + (xs * ys) % 13) % 256
                ).astype(np.uint8)
                payloads.append(
                    encode_bmp(np.repeat(gray[:, :, None], 3, axis=2))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def ahash(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                gray = decode_bmp(bytes(payload))[:, :, 0].astype(np.int64)
                blocks = gray.reshape(8, 2, 8, 2).sum(axis=(1, 3)) >> 2
                t = int(gray.sum()) >> 8
                bits = (blocks > t).reshape(-1)
                h_hi = sum(int(bits[k]) << k for k in range(32))
                h_lo = sum(int(bits[k + 32]) << k for k in range(32))
                rows.append((d, h_hi, h_lo))
            yield pd.DataFrame(rows, columns=["doc_id", "h_hi", "h_lo"])

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    hashes = payloads.mapInPandas(
        ahash, "doc_id long, h_hi long, h_lo long"
    )
    clusters = hashes.groupBy("h_hi", "h_lo").agg(
        F.min("doc_id").alias("keep_doc"),
        F.count(F.lit(1)).cast("long").alias("cluster_n"),
    )
    return hashes.join(clusters, ["h_hi", "h_lo"]).select(
        "doc_id",
        "h_hi",
        "h_lo",
        "keep_doc",
        "cluster_n",
        (F.col("doc_id") != F.col("keep_doc")).alias("is_dup"),
    )


@register(
    "q_multimodal_patchify",
    oracle="""
WITH px AS (
  SELECT d.doc_id, yy.y, xx.x, cc.c,
         (d.doc_id * 31 + yy.y * 7 + xx.x * 3 + cc.c * 11) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS y) yy
  CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS x) xx
  CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS c) cc
)
SELECT doc_id,
       CAST((y // 4) * 2 + (x // 4) AS INTEGER) AS patch_id,
       CAST(y // 4 AS INTEGER) AS py,
       CAST(x // 4 AS INTEGER) AS px,
       CAST(COUNT(*) AS BIGINT) AS n_values,
       CAST(SUM(v) AS BIGINT) AS sum_patch,
       CAST(SUM(v * ((y % 4) * 12 + (x % 4) * 3 + c)) AS BIGINT)
         AS weighted_checksum
FROM px
GROUP BY doc_id, y // 4, x // 4
ORDER BY doc_id, patch_id
""",
    doc="ViT-style PATCHIFY (round 12) — the tokenization step every "
        "vision-language pretraining pipeline runs before the "
        "encoder: closed-form 8x8 RGB images round-trip through the "
        "pure-NumPy BMP codec as binary payloads, then a mapInPandas "
        "kernel decodes and cuts each image into non-overlapping 4x4 "
        "patches in raster order (patch_id = py*grid_w + px, exactly "
        "ViT's flattening), emitting one row per patch with an "
        "integer sum and a position-in-patch weighted checksum — a "
        "transposed, shifted, or column-major patch cut "
        "hash-mismatches. Same 100 TB shape as decode/resize: two "
        "chained narrow mapInPandas stages, rows = docs x patches, "
        "zero shuffles (the ORDER BY is the driver-compare "
        "convention, not a plan stage); a real ViT preprocessor "
        "(patch + linear projection) drops into the same kernel "
        "signature with the weights broadcast.",
)
def q_multimodal_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    H = W = 8
    C = 3
    P = 4
    ys, xs, cs = np.indices((H, W, C))
    pos_w = (ys % P) * (P * C) + (xs % P) * C + cs  # weight per pixel

    def encode(batches):
        for pdf in batches:
            payloads = [
                encode_bmp(
                    ((int(d) * 31 + ys * 7 + xs * 3 + cs * 11) % 256).astype(
                        np.uint8
                    )
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def patchify(batches):
        gw = W // P
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload)).astype(np.int64)
                wimg = img * pos_w
                for py in range(H // P):
                    for px_ in range(gw):
                        sl = (
                            slice(py * P, (py + 1) * P),
                            slice(px_ * P, (px_ + 1) * P),
                        )
                        rows.append(
                            (
                                d,
                                py * gw + px_,
                                py,
                                px_,
                                P * P * C,
                                int(img[sl].sum()),
                                int(wimg[sl].sum()),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "patch_id", "py", "px",
                    "n_values", "sum_patch", "weighted_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        patchify,
        "doc_id long, patch_id int, py int, px int, n_values long, "
        "sum_patch long, weighted_checksum long",
    ).orderBy("doc_id", "patch_id")


@register(
    "q_multimodal_audio_resample",
    oracle="""
WITH s AS (
  SELECT d.doc_id, t.i,
         ((d.doc_id * 13 + t.i * (3 + d.doc_id % 5)) % 2001) - 1000 AS v
  FROM documents d,
       UNNEST(generate_series(0, 399 + CAST(d.doc_id % 7 AS INTEGER) * 100))
         AS t(i)
),
y AS (
  -- FLOOR division (numpy's // semantics): DuckDB's integer //
  -- truncates toward zero on negatives, so floor via double
  -- (|sum| <= 2000, exact in float64)
  SELECT doc_id, i // 2 AS j,
         CAST(FLOOR(SUM(v) / 2.0) AS BIGINT) AS w
  FROM s GROUP BY doc_id, i // 2
)
SELECT doc_id,
       COUNT(*) AS n_out,
       CAST(8000 AS INTEGER) AS rate_out,
       CAST(SUM(ABS(w)) AS BIGINT) AS sum_abs_out,
       CAST(SUM(w * w) AS BIGINT) AS energy_out,
       TRUE AS roundtrip_ok
FROM y GROUP BY doc_id
""",
    doc="Audio RESAMPLE (round 12 — the 16 kHz -> 8 kHz decimation "
        "every speech pipeline runs before feature extraction): the "
        "closed-form PCM16 waveform decodes through the real WAV "
        "parser, a 2-tap boxcar decimator halves the rate in integer "
        "arithmetic (floor((s[2j]+s[2j+1])/2) — numpy floor-division "
        "matches DuckDB's //, no float filter), and the result "
        "RE-ENCODES to a real 8 kHz WAV that is decoded AGAIN and "
        "asserted sample-identical before stats are emitted — the "
        "codec round-trips its own resampled output. Same scale "
        "shape as the other audio keys: one mapInPandas encode + one "
        "decode-resample-reencode kernel, zero shuffles, decode "
        "parallelism = scan parallelism.",
)
def q_multimodal_audio_resample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 400 + (d % 7) * 100
                i = np.arange(n, dtype=np.int64)
                v = ((d * 13 + i * (3 + d % 5)) % 2001) - 1000
                payloads.append(
                    encode_wav_pcm16(v.astype(np.int16))
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def resample(batches):
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                s, rate = decode_wav_pcm16(bytes(payload))
                v = s.astype(np.int64)
                w = (v[0::2] + v[1::2]) // 2  # floor, matches SQL //
                out_rate = rate // 2
                # re-encode at the halved rate, decode again, assert
                # the codec round-trips its own resampled output
                back, back_rate = decode_wav_pcm16(
                    encode_wav_pcm16(
                        w.astype(np.int16), sample_rate=out_rate
                    )
                )
                ok = bool(
                    back_rate == out_rate
                    and np.array_equal(back.astype(np.int64), w)
                )
                rows.append(
                    (
                        d,
                        len(w),
                        out_rate,
                        int(np.abs(w).sum()),
                        int((w * w).sum()),
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_out", "rate_out",
                    "sum_abs_out", "energy_out", "roundtrip_ok",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, "doc_id long, payload binary")
    return payloads.mapInPandas(
        resample,
        "doc_id long, n_out long, rate_out int, sum_abs_out long, "
        "energy_out long, roundtrip_ok boolean",
    )


@register(
    "q_multimodal_audio_vorbis",
    oracle="""
WITH d AS (SELECT doc_id, doc_id % 2 AS v FROM documents),
mono_floor AS (
  SELECT d.doc_id,
         SUM((d.doc_id*5 + f.range*3) % 256
             + (d.doc_id*3 + f.range*7) % 256) AS fc
  FROM d, range(0, 4) f WHERE d.v = 0 GROUP BY d.doc_id
),
mono_res AS (
  SELECT d.doc_id,
         SUM(CASE WHEN (d.doc_id + f.range + p.range) % 2 = 1
                  THEN (d.doc_id*7 + f.range*5 + p.range*3 + i.range)
                       % 17 - 8
                  ELSE 0 END) AS rc
  FROM d, range(0, 4) f, range(0, 8) p, range(0, 8) i
  WHERE d.v = 0 GROUP BY d.doc_id
),
st_flag AS (
  SELECT f.range AS f,
         CASE WHEN f.range IN (1, 2) THEN 32 ELSE 8 END AS parts
  FROM range(0, 4) f
),
st_floor AS (
  SELECT d.doc_id,
         SUM((d.doc_id*3 + f.range + c.range) % 128
             + (d.doc_id*5 + f.range*2 + c.range) % 128
             + (d.doc_id + f.range + c.range) % 16
             + (d.doc_id*2 + f.range + c.range) % 16
             + (d.doc_id*7 + f.range + c.range) % 16) AS fc
  FROM d, range(0, 4) f, range(0, 2) c
  WHERE d.v = 1 GROUP BY d.doc_id
),
st_res AS (
  SELECT d.doc_id,
         SUM(CASE WHEN q.range < s.parts
                   AND (d.doc_id + s.f + q.range) % 2 = 1
                  THEN
           ((d.doc_id + s.f + q.range) % 8) % 2
           + (((d.doc_id + s.f + q.range) % 8) // 2) % 2
           + (((d.doc_id + s.f + q.range) % 8) // 4) % 2
           + ((d.doc_id + s.f + q.range) % 8) % 4 - 8
           + ((d.doc_id*3 + s.f + q.range) % 8) % 2
           + (((d.doc_id*3 + s.f + q.range) % 8) // 2) % 2
           + (((d.doc_id*3 + s.f + q.range) % 8) // 4) % 2
           + ((d.doc_id*3 + s.f + q.range) % 8) % 4 - 8
           + (SELECT SUM((d.doc_id*11 + s.f*7 + q.range*3 + i.range)
                         % 17 - 8)
              FROM range(0, 8) i)
                  ELSE 0 END) AS rc
  FROM d, st_flag s, range(0, 32) q
  WHERE d.v = 1 GROUP BY d.doc_id
)
SELECT d.doc_id,
       CASE WHEN d.v = 0 THEN 'ogg_vorbis_mono'
            ELSE 'ogg_vorbis_stereo' END AS fmt,
       CAST(CASE WHEN d.v = 0 THEN 1 ELSE 2 END AS INTEGER)
         AS channels,
       CAST(CASE WHEN d.v = 0 THEN 8000 ELSE 16000 END AS INTEGER)
         AS sample_rate,
       CAST(4 AS BIGINT) AS n_packets,
       CAST(CASE WHEN d.v = 0 THEN 192 ELSE 288 END AS BIGINT)
         AS n_samples,
       CAST(COALESCE(mf.fc, sf.fc) AS BIGINT) AS floor_checksum,
       CAST(COALESCE(mr.rc, sr.rc) AS BIGINT) AS residue_checksum
FROM d
LEFT JOIN mono_floor mf USING (doc_id)
LEFT JOIN mono_res mr USING (doc_id)
LEFT JOIN st_floor sf USING (doc_id)
LEFT JOIN st_res sr USING (doc_id)
""",
    doc="OGG VORBIS decode (round 18, VERDICT r17 #3) — the "
        "perceptually-compressed-audio step MP3 could not honestly "
        "take: every constant Vorbis needs rides IN the stream "
        "(Huffman codebooks, floor/residue/mapping configs all live "
        "in the setup header) or is an analytic spec formula (the "
        "window, the 140dB/256-step inverse-dB ramp, float32_unpack, "
        "the MDCT basis), so nothing requires transcribing an ISO "
        "table that could silently round-trip wrong "
        "(functions/vorbis.py — full Ogg page framing with the RFC "
        "3533 CRC, LSB-first bitpack, complete codebook/floor1/"
        "residue-0-1-2/mapping/mode setup parse, floor1's integer "
        "prediction walk, multi-pass residue with classword radix "
        "decode, square-polar coupling inverse, IMDCT + "
        "Princen-Bradley window + variable-blocksize overlap-add). "
        "Each doc builds an exact-by-construction fixture stream "
        "(even docs: mono, one blocksize, zero-partition floor, "
        "residue type 1; odd docs: stereo with one coupling step, "
        "64/256 dual blocksizes with truthful window flags, a "
        "partitioned floor through a subclass book, residue type 2 "
        "with a two-pass cascade over lookup-type-2 AND lookup-type-1 "
        "books) and decodes it through the SAME generic bitstream "
        "decoder `decode_audio_any` dispatches to; the emitted "
        "observables are the bit-exact integer plane of the decode "
        "(decoded floor Y sums, rounded residue sums, packet/sample "
        "counts), regenerated closed-form in SQL — the float "
        "synthesis tail is pinned by analytic identities in pytest "
        "(COLA = 1, TDAC symmetry, perfect reconstruction at gain "
        "n/4 against a test-local forward MDCT). Scale shape: zero "
        "shuffles, one Arrow-batched mapInPandas per side; per-row "
        "entropy decode is the documented per-symbol-codec posture, "
        "dividing by executor count on a real cluster.",
)
def q_multimodal_audio_vorbis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from netcdf4_variable_streamer_spark.functions.vorbis import (
        encode_ogg_vorbis_mono,
        encode_ogg_vorbis_stereo,
        vorbis_stream_stats,
    )

    def mk_mono(doc: int) -> bytes:
        frames = []
        for f in range(4):
            y = ((doc * 5 + f * 3) % 256, (doc * 3 + f * 7) % 256)
            classes = [(doc + f + p) % 2 for p in range(8)]
            rv = [
                ((doc * 7 + f * 5 + p * 3 + i) % 17 - 8)
                if classes[p]
                else 0
                for p in range(8)
                for i in range(8)
            ]
            frames.append((y, classes, rv))
        return encode_ogg_vorbis_mono(frames, sample_rate=8000)

    def mk_stereo(doc: int) -> bytes:
        flags = [0, 1, 1, 0]
        frames = []
        for fi, bf in enumerate(flags):
            parts = (256 if bf else 64) // 8
            ys = tuple(
                (
                    (doc * 3 + fi + ch) % 128,
                    (doc * 5 + fi * 2 + ch) % 128,
                    (doc + fi + ch) % 16,
                    (doc * 2 + fi + ch) % 16,
                    (doc * 7 + fi + ch) % 16,
                )
                for ch in range(2)
            )
            classes = [(doc + fi + q) % 2 for q in range(parts)]
            p0, p1 = [], []
            for q in range(parts):
                if classes[q]:
                    p0 += [(doc + fi + q) % 8, (doc * 3 + fi + q) % 8]
                    p1 += [
                        ((doc * 11 + fi * 7 + q * 3 + i) % 17 - 8)
                        for i in range(8)
                    ]
            frames.append((bf, ys, classes, p0, p1))
        return encode_ogg_vorbis_stereo(frames, sample_rate=16000)

    def encode(batches):
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    rows.append((d, "ogg_vorbis_mono", mk_mono(d)))
                else:
                    rows.append(
                        (d, "ogg_vorbis_stereo", mk_stereo(d))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "fmt", "payload"]
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, fmt, payload in zip(
                pdf["doc_id"], pdf["fmt"], pdf["payload"]
            ):
                st = vorbis_stream_stats(bytes(payload))
                rows.append(
                    (
                        d,
                        fmt,
                        st["channels"],
                        st["sample_rate"],
                        st["n_packets"],
                        st["n_samples"],
                        st["floor_checksum"],
                        st["residue_checksum"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "channels", "sample_rate",
                    "n_packets", "n_samples", "floor_checksum",
                    "residue_checksum",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        encode, "doc_id long, fmt string, payload binary"
    )
    return payloads.mapInPandas(
        decode,
        "doc_id long, fmt string, channels int, sample_rate int, "
        "n_packets long, n_samples long, floor_checksum long, "
        "residue_checksum long",
    )


@register(
    "q_multimodal_png16",
    oracle="""
WITH px AS (
  SELECT d.doc_id,
         (d.doc_id * 2999 + yy.range * 513 + xx.range * 257) % 65536
           AS v
  FROM documents d, range(0, 6) yy, range(0, 9) xx
)
SELECT doc_id,
       CAST(9 AS INTEGER) AS width,
       CAST(6 AS INTEGER) AS height,
       CAST(16 AS INTEGER) AS bit_depth,
       CAST(doc_id % 2 AS INTEGER) AS interlaced,
       CAST(SUM(v) AS BIGINT) AS pixel_checksum,
       CAST(MAX(v) AS BIGINT) AS pixel_max
FROM px
GROUP BY doc_id
""",
    doc="16-BIT PNG decode (round 18) — the scientific/HDR sample "
        "class (depth maps, medical scans, astronomy plates) that "
        "was a named refusal through round 17: big-endian sample "
        "pairs decode to uint16 through the same filter/interlace "
        "machinery as 8-bit (functions/multimodal.py decode_png; "
        "the Sub/Paeth left-neighbor distance becomes the full "
        "2-byte-per-sample stride, tRNS keys match at full 16-bit "
        "range). Lossless: closed-form 6x9 uint16 pixels per "
        "document are hand-chunked into a REAL PNG (even docs plain "
        "with alternating None/Sub row filters — exercising the "
        "2-byte filter stride; odd docs Adam7-interlaced), decoded "
        "through decode_any's magic-byte dispatch, and reduce to "
        "the checksum SQL regenerates. Scale shape: zero shuffles, "
        "one Arrow-batched mapInPandas per side, decode CPU rides "
        "scan parallelism.",
)
def q_multimodal_png16(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct
    import zlib

    import numpy as np

    from netcdf4_variable_streamer_spark.functions.multimodal import (
        _ADAM7,
        _PNG_SIG,
        decode_any,
    )

    H, W = 6, 9
    ys, xs = np.indices((H, W))

    def chunk(t: bytes, b: bytes) -> bytes:
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    def encode(batches):
        for pdf in batches:
            rows_out = []
            for d in pdf["doc_id"]:
                d = int(d)
                g = (
                    (d * 2999 + ys * 513 + xs * 257) % 65536
                ).astype(np.uint16)
                interlace = d % 2
                scan = bytearray()
                if interlace:
                    for x0, y0, dx, dy in _ADAM7:
                        for r in g[y0:H:dy, x0:W:dx]:
                            scan += b"\x00" + r.astype(">u2").tobytes()
                else:
                    for y in range(H):
                        raw = g[y].astype(">u2").tobytes()
                        if y % 2:
                            filt = bytearray(raw)
                            for i in range(len(raw) - 1, 1, -1):
                                filt[i] = (raw[i] - raw[i - 2]) % 256
                            scan += b"\x01" + bytes(filt)
                        else:
                            scan += b"\x00" + raw
                png = (
                    _PNG_SIG
                    + chunk(
                        b"IHDR",
                        struct.pack(
                            ">IIBBBBB", W, H, 16, 0, 0, 0, interlace
                        ),
                    )
                    + chunk(b"IDAT", zlib.compress(bytes(scan)))
                    + chunk(b"IEND", b"")
                )
                rows_out.append((d, interlace, png))
            yield pd.DataFrame(
                rows_out, columns=["doc_id", "interlaced", "payload"]
            )

    def decode(batches):
        for pdf in batches:
            rows = []
            for d, il, payload in zip(
                pdf["doc_id"], pdf["interlaced"], pdf["payload"]
            ):
                img = decode_any(bytes(payload))
                assert img.dtype == np.uint16
                h, w = img.shape[:2]
                v = img.astype(np.int64)
                rows.append(
                    (d, w, h, 16, int(il), int(v.sum()), int(v.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "bit_depth",
                    "interlaced", "pixel_checksum", "pixel_max",
                ],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(
        encode, "doc_id long, interlaced int, payload binary"
    )
    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, bit_depth int, "
        "interlaced int, pixel_checksum long, pixel_max long",
    )
