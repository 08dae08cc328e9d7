"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` stages. The decode
step itself is STUBBED (no image/audio libs in this container): it
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic md5-derived feature vector stands in — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

The synthetic binary corpus derives from the documents table (the HTML
wrapper bytes), so metadata extraction is oracle-comparable.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from glug_spark import corpus

FEATURE_DIM = 16

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def media_table(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, media_type, n_bytes) — deterministic
    synthetic binary column (the HTML page bytes)."""
    url = F.expr(corpus.url_sql())
    page = F.encode(
        F.concat(
            F.lit("<html><head><title>"), url,
            F.lit("</title></head><body><pre>"), F.col("text"),
            F.lit("</pre></body></html>"),
        ),
        "UTF-8",
    )
    return docs.select(
        "doc_id",
        page.alias("payload"),
        F.lit("text/html").alias("media_type"),
        F.length(page).cast("long").alias("n_bytes"),
    )


MEDIA_METADATA_SQL = f"""
WITH w AS ({corpus.WEBTEXT_SQL})
SELECT doc_id,
       'text/html' AS media_type,
       CAST(strlen(page) AS BIGINT) AS n_bytes,  -- strlen = BYTE length
       CASE WHEN page LIKE '<html>%' THEN 'html' ELSE 'unknown' END AS sniffed
FROM w
"""


def media_metadata(docs: DataFrame) -> DataFrame:
    """Metadata + magic-byte sniff — pure column ops, oracle-checked."""
    m = media_table(docs)
    text = F.decode(F.col("payload"), "UTF-8")
    return m.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.when(text.startswith("<html>"), "html").otherwise("unknown").alias("sniffed"),
    )


def decode_payload(payload: bytes, media_type: str):
    """The real decoder hook — unavailable in this container."""
    raise NotImplementedError(
        f"no decoder for {media_type} in this environment; "
        "use extract_features(fake=True) for deterministic stand-ins"
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic md5-derived stand-in feature vector in [0, 1)."""
    raw = hashlib.md5(payload).digest()
    ext = (raw * ((FEATURE_DIM // len(raw)) + 1))[:FEATURE_DIM]
    return np.frombuffer(bytes(ext), dtype=np.uint8).astype(np.float32) / 256.0


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, frame_idx, frame binary) — deterministic fixed-stride
    "frame sampling" over the opaque payload: the video-analog plumbing
    (one input row → n output rows, binary slices, stable ordering).
    A real decoder would replace the byte-slicing with keyframe
    extraction; schema, batching, and explode shape are the contract.
    """
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                stride = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    rows.append({
                        "doc_id": int(doc_id),
                        "frame_idx": i,
                        "frame": raw[i * stride : i * stride + stride],
                    })
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(batches, schema=schema)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """(doc_id, feat array<float>) via Arrow-batched mapInPandas.

    Batch shape is the real contract: each pandas batch holds many
    payloads; a real decoder would be vectorized over the batch exactly
    like the fake one.
    """
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                for p, mt in zip(pdf["payload"], pdf["media_type"]):
                    decode_payload(p, mt)  # raises
            feats = [
                _fake_features(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})

    return media.select("doc_id", "payload", "media_type").mapInPandas(
        batches, schema=schema
    )


def feature_rows(media: DataFrame) -> DataFrame:
    """(doc_id, dim, value) — :func:`extract_features` exploded to a
    hashable relational shape (one row per vector component, rounded
    doubles). This is the oracle-checked projection; the array form
    stays available for pipeline composition."""
    f = extract_features(media)
    return f.select(
        "doc_id",
        F.posexplode(F.col("feat").cast("array<double>")).alias("dim", "value"),
    ).select("doc_id", "dim", F.round("value", 6).alias("value"))


#: oracle twin of feature_rows: the fake features are the md5 digest
#: bytes of the payload / 256 — digest byte d is hex chars 2d+1..2d+2.
FEATURE_ROWS_SQL = f"""
WITH w AS ({corpus.WEBTEXT_SQL})
SELECT doc_id,
       CAST(j AS INT) AS dim,
       round((('0x' || substr(md5(page), CAST(j * 2 + 1 AS INT), 2))::INT)
             / 256.0, 6) AS value
FROM w CROSS JOIN range({FEATURE_DIM}) t(j)
"""


RESIZE_SAMPLES = 64


def resize_media(media: DataFrame, n_samples: int = RESIZE_SAMPLES) -> DataFrame:
    """(doc_id, resized binary) — the image-resize plumbing analog:
    deterministic fixed-stride downsampling of the opaque payload to at
    most ``n_samples`` bytes. A real decoder would replace the byte
    stride with pixel-space interpolation; the mapInPandas batch shape,
    1→1 row contract and binary output schema are the real contract.
    """
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                stride = max(1, len(raw) // n_samples)
                out.append({
                    "doc_id": int(doc_id),
                    "resized": raw[::stride][:n_samples],
                })
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(batches, schema=schema)


def resize_digests(media: DataFrame, n_samples: int = RESIZE_SAMPLES) -> DataFrame:
    """Hashable projection of :func:`resize_media` for the oracle."""
    r = resize_media(media, n_samples)
    return r.select(
        "doc_id",
        F.md5("resized").alias("resized_md5"),
        F.length("resized").cast("long").alias("resized_len"),
    )


def resize_digests_sql(n_samples: int = RESIZE_SAMPLES) -> str:
    """Oracle twin (ASCII corpus: VARCHAR char == byte)."""
    return f"""
WITH w AS ({corpus.WEBTEXT_SQL}),
s AS (SELECT doc_id, page, greatest(1, strlen(page) // {n_samples}) AS stride
      FROM w),
samp AS (
    SELECT doc_id,
           string_agg(substr(page, CAST(1 + i * stride AS BIGINT), 1),
                      '' ORDER BY i) AS r
    FROM s CROSS JOIN range({n_samples}) t(i)
    WHERE 1 + i * stride <= strlen(page)
    GROUP BY doc_id
)
SELECT doc_id, md5(r) AS resized_md5, CAST(strlen(r) AS BIGINT) AS resized_len
FROM samp
"""


def frame_digests(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, frame_idx, frame_md5, frame_len) — :func:`sample_frames`
    projected to a hashable shape (binary slices digested)."""
    fr = sample_frames(media, n_frames)
    return fr.select(
        "doc_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("long").alias("frame_len"),
    )


def media_pipeline(media: DataFrame, n_frames: int = 4,
                   n_samples: int = RESIZE_SAMPLES) -> DataFrame:
    """(doc_id, stage, idx, digest, metric) — the three media stages
    (feature extract / frame sample / resize) FUSED into one
    ``mapInPandas`` pass: each payload is read once and yields all
    three stages' rows, instead of a 3-way union that scans the corpus
    three times (the 100 TB concern; the per-stage functions remain for
    individual use and their outputs are asserted identical by the
    oracle row). ``digest`` is '' (not NULL) on feature rows so the
    cross-engine value hash never depends on NULL ordering."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("stage", T.StringType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("metric", T.DoubleType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                doc_id = int(doc_id)
                raw = bytes(payload)
                feats = _fake_features(raw)
                rows += [
                    # HALF_UP at 6 dp (Spark's F.round / DuckDB round);
                    # Python's round() is half-to-even and diverges on
                    # the exact .5 ties byte/256.0 produces
                    {"doc_id": doc_id, "stage": "feature", "idx": j,
                     "digest": "",
                     "metric": math.floor(float(v) * 1e6 + 0.5) / 1e6}
                    for j, v in enumerate(feats.astype(np.float64))
                ]
                stride = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    fr = raw[i * stride : i * stride + stride]
                    rows.append({
                        "doc_id": doc_id, "stage": "frame", "idx": i,
                        "digest": hashlib.md5(fr).hexdigest(),
                        "metric": float(len(fr)),
                    })
                rs = max(1, len(raw) // n_samples)
                rez = raw[::rs][:n_samples]
                rows.append({
                    "doc_id": doc_id, "stage": "resize", "idx": 0,
                    "digest": hashlib.md5(rez).hexdigest(),
                    "metric": float(len(rez)),
                })
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        batches, schema=schema
    )


def media_pipeline_sql() -> str:
    return f"""
SELECT doc_id, 'feature' AS stage, idx, digest, metric FROM (
    SELECT doc_id, dim AS idx, '' AS digest, value AS metric
    FROM ({FEATURE_ROWS_SQL}))
UNION ALL
SELECT doc_id, 'frame' AS stage, idx, digest, metric FROM (
    SELECT doc_id, frame_idx AS idx, frame_md5 AS digest,
           CAST(frame_len AS DOUBLE) AS metric
    FROM ({frame_digests_sql()}))
UNION ALL
SELECT doc_id, 'resize' AS stage, idx, digest, metric FROM (
    SELECT doc_id, CAST(0 AS INT) AS idx, resized_md5 AS digest,
           CAST(resized_len AS DOUBLE) AS metric
    FROM ({resize_digests_sql()}))
"""


def frame_digests_sql(n_frames: int = 4) -> str:
    """Oracle twin of frame_digests. The corpus is pure ASCII (asserted
    by the extract_roundtrip invariant + strlen==length on the data), so
    VARCHAR substr slicing equals the Spark-side byte slicing."""
    return f"""
WITH w AS ({corpus.WEBTEXT_SQL}),
s AS (SELECT doc_id, page, greatest(1, strlen(page) // {n_frames}) AS stride
      FROM w)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       md5(substr(page, CAST(i * stride + 1 AS BIGINT), stride)) AS frame_md5,
       CAST(strlen(substr(page, CAST(i * stride + 1 AS BIGINT), stride))
            AS BIGINT) AS frame_len
FROM s CROSS JOIN range({n_frames}) t(i)
"""
