"""Multimodal + guarded-execution queries.

The media table derives deterministically from documents (payload =
utf-8 bytes of text), so the binary-column plumbing is oracle-checkable
wherever the computation is hash/length-based; the feature-array path
(Python extractor) is rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_deduplicator_spark.operators import multimodal as MM
from distributed_deduplicator_spark.operators.guarded import guarded_process
from distributed_deduplicator_spark.queries.registry import query
from distributed_deduplicator_spark.sources import load_table

_MEDIA_TYPE_SQL = ("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
                   "ELSE 'video' END")


def _sha_u32_sql(i: int, hx: str = "hx") -> str:
    """DuckDB expression for feature dimension ``i`` of the fake
    extractor (operators/multimodal._fake_decode_features): the i-th
    big-endian u32 of the sha256 digest, divided by 2^32. Parses the 8
    hex chars digit-by-digit — every term is an exact integer < 2^32,
    so the BIGINT sum and the final power-of-two division are
    bit-identical to Python's ``int.from_bytes(...) / 2**32``."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hx}, {i * 8 + k}, 1)) - 1) "
        f"* {16 ** (8 - k)}"
        for k in range(1, 9))
    return f"(CAST({terms} AS DOUBLE) / 4294967296.0)"


_F_COLS_SQL = ",\n       ".join(
    f"{_sha_u32_sql(i)} AS f{i}" for i in range(8))


@query("multimodal_stats", oracle=f"""
SELECT {_MEDIA_TYPE_SQL} AS media_type,
       count(*) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       min(octet_length(encode(text))) AS min_bytes,
       max(octet_length(encode(text))) AS max_bytes
FROM documents
GROUP BY 1
""")
def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload size profile per media_type — pure-JVM metadata pass
    over binary columns (no Python touches the payload)."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.media_stats(MM.media_from_documents(docs))


@query("multimodal_content_hash", oracle=f"""
SELECT doc_id AS media_id,
       {_MEDIA_TYPE_SQL} AS media_type,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS content_sha
FROM documents
""")
def q_multimodal_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content identity for binary payloads, pure-JVM: sha2 + length
    run in whole-stage codegen — hashing never needs Python (the Arrow
    plumbing is proven by multimodal_features, which carries the real
    extractor)."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.media_from_documents(docs)
    return media.select(
        "media_id", "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("content_sha"))


@query("multimodal_features", oracle=f"""
WITH m AS (
  SELECT doc_id AS media_id, {_MEDIA_TYPE_SQL} AS media_type,
         octet_length(encode(text)) AS n_bytes, sha256(text) AS hx
  FROM documents)
SELECT media_id, media_type, CAST(n_bytes AS BIGINT) AS n_bytes,
       hx AS content_sha,
       {_F_COLS_SQL}
FROM m
""")
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full feature-extraction pipeline incl. the 8-dim feature vector
    from the deterministic fake extractor (real codecs stubbed —
    operators/multimodal.py docstring). The vector is flattened to
    scalar f0..f7 at the query boundary: nested terminals crash the
    driver's pandas canonicalizer (round-4 red row), and the sha-derived
    doubles are exactly reproducible in SQL (_sha_u32_sql) — so this
    gets a full value oracle rather than rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    feats = MM.extract_features(MM.media_from_documents(docs))
    return feats.select(
        "media_id", "media_type", "n_bytes", "content_sha",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(8)])


@query("guarded_process", oracle="""
WITH arb AS (
  SELECT user_id, event_type, ts, event_id, value,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 'SUCCESS' ELSE 'DUPLICATE' END AS verdict
  FROM events)
SELECT user_id, event_type, ts, event_id, value,
       CASE WHEN verdict = 'SUCCESS' AND value < 0
            THEN 'FAILED' ELSE verdict END AS verdict,
       CASE WHEN verdict = 'SUCCESS' AND value >= 0
            THEN user_id || ':' || CAST(round(value * 2, 2) AS VARCHAR)
            END AS result,
       CASE WHEN verdict = 'SUCCESS' AND value < 0
            THEN 'ValueError: negative value' END AS error
FROM arb
""")
def q_guarded_process(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once guarded execution (reference R10/R11): user block
    runs only on winning attempts; block failure → verdict FAILED with
    the error recorded (compensation as data)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value")

    def block(row: dict) -> str:
        import math
        v = row["value"]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            # SQL semantics: a NULL value satisfies neither branch —
            # verdict stays SUCCESS, result/error stay NULL (pandas
            # would otherwise surface NaN and emit "uid:nan")
            return None
        if v < 0:
            raise ValueError("negative value")
        # DuckDB round() is half-AWAY-from-zero; Python round() is
        # half-to-even — align tie handling so an exactly-.xx5 double
        # cannot flip the result string between engines
        scaled = v * 2
        r = math.copysign(math.floor(abs(scaled) * 100 + 0.5),
                          scaled) / 100
        return f"{row['user_id']}:{r}"

    return guarded_process(ev, ["user_id", "event_type"],
                           ["ts", "event_id"], block,
                           result_type=T.StringType())


_QSCALE = 10  # quantization: floor(x * 10) per dimension

@query("embedding_quantize_dedup", oracle=f"""
SELECT vec_id, label, qsig,
       CASE WHEN row_number() OVER (PARTITION BY qsig ORDER BY vec_id) = 1
            THEN 'SUCCESS' ELSE 'DUPLICATE' END AS verdict
FROM (SELECT vec_id, label,
             array_to_string(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(CAST(floor(x * {_QSCALE}) AS BIGINT) AS VARCHAR)),
                 ',') AS qsig
      FROM embeddings)
""")
def q_embedding_quantize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup by quantized-signature equality: integer-
    quantize each dimension (floor(x*10) — exact in IEEE doubles, so
    cross-engine stable), join on the signature — the exact-match fast
    path of embedding dedup (hash-groupBy, map-side combinable; the
    cosine-threshold path is ann_lsh_topk/minhash)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qsig = F.array_join(
        F.transform(F.col("embedding"),
                    lambda x: F.floor(x.cast("double") * _QSCALE)
                               .cast("bigint").cast("string")),
        ",")
    from distributed_deduplicator_spark.operators.dedup import dedup_first_wins
    sig = emb.select("vec_id", "label", qsig.alias("qsig"))
    return dedup_first_wins(sig, keys=["qsig"], order_by=["vec_id"])


@query("multimodal_frame_sample", oracle=f"""
WITH v AS (
  SELECT doc_id AS media_id, encode(text) AS payload
  FROM documents WHERE doc_id % 3 = 2),
idx AS (
  SELECT media_id, payload,
         greatest(octet_length(payload) // 4, 1) AS step,
         unnest(range(4)) AS frame_index
  FROM v)
SELECT media_id, CAST(frame_index AS INTEGER) AS frame_index,
       frame_index * step AS frame_offset_bytes,
       octet_length(payload) - frame_index * step >= 1 AS has_bytes
FROM idx
WHERE frame_index * step < octet_length(payload)
""")
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one payload row fans out to N
    frame rows via mapInPandas (offsets deterministic, codec stubbed —
    operators/multimodal.py). Offsets and fan-out cardinality are
    oracle-checked; frame bytes themselves are opaque."""
    docs = load_table(spark, sf_dir, "documents")
    frames = MM.sample_frames(MM.media_from_documents(docs), n_frames=4)
    return frames.select(
        "media_id", "frame_index", "frame_offset_bytes",
        (F.octet_length("frame_payload") >= 1).alias("has_bytes"))


_RESIZE_W, _RESIZE_H = 64, 64

@query("multimodal_resize", oracle=f"""
SELECT doc_id AS media_id, 'image' AS media_type,
       {_RESIZE_W} AS target_w, {_RESIZE_H} AS target_h,
       CAST({_RESIZE_W * _RESIZE_H} AS BIGINT) AS n_bytes
FROM documents WHERE doc_id % 3 = 0
""")
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing: Arrow-batched binary-in/binary-out
    mapInPandas normalizing every image payload to a fixed
    target shape (codec stubbed with a deterministic sha-derived
    resizer — operators/multimodal.py resize_media). Row identity,
    target dims and output sizing are oracle-checked; resized bytes
    (opaque) are determinism-tested in tests/test_sinks_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents")
    resized = MM.resize_media(MM.media_from_documents(docs),
                              target_w=_RESIZE_W, target_h=_RESIZE_H)
    return resized.select("media_id", "media_type", "target_w",
                          "target_h", "n_bytes")


_FND_NORM = "sqrt(" + " + ".join(f"f{i} * f{i}" for i in range(8)) + ")"
_FND_UNIT = ", ".join(f"f{i} / nrm AS u{i}" for i in range(8))
_FND_DOT = " + ".join(f"a.u{i} * b.u{i}" for i in range(8))
# sign pivot ≈ E[u_i] for uniform-[0,1) features in 8 dims (0.5/√(8/3));
# pivot 0.0 would put every nonneg fake-extractor vector in ONE bucket
# and degrade the bucket join to n² at scale
_FND_PIVOT = 0.31
_FND_SIGNS = " AND ".join(
    f"(a.u{i} >= {_FND_PIVOT}) = (b.u{i} >= {_FND_PIVOT})"
    for i in range(8))

@query("multimodal_feature_neardup", oracle=f"""
WITH m AS (
  SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
  UNION ALL
  SELECT doc_id + 1099511627776, sha256(text) FROM documents WHERE doc_id < 10),
f AS (SELECT media_id, {_F_COLS_SQL} FROM m),
u AS (SELECT media_id, {_FND_UNIT}
      FROM (SELECT media_id, {_FND_NORM} AS nrm,
                   {', '.join(f'f{i}' for i in range(8))} FROM f))
SELECT a.media_id AS id_a, b.media_id AS id_b,
       round({_FND_DOT}, 6) AS cosine_r
FROM u a JOIN u b ON a.media_id < b.media_id AND {_FND_SIGNS}
WHERE {_FND_DOT} >= 0.999
""")
def q_multimodal_feature_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over extracted media features:
    sign-quantization buckets + exact cosine verify (sub-quadratic;
    identical payloads always collide at cosine 1.0). The corpus is
    salted with 10 re-ingested copies (media_id + 2^40, an offset no
    fixture id space reaches — a small fixed salt collided with real
    ids on dense corpora) — the
    re-crawl scenario — whose pairs the operator must surface; asserted
    exactly in tests/test_sinks_multimodal.py. With the sha-derived
    double features the whole pipeline is SQL-expressible, so the
    oracle replays bucket semantics exactly: sign-code equality at the
    _FND_PIVOT pivot (the operator's recall contract, not just the
    threshold) + the same fold-order cosine — upgraded from rows-only
    in round 5."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.media_from_documents(docs)
    clones = (media.where(F.col("media_id") < 10)
                   .withColumn("media_id",
                               F.col("media_id") + F.lit(1 << 40)))
    feats = MM.extract_features(media.unionByName(clones))
    pairs = MM.feature_near_dup(feats, threshold=0.999,
                                sign_pivot=_FND_PIVOT)
    return pairs.select("id_a", "id_b",
                        F.round("cosine", 6).alias("cosine_r"))


_AW_WIN = 256
_AW_HOP = 128


@query("multimodal_audio_windows", oracle=f"""
WITH a AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 1 AND octet_length(encode(text)) > 0),
idx AS (
  SELECT media_id, n,
         unnest(range(greatest((n - {_AW_WIN} + {_AW_HOP} - 1)
                               // {_AW_HOP}, 0) + 1)) AS i
  FROM a)
SELECT media_id, CAST(i AS INTEGER) AS window_index,
       i * {_AW_HOP} AS start_byte,
       least({_AW_WIN}, n - i * {_AW_HOP}) AS window_len
FROM idx
""")
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing plumbing: each audio payload fans out to
    overlapping 256-byte windows at 128-byte hop via mapInPandas
    (operators/multimodal.py window_audio — codec stubbed, offsets
    deterministic). Window offsets, indices, and lengths are
    oracle-checked; window bytes themselves are opaque."""
    d = load_table(spark, sf_dir, "documents")
    media = MM.media_from_documents(d)
    w = MM.window_audio(media, window_bytes=_AW_WIN, hop_bytes=_AW_HOP)
    return w.select("media_id", "window_index", "start_byte",
                    F.length("window_payload").cast("bigint")
                     .alias("window_len"))
