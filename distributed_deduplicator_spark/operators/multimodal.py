"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as `binary`
columns with typed metadata, processed by Arrow-batched Python (the
only sane place for codec work in Spark). This module makes the
*plumbing* real — schemas, batch shapes, partitioning, UDF signatures,
deterministic fake feature extraction — while the actual codec calls
(PIL/ffmpeg/torchaudio are not in this container) are stubbed behind
import-tries and a clearly-marked NotImplementedError.

Reference tie-in: payloads are treated exactly like the reference's
opaque user `block` (R10, DeduplicationProvider.kt:96) — the engine
moves/arbitrates them without interpreting them; interpretation is a
pluggable per-row function at the edge.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_deduplicator_spark.sources.fixtures import fanout

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), False),       # opaque bytes
    T.StructField("meta", T.StructType([                   # typed metadata
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]), False),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("content_sha", T.StringType(), False),
    # double, not float32: the fake extractor emits u32/2^32 — exact in
    # IEEE double on any engine, so the feature values themselves are
    # oracle-checkable; a float32 element type would round them to
    # values DuckDB cannot reproduce
    T.StructField("feature", T.ArrayType(T.DoubleType()), False),
])

_FEATURE_DIM = 8


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    payload = utf-8 bytes of the text (a stand-in corpus of opaque
    blobs with realistic size skew), media_type assigned round-robin.
    """
    mt = F.element_at(F.lit(["image", "audio", "video"]),
                      (F.col("doc_id") % 3 + 1).cast("int"))
    payload = F.encode(F.col("text"), "utf-8")
    # fan the (single-split) fixture scan out so every downstream
    # Arrow/mapInPandas stage runs at cluster parallelism — at real
    # scale the scan already has >= cluster-width splits and this is
    # a no-op (sources.fixtures.fanout)
    return fanout(docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        payload.alias("payload"),
        F.struct(F.col("source").alias("source"),
                 F.col("lang").alias("lang"),
                 F.octet_length(payload).cast("long").alias("n_bytes"))
         .alias("meta")))


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec+model feature extractor:
    8 floats derived from the sha256 digest. Stable across runs and
    engines — lets the full Spark plumbing be exercised and tested
    without image/audio libs."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[i * 4:(i + 1) * 4], "big") / 2**32
            for i in range(_FEATURE_DIM)]


def pil_available() -> bool:
    """True when the optional PIL codec dependency is importable."""
    try:
        import PIL.Image  # type: ignore  # noqa: F401
        return True
    except ImportError:
        return False


def decode_image(payload: bytes) -> "object":
    """Real image decode behind the optional-PIL gate: returns a
    ``PIL.Image`` when PIL is importable, raises NotImplementedError
    otherwise. The mapInPandas plumbing in extract_features is real
    and tested either way — only the codec itself is optional."""
    try:
        import PIL.Image  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL; not available in this "
            "environment — use the deterministic fake extractor") from exc
    import io
    return PIL.Image.open(io.BytesIO(payload))


def pil_image_resizer(payload: bytes, w: int, h: int) -> bytes:
    """Codec-backed resizer (optional-PIL path): decode → grayscale →
    resize to (w, h) → raw pixel bytes. SAME output contract as the
    deterministic stub (`sha_resizer`): exactly w·h bytes per payload
    — so either function slots into :func:`resize_media` unchanged
    and RESIZED_SCHEMA/n_bytes semantics are identical on both paths
    (shape-compatibility is property-tested in
    tests/test_sinks_multimodal.py, with the PIL case skipped where
    PIL is absent)."""
    img = decode_image(payload)
    return img.convert("L").resize((w, h)).tobytes()


def pil_feature_extractor(payload: bytes) -> list[float]:
    """Codec-backed feature extractor (optional-PIL path): decode →
    grayscale → resize to a 1×_FEATURE_DIM strip → [0,1] floats. Same
    output contract as `_fake_decode_features` (_FEATURE_DIM floats in
    [0,1]), so it slots into :func:`extract_features` unchanged."""
    img = decode_image(payload)
    px = img.convert("L").resize((_FEATURE_DIM, 1)).tobytes()
    return [b / 255.0 for b in px]


def sha_resizer(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stub resizer: exactly w·h bytes re-derived from
    the payload's sha256 — stable across runs/engines; the default
    when PIL is absent (the fixtures' payloads are utf-8 text, not
    decodable images, so oracle-checked queries ALWAYS use this path;
    pass :func:`pil_image_resizer` explicitly for real image bytes)."""
    n = w * h
    seed = hashlib.sha256(payload).digest()
    reps = (n + len(seed) - 1) // len(seed)
    return (seed * reps)[:n]


def extract_features(media: DataFrame,
                     extractor: Callable[[bytes], list[float]] | None = None,
                     batch_note: str = "arrow") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame with a
    `payload` bytes column; the extractor runs per row *inside the
    batch loop* (vectorize further in a real model-serving extractor).
    Partitioning is inherited from the source — at 100 TB repartition
    upstream so batches are ~100-500 rows of multi-MB payloads.
    """
    fn = extractor or _fake_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "content_sha": [hashlib.sha256(p).hexdigest()
                                for p in pdf["payload"]],
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no Python): payload size profile
    per media_type — the cheap pre-pass that decides decode batching."""
    return (media.groupBy("media_type")
            .agg(F.count("*").alias("n_items"),
                 F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
                 F.min(F.col("meta.n_bytes")).alias("min_bytes"),
                 F.max(F.col("meta.n_bytes")).alias("max_bytes")))


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("target_w", T.IntegerType(), False),
    T.StructField("target_h", T.IntegerType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("n_bytes", T.LongType(), False),
])


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64,
                 resizer: Callable[[bytes, int, int], bytes] | None = None
                 ) -> DataFrame:
    """Batch resize of image payloads — the normalize-before-train pass
    (every vision pipeline resizes to a fixed input shape first).

    Real resizing needs PIL — wired and ready behind the optional-PIL
    gate as :func:`pil_image_resizer` (same w·h-bytes output contract;
    pass it as ``resizer`` where payloads are real image bytes and PIL
    exists). The default :func:`sha_resizer` deterministically
    re-derives exactly ``target_w·target_h`` bytes from the payload's
    sha256 (stable across runs/engines), which keeps the Spark side —
    Arrow batch transfer in AND out of Python with binary columns both
    ways, the 1:1 row contract, output sizing — fully real and
    testable on fixtures whose payloads are not decodable images.
    """
    if target_w <= 0 or target_h <= 0:
        raise ValueError("target_w and target_h must be positive "
                         "(non-positive dims would silently emit "
                         "zero-byte payloads)")
    fn = resizer or sha_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [fn(p, target_w, target_h) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "target_w": [target_w] * len(pdf),
                "target_h": [target_h] * len(pdf),
                "payload": resized,
                "n_bytes": [len(p) for p in resized],
            })

    images = media.where(F.col("media_type") == "image")
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_index", T.IntegerType(), False),
    T.StructField("frame_offset_bytes", T.LongType(), False),
    T.StructField("frame_payload", T.BinaryType(), False),
])


def sample_frames(media: DataFrame, n_frames: int = 4,
                  sampler: "Callable[[bytes, int], list[tuple[int, bytes]]] | None" = None
                  ) -> DataFrame:
    """Deterministic frame sampling for video payloads — the
    one-row-in, N-rows-out batch shape of every video pipeline.

    Real frame extraction needs ffmpeg (absent here); the default
    sampler slices the payload at n evenly-spaced offsets, which keeps
    the Spark side — explode fan-out, Arrow batch shapes, downstream
    per-frame feature joins — fully real and testable. Swap ``sampler``
    for a codec-backed one in production: it returns
    ``[(offset_bytes, frame_bytes), ...]`` so the emitted
    ``frame_offset_bytes`` is ALWAYS the sampler's own position — a
    keyframe sampler's offsets ride through instead of being
    recomputed from the default's stride formula.
    """
    def default_sampler(payload: bytes,
                        n: int) -> "list[tuple[int, bytes]]":
        if not payload:
            return []
        step = max(len(payload) // n, 1)
        return [(i * step, payload[i * step:(i + 1) * step])
                for i in range(n) if i * step < len(payload)]

    fn = sampler or default_sampler

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [],
                   "frame_offset_bytes": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, (off, fr) in enumerate(fn(payload, n_frames)):
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame_offset_bytes"].append(off)
                    out["frame_payload"].append(fr)
            yield pd.DataFrame(out)

    videos = media.where(F.col("media_type") == "video")
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("window_index", T.IntegerType(), False),
    T.StructField("start_byte", T.LongType(), False),
    T.StructField("window_payload", T.BinaryType(), False),
])


def window_audio(media: DataFrame, window_bytes: int = 256,
                 hop_bytes: int = 128) -> DataFrame:
    """Overlapping-window framing of audio payloads — the 1-D analog
    of :func:`sample_frames` and the batch shape feeding any
    spectrogram/feature front end (window + hop, windows overlap when
    hop < window).

    Real PCM decode needs an audio codec (absent here); windows slice
    the raw byte stream, which keeps the Spark side — the 1→N Arrow
    fan-out, deterministic offsets, per-window downstream joins —
    fully real and testable. A decoded pipeline swaps byte offsets for
    sample offsets, nothing else changes.

    Fan-out contract: a payload of L > 0 bytes yields
    ``1 + max(ceil((L - window) / hop), 0)`` windows (every byte is
    covered; the last window may be short); L == 0 yields none.
    """
    if window_bytes <= 0 or hop_bytes <= 0:
        raise ValueError("window_bytes and hop_bytes must be positive")
    if hop_bytes > window_bytes:
        raise ValueError(
            f"hop_bytes ({hop_bytes}) > window_bytes ({window_bytes}) "
            "leaves inter-window gaps, breaking the every-byte-covered "
            "fan-out contract; use hop_bytes <= window_bytes")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "window_index": [],
                   "start_byte": [], "window_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not payload:
                    continue
                n = len(payload)
                i = 0
                while True:
                    start = i * hop_bytes
                    out["media_id"].append(mid)
                    out["window_index"].append(i)
                    out["start_byte"].append(start)
                    out["window_payload"].append(
                        payload[start:start + window_bytes])
                    if start + window_bytes >= n:
                        break
                    i += 1
            yield pd.DataFrame(out)

    audio = media.where(F.col("media_type") == "audio")
    return audio.mapInPandas(run, schema=AUDIO_WINDOW_SCHEMA)


def feature_near_dup(features: DataFrame, threshold: float = 0.999,
                     id_col: str = "media_id",
                     vec_col: str = "feature",
                     sign_pivot: float = 0.0,
                     dim: int = _FEATURE_DIM) -> DataFrame:
    """Embedding-cosine near-dup over extracted features, sub-quadratic:
    bucket by the sign-quantization code of the unit vector (near-dup
    pairs at cosine ≥ ~0.999 share every sign bit unless a component
    sits at ≈``sign_pivot`` — the standard recall caveat of sign LSH),
    self-join per bucket, verify with the exact cosine. Exact payload
    dups (identical feature vectors) always collide. Work is
    Σ|bucket|², not n².

    ``sign_pivot`` is the per-component threshold the "sign" compares
    against. 0.0 is right for zero-centered model embeddings; for
    extractors with one-sided output (the sha-derived fake emits
    [0,1) — EVERY vector would share the all-ones code and the bucket
    join degenerates to n²) pass a pivot near the component median so
    the code actually partitions the corpus."""
    from distributed_deduplicator_spark.operators import similarity as S
    # dim must match the feature width: too small silently weakens the
    # bucket partitioning (only the first `dim` signs code); too large
    # hits ANSI INVALID_ARRAY_INDEX at runtime — pass it explicitly
    # for non-default extractors
    u = S.unit_vectors(features, id_col=id_col, vec_col=vec_col)
    code = None
    for i in range(dim):
        bit = F.when(F.col("unit")[i] >= sign_pivot,
                     F.lit(1).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        code = term if code is None else code.bitwiseXOR(term)
    ub = u.select("id", "unit", code.alias("bucket"))
    a = ub.select(F.col("id").alias("id_a"), F.col("unit").alias("qu"),
                  F.col("bucket").alias("ba"))
    b = ub.select(F.col("id").alias("id_b"), F.col("unit").alias("nu"),
                  F.col("bucket").alias("bb"))
    return (a.join(b, (F.col("ba") == F.col("bb"))
                     & (F.col("id_a") < F.col("id_b")))
             .select("id_a", "id_b",
                     S._dot_indexed("qu", "nu", dim).alias("cosine"))
             .where(F.col("cosine") >= threshold))
