"""Sink round-trips (R5/R6/R7) and multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from distributed_deduplicator_spark.operators import multimodal as MM
from distributed_deduplicator_spark.sources import load_table
from distributed_deduplicator_spark.sources.sinks import (
    write_parquet, write_csv, write_json, read_csv, read_json)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_parquet_roundtrip_partitioned(spark, docs, tmp_path):
    path = str(tmp_path / "docs_parquet")
    write_parquet(docs, path, mode="overwrite", partition_by=["lang"],
                  target_partitions=4)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # partition pruning: one lang directory read only
    one = back.where(F.col("lang") == "en")
    assert one.count() == docs.where(F.col("lang") == "en").count()
    # ...and PROVEN at the plan level: the predicate must land in
    # PartitionFilters (directory pruning — no data files of other
    # langs are even opened), not merely PushedFilters. At 100 TB the
    # difference is reading one partition vs listing-and-filtering all.
    plan = one.sparkSession._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted")
    scan = [ln for ln in plan.splitlines()
            if "PartitionFilters" in ln]
    assert scan and "lang" in scan[0], plan


def test_parquet_append_mode(spark, docs, tmp_path):
    path = str(tmp_path / "docs_append")
    half = docs.where(F.col("doc_id") % 2 == 0)
    other = docs.where(F.col("doc_id") % 2 == 1)
    write_parquet(half, path, mode="append")
    write_parquet(other, path, mode="append")
    assert spark.read.parquet(path).count() == docs.count()


def test_csv_json_roundtrip(spark, docs, tmp_path):
    flat = docs.select("doc_id", "lang", "n_chars")
    cpath, jpath = str(tmp_path / "csv"), str(tmp_path / "json")
    write_csv(flat, cpath)
    write_json(flat, jpath)
    assert read_csv(spark, cpath, schema=flat.schema).count() == flat.count()
    back = read_json(spark, jpath, schema=flat.schema)
    assert back.exceptAll(flat).count() == 0


def test_media_schema_and_determinism(spark, docs):
    media = MM.media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == \
        [f.name for f in MM.MEDIA_SCHEMA.fields]
    assert dict(media.dtypes)["payload"] == "binary"
    # payload bytes round-trip the text exactly
    row = (media.join(docs, media.media_id == docs.doc_id)
                .select("payload", "text").first())
    assert bytes(row.payload).decode("utf-8") == row.text


def test_feature_extraction_batch_shape(spark, docs):
    feats = MM.extract_features(MM.media_from_documents(docs))
    assert feats.schema == MM.FEATURE_SCHEMA
    sample = feats.orderBy("media_id").limit(3).collect()
    for r in sample:
        assert len(r.feature) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feature)
    # deterministic across runs
    again = MM.extract_features(MM.media_from_documents(docs)) \
              .orderBy("media_id").limit(3).collect()
    assert [r.feature for r in sample] == [r.feature for r in again]


def test_resize_media_deterministic_and_sized(spark, docs):
    media = MM.media_from_documents(docs.limit(30))
    r1 = MM.resize_media(media, target_w=8, target_h=4).collect()
    r2 = {r.media_id: bytes(r.payload)
          for r in MM.resize_media(media, target_w=8, target_h=4).collect()}
    assert r1 and all(r.media_type == "image" for r in r1)
    for r in r1:
        payload = bytes(r.payload)
        assert len(payload) == 8 * 4 == r.n_bytes
        assert r2[r.media_id] == payload     # deterministic across runs
    # distinct inputs produce distinct resized payloads (sha-derived)
    assert len({p for p in r2.values()}) == len(r2)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG...")


def test_frame_sample_fanout(spark, sf_dir):
    from distributed_deduplicator_spark.operators import multimodal as MM
    from distributed_deduplicator_spark.sources import load_table
    docs = load_table(spark, sf_dir, "documents")
    media = MM.media_from_documents(docs)
    frames = MM.sample_frames(media, n_frames=4)
    n_videos = media.where("media_type = 'video'").count()
    got = frames.groupBy("media_id").count().collect()
    assert len(got) == n_videos
    assert all(r["count"] <= 4 for r in got)
    # offsets are within the payload and strictly increasing per media
    import pyspark.sql.functions as F
    bad = (frames.groupBy("media_id")
                 .agg(F.min("frame_offset_bytes").alias("mn"),
                      F.count_distinct("frame_offset_bytes").alias("nd"),
                      F.count("*").alias("n"))
                 .where((F.col("mn") != 0) | (F.col("nd") != F.col("n")))
                 .count())
    assert bad == 0


def test_feature_neardup_finds_cloned_payloads(spark, sf_dir):
    from distributed_deduplicator_spark import queries as Q
    pairs = Q.QUERIES["multimodal_feature_neardup"](spark, sf_dir).collect()
    # every clone pairs with its original at cosine ~1.0
    salt = 1 << 40
    clone_pairs = {(r.id_a, r.id_b) for r in pairs if r.id_b >= salt}
    assert {(i, i + salt) for i in range(10)} <= clone_pairs
    assert all(r.cosine_r >= 0.999 for r in pairs)


def test_streaming_guarded_ledger(spark, sf_dir):
    """R10/R11 streaming twin: winners flow through foreachBatch, block
    failures become FAILED ledger rows, stream survives."""
    from distributed_deduplicator_spark import streaming as ST

    winners = ST.stream_dedup_within_watermark(spark, sf_dir, ttl="1 day")

    def block(row):
        if row["value"] is not None and row["value"] < 0:
            raise ValueError("negative value")
        return f"{row['user_id']}:{row['event_type']}"

    ledger = ST.run_guarded_stream_ledger(winners, spark, block)
    rows = ledger.collect()
    assert rows
    # one ledger row per winner; key set matches the streaming dedup
    n_winners = ST.run_stream_to_df(
        ST.stream_dedup_within_watermark(spark, sf_dir, ttl="1 day"),
        spark).count()
    assert len(rows) == n_winners
    by_verdict = {r.verdict for r in rows}
    assert by_verdict <= {"SUCCESS", "FAILED"}
    for r in rows:
        if r.verdict == "FAILED":
            assert r.error and r.result is None and r.value < 0
        else:
            assert r.result == f"{r.user_id}:{r.event_type}"


def test_range_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Files written by write_range_partitioned must cover DISJOINT
    ts ranges — the property that makes every row group's footer
    min/max tight, so range predicates skip row groups (and whole
    files under stats-indexing table formats; plain Spark parquet
    still lists every file, verified: numFiles metric stays at the
    file count while numOutputRows drops to the matching rows)."""
    import pyarrow.parquet as pq
    import glob
    from distributed_deduplicator_spark.sources import load_table
    from distributed_deduplicator_spark.sources.sinks import (
        write_range_partitioned)
    e = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    path = str(tmp_path / "range_parts")
    write_range_partitioned(e, path, ["ts"], n_partitions=8)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(1).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(1).statistics.max
                 for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} > {lo2}"
    # round-trip integrity
    back = spark.read.parquet(path)
    assert back.count() == e.count()


def test_zorder_write_prunes_both_dims(spark, sf_dir, tmp_path):
    """Z-ordered files must allow footer min/max pruning on BOTH
    z-order dimensions simultaneously — the property a single-column
    sort cannot provide (it prunes its sort key perfectly and the
    other dimension not at all). For a 1/8-width range predicate on
    either dimension, the fraction of files whose [min,max] interval
    intersects the predicate must be well below 1; a user_id-sorted
    layout serves as the control: perfect on user_id, ~all files on
    event_id."""
    import glob
    import pyarrow.parquet as pq
    from distributed_deduplicator_spark.sources import load_table
    from distributed_deduplicator_spark.sources.sinks import (
        write_range_partitioned, write_zorder)

    e = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "ts", "value")
    lo_u, hi_u = 0.0, float(
        e.agg({"user_id": "max"}).collect()[0][0]) + 1.0
    lo_e, hi_e = 0.0, float(
        e.agg({"event_id": "max"}).collect()[0][0]) + 1.0

    zpath = str(tmp_path / "zorder")
    write_zorder(e, zpath,
                 {"user_id": (lo_u, hi_u), "event_id": (lo_e, hi_e)},
                 n_partitions=16, bits=10)

    spath = str(tmp_path / "usersorted")
    write_range_partitioned(e, spath, ["user_id"], n_partitions=16)

    def file_stats(path, col):
        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}[col]
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    def hit_fraction(stats, q_lo, q_hi):
        hits = sum(1 for lo, hi in stats if not (hi < q_lo or lo > q_hi))
        return hits / len(stats)

    # 1/8-width probe in the middle of each domain
    qu = (hi_u * 0.5, hi_u * 0.5 + hi_u / 8)
    qe = (hi_e * 0.5, hi_e * 0.5 + hi_e / 8)

    z_u = hit_fraction(file_stats(zpath, "user_id"), *qu)
    z_e = hit_fraction(file_stats(zpath, "event_id"), *qe)
    s_u = hit_fraction(file_stats(spath, "user_id"), *qu)
    s_e = hit_fraction(file_stats(spath, "event_id"), *qe)

    # z-order: BOTH dimensions prune (each file covers a small
    # hyper-rectangle); with 16 files and a 1/8 probe, well under 100%
    assert z_u <= 0.625, f"z-order failed to prune user_id: {z_u}"
    assert z_e <= 0.625, f"z-order failed to prune event_id: {z_e}"
    # control: the single-key sort prunes its key but not the other
    assert s_u <= 0.25, f"range layout should prune its own key: {s_u}"
    assert s_e >= 0.9, \
        f"control broken: single-key sort should NOT prune event_id: {s_e}"
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == e.count()


def test_compact_small_files(spark, sf_dir, tmp_path):
    """A 16-tiny-file layout must compact to the footer-sized output
    count with full row fidelity."""
    from distributed_deduplicator_spark.sources import load_table
    from distributed_deduplicator_spark.sources.sinks import (
        compact_small_files)
    e = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "fragmented")
    e.repartition(16).write.parquet(src)
    import glob
    assert len(glob.glob(f"{src}/part-*.parquet")) == 16
    dest = str(tmp_path / "compacted")
    n = compact_small_files(spark, src, dest,
                            target_bytes=64 * 1024 * 1024)
    out_files = glob.glob(f"{dest}/part-*.parquet")
    assert len(out_files) == n == 1  # tiny fixture packs into one file
    back = spark.read.parquet(dest)
    assert back.count() == e.count()
    # value fidelity, not just counts
    a = sorted(r["event_id"] for r in back.select("event_id").collect())
    b = sorted(r["event_id"] for r in e.select("event_id").collect())
    assert a == b


def test_synthdocs_datasource(spark):
    """Custom Python data source (the engine's 'connector' extension
    point): parallel deterministic generation, schema contract, and
    partition pruning through pushed doc_id range filters."""
    from pyspark.sql import functions as F
    from distributed_deduplicator_spark.sources.synthdocs import (
        SynthDocsReader, _IdRange, register_synthdocs)
    register_synthdocs(spark)
    rd = (spark.read.format("synthdocs")
          .option("n_docs", 400).option("seed", 7)
          .option("n_partitions", 8))
    df = rd.load()
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 400
    # parallel: generation splits into the requested partition count
    assert df.rdd.getNumPartitions() == 8
    # determinism: same options → byte-identical corpus
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, rd.load().collect()))
    assert a == b
    # filtered read returns exactly the range, values identical to the
    # unfiltered corpus slice
    got = sorted(map(tuple,
                     rd.load().where(F.col("doc_id") < 75).collect()))
    assert got == [r for r in a if r[0] < 75]

    # unit-level: pushed range filters prune whole partitions
    r = SynthDocsReader({"n_docs": "400", "n_partitions": "8"})
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan
    remaining = list(r.pushFilters([GreaterThanOrEqual(("doc_id",), 100),
                                    LessThan(("doc_id",), 150)]))
    assert remaining == []  # both fully handled by the source
    parts = r.partitions()
    assert [(p.start, p.end) for p in parts] == [(100, 150)]
    # unsupported filters are returned to Spark by reference
    r2 = SynthDocsReader({"n_docs": "400", "n_partitions": "8"})
    from pyspark.sql.datasource import EqualTo
    lang_f = EqualTo(("lang",), "en")
    assert list(r2.pushFilters([lang_f])) == [lang_f]
    assert len(r2.partitions()) == 8


def test_observed_write_collects_metrics_in_one_pass(spark, sf_dir,
                                                     tmp_path):
    """observe() metrics must arrive with the write action itself —
    row count plus caller aggregates — and match a direct computation."""
    from pyspark.sql import functions as F
    from distributed_deduplicator_spark.sources import load_table
    from distributed_deduplicator_spark.sources.sinks import observed_write
    e = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "observed")
    got = observed_write(
        e, path,
        metrics={"n_null_props": F.count(F.when(F.col("props").isNull(), 1)),
                 "n_users": F.approx_count_distinct("user_id")})
    assert got["n_rows"] == e.count()
    assert got["n_null_props"] == e.where(F.col("props").isNull()).count()
    assert got["n_users"] > 0
    assert spark.read.parquet(path).count() == got["n_rows"]


def test_zorder_value_matches_python_morton(spark):
    """Property: the JVM z-value expression equals a reference Python
    Morton interleave of the same quantized bucket ids."""
    from pyspark.sql import functions as F
    from distributed_deduplicator_spark.sources.sinks import zorder_value
    bits = 6
    n = 2 ** bits
    rows = [(float(x), float(y))
            for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x double, y double")
    bounds = {"x": (0.0, 64.0), "y": (0.0, 64.0)}
    got = {(r["x"], r["y"]): r["z"]
           for r in df.withColumn(
               "z", zorder_value(bounds, bits=bits)).collect()}

    def bucket(v, lo, hi):
        # width_bucket semantics: 1..n for in-range, clamped, minus 1
        b = int((v - lo) / (hi - lo) * n) + 1
        return min(b, n) - 1

    def morton(bx, by):
        z = 0
        for i in range(bits):
            z |= ((bx >> i) & 1) << (2 * i)      # dim 0 at even bits
            z |= ((by >> i) & 1) << (2 * i + 1)  # dim 1 at odd bits
        return z

    for (x, y), z in got.items():
        assert z == morton(bucket(x, 0.0, 64.0), bucket(y, 0.0, 64.0)), \
            (x, y, z)


def test_zorder_value_rejects_overflowing_interleave(spark):
    """ADVICE r4: JVM shiftleft wraps shifts mod 64, so bits*ndim > 63
    would silently fold high interleaved bits onto low ones and destroy
    clustering — must raise instead."""
    from distributed_deduplicator_spark.sources.sinks import zorder_value
    bounds = {f"c{i}": (0.0, 1.0) for i in range(6)}
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_value(bounds, bits=12)   # 72 bit positions
    zorder_value(bounds, bits=10)       # 60 — fine


def test_synthdocs_empty_filter_returns_zero_rows(spark):
    """Filters that prune every id range must yield an empty result,
    not a crash: PySpark substitutes [None] for an empty partition
    list and calls read(None) (regression)."""
    from distributed_deduplicator_spark.sources.synthdocs import (
        register_synthdocs)
    register_synthdocs(spark)
    df = (spark.read.format("synthdocs")
          .option("n_docs", "100").load())
    assert df.filter("doc_id < 0").count() == 0
    assert df.filter("doc_id >= 100").count() == 0
    assert df.filter("doc_id > 90 AND doc_id < 10").count() == 0


def test_zorder_value_clamps_out_of_range_both_sides(spark):
    """Values outside (lo, hi) — stale/approximate stats — must clamp
    into the edge buckets: a below-range value previously produced
    bucket -1 (all-one shifted bits) and z-ordered into the MAX
    corner."""
    from distributed_deduplicator_spark.sources.sinks import zorder_value
    bounds = {"x": (0.0, 100.0), "y": (0.0, 100.0)}
    df = spark.createDataFrame(
        [(-5.0, -5.0), (0.0, 0.0), (105.0, 105.0), (100.0, 100.0)],
        ["x", "y"])
    z = [r.z for r in
         df.select(zorder_value(bounds, bits=8).alias("z")).collect()]
    below, lo_edge, above, hi_edge = z
    assert below == lo_edge            # below-range == lowest bucket
    assert above == hi_edge            # above-range == highest bucket
    assert below < above


def test_create_table_if_not_exists_reregisters_existing_path(
        spark, sf_dir, tmp_path):
    """A second 'session' (catalog entry dropped, data still on disk)
    must re-register the existing parquet location as a no-op instead
    of crashing CTAS on a non-empty path."""
    from distributed_deduplicator_spark.sources.sinks import (
        create_table_if_not_exists)
    d = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "tbl")
    name = "t_ctine_rerun"
    try:
        create_table_if_not_exists(spark, name, d, path)
        n1 = spark.table(name).count()
        spark.sql(f"DROP TABLE {name}")      # catalog wiped, data stays
        create_table_if_not_exists(spark, name, d, path)
        assert spark.table(name).count() == n1
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# --- optional-PIL codec gate (operators/multimodal.py) ---------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payload=st.binary(min_size=0, max_size=256),
       w=st.integers(min_value=1, max_value=64),
       h=st.integers(min_value=1, max_value=64))
def test_sha_resizer_shape_contract(payload, w, h):
    """The stub resizer's output contract — exactly w·h bytes for ANY
    payload (including empty) — is what RESIZED_SCHEMA's n_bytes
    semantics and the PIL twin both rely on."""
    out = MM.sha_resizer(payload, w, h)
    assert isinstance(out, bytes) and len(out) == w * h
    assert out == MM.sha_resizer(payload, w, h)  # deterministic


@pytest.mark.skipif(not MM.pil_available(), reason="PIL not installed")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(w=st.integers(min_value=1, max_value=32),
       h=st.integers(min_value=1, max_value=32),
       px=st.integers(min_value=0, max_value=255))
def test_pil_resizer_shape_matches_stub(w, h, px):
    """Where PIL exists, the codec-backed resizer must satisfy the SAME
    shape contract as the stub (exactly w·h bytes), so either slots
    into resize_media with identical schema and n_bytes."""
    import io

    import PIL.Image
    src = PIL.Image.new("L", (8, 8), color=px)
    buf = io.BytesIO()
    src.save(buf, format="PNG")
    payload = buf.getvalue()
    out = MM.pil_image_resizer(payload, w, h)
    assert len(out) == w * h == len(MM.sha_resizer(payload, w, h))
    feats = MM.pil_feature_extractor(payload)
    assert len(feats) == MM._FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in feats)


@pytest.mark.skipif(MM.pil_available(), reason="PIL installed here")
def test_pil_paths_fail_loud_without_pil():
    """Without PIL the codec paths must raise NotImplementedError (the
    documented capability gate) — never a bare ImportError from deep
    inside an executor stack."""
    with pytest.raises(NotImplementedError):
        MM.pil_image_resizer(b"not-an-image", 4, 4)
    with pytest.raises(NotImplementedError):
        MM.pil_feature_extractor(b"not-an-image")
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"not-an-image")


def test_merge_upsert_rewrite_fallback(spark, sf_dir, tmp_path):
    """merge_upsert must produce source-wins upsert semantics through
    whichever path the catalog supports — on this container's plain
    parquet tables, the staged rewrite (MERGE INTO raises unsupported
    at analysis time and routes to the fallback)."""
    from distributed_deduplicator_spark.sources.sinks import (
        create_table_if_not_exists, merge_upsert)
    name = "t_merge_upsert"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "s", "v"])
    create_table_if_not_exists(spark, name, base, str(tmp_path / "tbl"))
    try:
        src = spark.createDataFrame(
            [(2, "B", 99.0), (4, "d", 40.0)], ["k", "s", "v"])
        route = merge_upsert(spark, name, src, ["k"])
        assert route in ("merge_into", "rewrite")
        got = {r.k: (r.s, r.v) for r in spark.table(name).collect()}
        assert got == {1: ("a", 10.0), 2: ("B", 99.0),
                       3: ("c", 30.0), 4: ("d", 40.0)}
        # idempotent: re-merging the same source changes nothing
        route2 = merge_upsert(spark, name, src, ["k"])
        assert route2 == route
        got2 = {r.k: (r.s, r.v) for r in spark.table(name).collect()}
        assert got2 == got
        # duplicate source keys must raise, like engine-native MERGE
        dup = spark.createDataFrame(
            [(5, "x", 1.0), (5, "y", 2.0)], ["k", "s", "v"])
        with pytest.raises(ValueError, match="duplicate"):
            merge_upsert(spark, name, dup, ["k"])
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


# --- session scratch (scratch.py) -------------------------------------

def test_scratch_materialize_roundtrip_and_sweep(spark, sf_dir):
    """materialize() must execute via a distributed write and return a
    LAZY file-backed reader (no LocalRelation), value-identical to its
    input including zero-row inputs; dead-PID scratch roots must be
    swept on first use."""
    import os
    import shutil
    import tempfile

    from distributed_deduplicator_spark import scratch as SC
    d = load_table(spark, sf_dir, "region")
    back = SC.materialize(d, "t")
    assert "LocalRelation" not in back._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, d.collect()))
    assert back.schema == d.schema
    # zero-row input keeps schema and reads back empty
    empty = SC.materialize(d.where(F.lit(False)), "empty")
    assert empty.count() == 0 and empty.schema == d.schema
    # a root left by a dead PID is swept on next scratch_root() use
    dead = os.path.join(tempfile.gettempdir(),
                        f"{SC._PREFIX}999999999_deadbeef")
    os.makedirs(dead, exist_ok=True)
    try:
        SC._sweep_dead_roots(tempfile.gettempdir())
        assert not os.path.isdir(dead)
        # our own live root is never swept
        assert os.path.isdir(SC.scratch_root())
    finally:
        shutil.rmtree(dead, ignore_errors=True)


def test_merge_upsert_partitioned_table_fallback(spark, tmp_path):
    """A PARTITIONED plain-format table cannot take the atomic
    location-swap (partition metadata lives per-directory), so the
    rewrite must route through the scratch-staged insertInto overwrite
    and still produce source-wins end state across partitions."""
    from distributed_deduplicator_spark.sources.sinks import merge_upsert
    name = "t_merge_part"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    base = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "x"), (3, 30.0, "y")],
        ["k", "v", "p"])
    (base.write.mode("errorifexists")
         .option("path", str(tmp_path / "tp"))
         .partitionBy("p").saveAsTable(name))
    try:
        src = spark.createDataFrame(
            [(2, 99.0, "y"), (4, 40.0, "z")], ["k", "v", "p"])
        route = merge_upsert(spark, name, src, ["k"])
        assert route == "rewrite"
        got = {r.k: (r.v, r.p) for r in spark.table(name).collect()}
        assert got == {1: (10.0, "x"), 2: (99.0, "y"),
                       3: (30.0, "y"), 4: (40.0, "z")}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_merge_upsert_swap_leaves_no_partial_state(spark, tmp_path):
    """The unpartitioned rewrite must swap the table DIRECTORY in
    place: the registered location never changes (path-based
    re-registration across sessions keeps working), no suffixed
    staging/old directories survive, and a merge that fails BEFORE
    the swap (duplicate-source guard) leaves the target
    byte-identical."""
    import os

    from distributed_deduplicator_spark.sources.sinks import (
        create_table_if_not_exists, merge_upsert)
    name = "t_merge_swap"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    create_table_if_not_exists(spark, name, base, str(tmp_path / "ts"))

    def location():
        return next((r.data_type or "").strip() for r in
                    spark.sql(f"DESCRIBE FORMATTED {name}").collect()
                    if (r.col_name or "").strip().lower() == "location")

    try:
        loc0 = location()
        before = {r.k: r.v for r in spark.table(name).collect()}
        dup = spark.createDataFrame([(9, "x"), (9, "y")], ["k", "v"])
        import pytest as _pt
        with _pt.raises(ValueError, match="duplicate"):
            merge_upsert(spark, name, dup, ["k"])
        assert {r.k: r.v for r in spark.table(name).collect()} == before
        for src in ([(2, "B")], [(3, "c")], [(3, "C"), (4, "d")]):
            merge_upsert(spark, name,
                         spark.createDataFrame(src, ["k", "v"]), ["k"])
        assert location() == loc0  # path stable across repeated merges
        assert {r.k: r.v for r in spark.table(name).collect()} == \
            {1: "a", 2: "B", 3: "C", 4: "d"}
        # no staging/old residue beside the table directory
        residue = [e for e in os.listdir(tmp_path)
                   if ".staging-" in e or ".old-" in e]
        assert residue == []
        # the merged state survives a catalog drop + path
        # re-registration (the cross-session scenario
        # create_table_if_not_exists exists for)
        spark.sql(f"DROP TABLE {name}")
        create_table_if_not_exists(spark, name, base, str(tmp_path / "ts"))
        assert {r.k: r.v for r in spark.table(name).collect()} == \
            {1: "a", 2: "B", 3: "C", 4: "d"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_merge_upsert_null_keys_match_merge_semantics(spark, tmp_path):
    """NULL-key rows must merge like the MERGE path's null-safe `<=>`
    condition: a source NULL-key row REPLACES the target's NULL-key
    row (one row out), never coexists with it."""
    from pyspark.sql import types as T

    from distributed_deduplicator_spark.sources.sinks import (
        create_table_if_not_exists, merge_upsert)
    name = "t_merge_nullkey"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    base = spark.createDataFrame([(1, "a"), (None, "old")], schema)
    create_table_if_not_exists(spark, name, base, str(tmp_path / "t"))
    try:
        src = spark.createDataFrame([(None, "new"), (2, "b")], schema)
        merge_upsert(spark, name, src, ["k"])
        got = {r.k: r.v for r in spark.table(name).collect()}
        assert got == {1: "a", None: "new", 2: "b"}
        assert spark.table(name).count() == 3  # NOT 4: null replaced
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_merge_upsert_native_merge_into_on_delta(tmp_path):
    """The MERGE INTO branch of merge_upsert (sources/sinks.py) is dead
    code on this container (no Delta/Iceberg) — this test gives it an
    engine wherever delta-spark IS installed, so the native branch
    carries end-to-end evidence off this box instead of forever hiding
    behind the rewrite fallback.

    Runs in a SUBPROCESS because Delta needs its SQL extension + catalog
    configured at SparkSession BUILD time — the suite's shared session
    can't gain them post-hoc, and a second differently-configured
    session in one JVM is not supported. The child builds a
    delta-configured local session, creates a Delta table, calls
    merge_upsert, and asserts route == "merge_into" plus the same
    source-wins end state the fallback tests pin."""
    import importlib.util
    import os
    import subprocess
    import sys

    if importlib.util.find_spec("delta") is None:
        pytest.skip("delta-spark not installed — merge_upsert's native "
                    "MERGE INTO branch has no row-level engine here; "
                    "the rewrite fallback is the tested path "
                    "(sources/sinks.py merge_upsert)")

    script = f"""
import os
from delta import configure_spark_with_delta_pip
from pyspark.sql import SparkSession
builder = (SparkSession.builder.master("local[2]")
    .appName("delta-merge-probe")
    .config("spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension")
    .config("spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", {str(tmp_path / "wh")!r}))
spark = configure_spark_with_delta_pip(builder).getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
base = spark.createDataFrame(
    [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"])
base.write.format("delta").mode("errorifexists") \\
    .option("path", {str(tmp_path / "tbl")!r}) \\
    .saveAsTable("t_delta_merge")
from distributed_deduplicator_spark.sources.sinks import merge_upsert
src = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)],
                            ["k", "s", "v"])
route = merge_upsert(spark, "t_delta_merge", src, ["k"])
assert route == "merge_into", f"expected native branch, got {{route}}"
got = {{r.k: (r.s, r.v) for r in spark.table("t_delta_merge").collect()}}
assert got == {{1: ("a", 10.0), 2: ("B", 99.0),
                3: ("c", 30.0), 4: ("d", 40.0)}}, got
# idempotent re-merge through the SAME native route
assert merge_upsert(spark, "t_delta_merge", src, ["k"]) == "merge_into"
assert {{r.k: (r.s, r.v)
        for r in spark.table("t_delta_merge").collect()}} == got
print("DELTA_MERGE_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600, cwd=os.path.dirname(os.path.dirname(__file__)))
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DELTA_MERGE_OK" in proc.stdout
