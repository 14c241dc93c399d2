"""Semantic gates for the round-5 corpus-analysis additions, each
checked against an independent pure-Python reference (the oracle
harness already value-checks them against DuckDB; these tests pin the
SEMANTICS — what the numbers mean — not just cross-engine agreement).
"""

from __future__ import annotations

import collections
import math
import re

from pyspark.sql import functions as F

from distributed_deduplicator_spark import queries as Q
from distributed_deduplicator_spark.operators.similarity import (
    release_persisted)
from distributed_deduplicator_spark.sources import load_table


def _py_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower()))
    return t.strip().split(" ")


def test_bpe_pair_counts_match_python_reference(spark, sf_dir):
    """pair_count must equal the classic BPE statistic: per distinct
    word, every adjacent char-pair occurrence, weighted by the word's
    corpus frequency; n_words = distinct words containing the pair."""
    rows = load_table(spark, sf_dir, "documents") \
        .select("text").collect()
    freq: collections.Counter = collections.Counter()
    for r in rows:
        freq.update(_py_tokens(r.text))
    pair_count: collections.Counter = collections.Counter()
    pair_words: dict = collections.defaultdict(set)
    for word, f in freq.items():
        for a, b in zip(word, word[1:]):
            pair_count[(a, b)] += f
            pair_words[(a, b)].add(word)
    got = Q.QUERIES["bpe_pair_counts"](spark, sf_dir).collect()
    release_persisted()
    assert len(got) == 50
    expected_order = sorted(
        pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r.lft, r.rgt) for r in got] == \
        [k for k, _ in expected_order]
    for r in got:
        assert r.pair_count == pair_count[(r.lft, r.rgt)]
        assert r.n_words == len(pair_words[(r.lft, r.rgt)])


def test_soft_dedup_weights_invariants(spark, sf_dir):
    """Every doc weighted; Σ weight = number of clusters (the
    deduplicated corpus size); weight·cluster_size = 1 exactly; the
    weight-1 docs with cluster_id = doc_id are exactly the keep-one
    keepers."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    out = Q.QUERIES["soft_dedup_weights"](spark, sf_dir).collect()
    release_persisted()
    assert len(out) == n_docs
    clusters = {r.cluster_id for r in out}
    total_w = sum(r.weight for r in out)
    assert math.isclose(total_w, len(clusters), rel_tol=0, abs_tol=1e-9)
    for r in out:
        assert r.weight == 1.0 / r.cluster_size
    keep = Q.QUERIES["jaccard_keep_one"](spark, sf_dir) \
        .where(F.col("keep")).select("doc_id").collect()
    release_persisted()
    assert {r.doc_id for r in keep} == clusters


def test_value_drift_matches_full_grid_reference(spark, sf_dir):
    """The grid-free TV formula (only buckets present in the day, plus
    the 1 − Σ p_glob remainder) must equal the textbook full-grid
    0.5·Σ_b |p_day − p_glob| over ALL buckets, and land in [0, 1]."""
    ev = load_table(spark, sf_dir, "events") \
        .select(F.to_date("ts").alias("day"), "value").collect()
    day_hist: dict = collections.defaultdict(collections.Counter)
    glob_hist: collections.Counter = collections.Counter()
    for r in ev:
        b = math.floor(r.value / 20.0)
        day_hist[r.day][b] += 1
        glob_hist[b] += 1
    n_total = sum(glob_hist.values())
    got = Q.QUERIES["value_drift_by_day"](spark, sf_dir).collect()
    release_persisted()
    assert len(got) == len(day_hist)
    for r in got:
        h = day_hist[r.day]
        n_day = sum(h.values())
        tv = 0.5 * sum(
            abs(h.get(b, 0) / n_day - glob_hist[b] / n_total)
            for b in glob_hist)
        assert r.n_day == n_day
        assert r.n_buckets == len(h)
        assert 0.0 <= r.tv_drift <= 1.0
        assert math.isclose(r.tv_drift, tv, rel_tol=0, abs_tol=1e-9), \
            (r.day, r.tv_drift, tv)
