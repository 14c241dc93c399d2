"""Semantic gates for the round-5 corpus-analysis additions, each
checked against an independent pure-Python reference (the oracle
harness already value-checks them against DuckDB; these tests pin the
SEMANTICS — what the numbers mean — not just cross-engine agreement).
"""

from __future__ import annotations

import collections
import math
import re

import pytest
from pyspark.sql import functions as F

from distributed_deduplicator_spark import queries as Q
from distributed_deduplicator_spark.operators.similarity import (
    release_persisted)
from distributed_deduplicator_spark.sources import load_table


def _py_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower()))
    return t.strip().split(" ")


@pytest.mark.full  # python-reference twin; bpe_pair_counts has a
# full driver value oracle (r06 green)
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


@pytest.mark.full  # invariant sweep; soft_dedup_weights also has a
# full recursive-CTE value oracle in the driver rows
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


def test_dsir_importance_weights_match_python_reference(spark, sf_dir):
    """tgt/raw masses must equal the hashed-feature definition: bucket
    = first 2 md5 hex chars of the token, mass = Σ over the doc's
    tokens of (bucket count in the target/raw corpus + 1); the weight
    is the ratio of mean smoothed probabilities."""
    import hashlib
    rows = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "text").collect()
    bucket = lambda w: hashlib.md5(w.encode()).hexdigest()[:2]
    raw_c: collections.Counter = collections.Counter()
    tgt_c: collections.Counter = collections.Counter()
    doc_toks = {}
    for r in rows:
        toks = _py_tokens(r.text)
        if len(toks) == 0:
            continue
        doc_toks[r.doc_id] = toks
        for w in toks:
            b = bucket(w)
            raw_c[b] += 1
            if r.lang == "en":
                tgt_c[b] += 1
    n_raw, n_tgt = sum(raw_c.values()), sum(tgt_c.values())
    got = Q.QUERIES["dsir_importance_weights"](spark, sf_dir).collect()
    release_persisted()
    assert len(got) == len(doc_toks)
    for r in got:
        toks = doc_toks[r.doc_id]
        tgt_mass = sum(tgt_c[bucket(w)] + 1 for w in toks)
        raw_mass = sum(raw_c[bucket(w)] + 1 for w in toks)
        assert r.n_toks == len(toks)
        assert r.tgt_mass == tgt_mass
        assert r.raw_mass == raw_mass
        want = (tgt_mass * (n_raw + 256.0)) / (raw_mass * (n_tgt + 256.0))
        assert math.isclose(r.dsir_weight, want, rel_tol=1e-12)


def test_dsir_weights_rank_target_language_higher(spark, sf_dir):
    """The point of DSIR: target-language docs should carry higher
    median importance weight than out-of-target docs."""
    got = Q.QUERIES["dsir_importance_weights"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = got.join(docs, "doc_id") \
        .select("lang", "dsir_weight").collect()
    release_persisted()
    en = sorted(r.dsir_weight for r in joined if r.lang == "en")
    other = sorted(r.dsir_weight for r in joined if r.lang != "en")
    assert en and other
    med = lambda xs: xs[len(xs) // 2]
    assert med(en) >= med(other)


def test_blocklist_scrub_stats_match_python_reference(spark, sf_dir):
    """Blocked counts, kept character mass, and the 5% keep gate must
    equal the per-token definition over normalized tokens."""
    blocklist = {"slow", "dup", "the", "stale"}
    rows = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    got = {r.doc_id: r for r in
           Q.QUERIES["blocklist_scrub_stats"](spark, sf_dir).collect()}
    release_persisted()
    assert len(got) == len(rows)
    for r in rows:
        toks = _py_tokens(r.text)
        g = got[r.doc_id]
        n_blocked = sum(1 for w in toks if w in blocklist)
        assert g.n_toks == len(toks)
        assert g.n_blocked == n_blocked
        assert g.kept_chars == sum(
            len(w) for w in toks if w not in blocklist)
        assert g.keep == (n_blocked * 100 <= len(toks) * 5)
        assert math.isclose(g.blocked_frac, n_blocked / len(toks),
                            rel_tol=0, abs_tol=1e-12)


def test_bigram_lm_quality_match_python_reference(spark, sf_dir):
    """num/den masses must equal the add-one-smoothed bigram LM
    definition: num = Σ (c12+1), den = Σ (c1+V) over the doc's bigram
    stream, with corpus-global counts and V = |distinct right vocab|."""
    rows = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    c12: collections.Counter = collections.Counter()
    c1: collections.Counter = collections.Counter()
    vocab2 = set()
    doc_bi = {}
    for r in rows:
        toks = _py_tokens(r.text)
        if len(toks) < 2:
            continue
        bi = list(zip(toks, toks[1:]))
        doc_bi[r.doc_id] = bi
        for w1, w2 in bi:
            c12[(w1, w2)] += 1
            c1[w1] += 1
            vocab2.add(w2)
    V = len(vocab2)
    got = Q.QUERIES["bigram_lm_quality"](spark, sf_dir).collect()
    release_persisted()
    assert len(got) == len(doc_bi)
    for r in got:
        bi = doc_bi[r.doc_id]
        num = sum(c12[p] + 1 for p in bi)
        den = sum(c1[p[0]] + V for p in bi)
        assert r.n_bigrams == len(bi)
        assert r.num_mass == num
        assert r.den_mass == den
        assert math.isclose(r.bigram_score, num / den, rel_tol=1e-12)


def test_dup_span_stats_match_python_reference(spark, sf_dir):
    """Span statistics must equal the ExactSubstr definition: a
    position is duplicated iff its 5-gram occurs at >= 2 (doc, pos)
    sites corpus-wide; spans are maximal runs of consecutive
    duplicated positions; a run of L grams covers L + 4 tokens."""
    K = 5
    rows = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").collect()
    occ: collections.Counter = collections.Counter()
    doc_grams = {}
    for r in rows:
        toks = _py_tokens(r.text)
        if len(toks) < K:
            continue
        grams = [" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)]
        doc_grams[r.doc_id] = grams
        occ.update(grams)
    got = {r.doc_id: r for r in
           Q.QUERIES["dup_span_stats"](spark, sf_dir).collect()}
    release_persisted()
    assert set(got) == set(doc_grams)
    for doc_id, grams in doc_grams.items():
        dup = [i for i, g in enumerate(grams) if occ[g] >= 2]
        runs = []
        for i in dup:
            if runs and i == runs[-1][1] + 1:
                runs[-1][1] = i
            else:
                runs.append([i, i])
        g = got[doc_id]
        assert g.n_positions == len(grams)
        assert g.n_dup_positions == len(dup)
        assert g.n_dup_spans == len(runs)
        want_max = max((b - a + 1 for a, b in runs), default=0)
        assert g.max_dup_span_tokens == \
            (want_max + K - 1 if want_max else 0)
        assert math.isclose(g.dup_cover_frac, len(dup) / len(grams),
                            rel_tol=0, abs_tol=1e-12)
    assert any(r.n_dup_spans > 0 for r in got.values())


def test_source_token_drift_matches_full_grid_reference(spark, sf_dir):
    """The grid-free per-source TV (buckets present in the source plus
    the 1 − Σ p_glob remainder) must equal the textbook full-grid
    0.5·Σ_b |p_src − p_glob| over ALL 256-space buckets, and land in
    [0, 1]."""
    import hashlib
    rows = load_table(spark, sf_dir, "documents") \
        .select("source", "text").collect()
    bucket = lambda w: hashlib.md5(w.encode()).hexdigest()[:2]
    src_hist: dict = collections.defaultdict(collections.Counter)
    glob_hist: collections.Counter = collections.Counter()
    for r in rows:
        # engine semantics: split of a fully-normalized-away text is
        # [''], size 1 > 0 — the empty token counts in BOTH engines,
        # so the reference counts it too (same as _py_tokens)
        for w in _py_tokens(r.text):
            b = bucket(w)
            src_hist[r.source][b] += 1
            glob_hist[b] += 1
    n_total = sum(glob_hist.values())
    got = Q.QUERIES["source_token_drift"](spark, sf_dir).collect()
    release_persisted()
    assert len(got) == len(src_hist)
    for r in got:
        h = src_hist[r.source]
        n_src = sum(h.values())
        tv = 0.5 * sum(
            abs(h.get(b, 0) / n_src - glob_hist[b] / n_total)
            for b in glob_hist)
        assert r.n_src == n_src
        assert r.n_buckets == len(h)
        assert 0.0 <= r.tv_drift <= 1.0
        assert math.isclose(r.tv_drift, tv, rel_tol=0, abs_tol=1e-9), \
            (r.source, r.tv_drift, tv)


def test_lang_confusion_matrix_consistency(spark, sf_dir):
    """Cells must aggregate the per-doc predictor exactly: cell counts
    equal the Python rollup of text_lang_id's rows, row margins equal
    the labeled-lang totals, shares sum to 1 per labeled lang, and the
    whole matrix sums to the corpus size."""
    per_doc = Q.QUERIES["text_lang_id"](spark, sf_dir) \
        .select("labeled_lang", "pred_lang").collect()
    release_persisted()
    ref: collections.Counter = collections.Counter(
        (r.labeled_lang, r.pred_lang) for r in per_doc)
    got = Q.QUERIES["lang_confusion_matrix"](spark, sf_dir).collect()
    release_persisted()
    assert {(r.labeled_lang, r.pred_lang): r.n_docs for r in got} == dict(ref)
    assert sum(r.n_docs for r in got) == len(per_doc)
    by_label: dict = collections.defaultdict(list)
    for r in got:
        by_label[r.labeled_lang].append(r)
    for lbl, rows in by_label.items():
        n_labeled = rows[0].n_labeled
        assert all(r.n_labeled == n_labeled for r in rows)
        assert sum(r.n_docs for r in rows) == n_labeled
        assert math.isclose(sum(r.share for r in rows), 1.0,
                            rel_tol=0, abs_tol=1e-9)


def test_vocab_coverage_matches_python_reference(spark, sf_dir):
    """Coverage at cut K must equal the Python head-mass of the bigram
    frequency table (rank by freq desc, token asc), be monotone
    non-decreasing in K, and sit in (0, 1]."""
    rows = load_table(spark, sf_dir, "documents").select("text").collect()
    freq: collections.Counter = collections.Counter()
    for r in rows:
        t = _py_tokens(r.text)
        freq.update(f"{a} {b}" for a, b in zip(t, t[1:]))
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    got = sorted(Q.QUERIES["vocab_coverage_topk"](spark, sf_dir).collect(),
                 key=lambda r: r.k)
    release_persisted()
    assert [r.k for r in got] == [16, 64, 256, 1024, 4096]
    prev = 0.0
    for r in got:
        expect = sum(f for _, f in ordered[:r.k])
        assert r.cum_freq == expect
        assert r.total_freq == total and r.n_vocab == len(freq)
        assert math.isclose(r.coverage, expect / total,
                            rel_tol=0, abs_tol=1e-12)
        assert prev <= r.coverage <= 1.0
        prev = r.coverage


def test_curriculum_bins_partition_the_corpus(spark, sf_dir):
    """The 10 phases must partition the corpus into equal-population
    cuts (sizes differ by at most 1), cover every document and token
    once, and carry non-overlapping, ascending quality bands."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    got = sorted(Q.QUERIES["curriculum_quality_bins"](spark, sf_dir)
                 .collect(), key=lambda r: r.phase)
    release_persisted()
    assert [r.phase for r in got] == list(range(10))
    assert sum(r.n_docs for r in got) == n_docs
    sizes = [r.n_docs for r in got]
    assert max(sizes) - min(sizes) <= 1
    tok_total = sum(len(_py_tokens(r.text))
                    for r in docs.select("text").collect())
    assert sum(r.tok_total for r in got) == tok_total
    for a, b in zip(got, got[1:]):
        assert a.min_quality <= a.max_quality
        assert a.max_quality <= b.min_quality


def test_knn_label_vote_matches_python_reference(spark, sf_dir):
    """Winner per query must equal the Python brute-force majority
    vote (cosine computed in array order, ranks tie-broken by
    neighbor_id, votes by (count desc, label asc))."""
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding", "label").collect()

    def cos(a, b):
        dot = n1 = n2 = 0.0
        for x, y in zip(a, b):
            x, y = float(x), float(y)
            dot += x * y
            n1 += x * x
            n2 += y * y
        return dot / math.sqrt(n1 * n2)

    queries = [r for r in emb if r.vec_id < 16]
    corpus = [r for r in emb if r.vec_id >= 16]
    expect = {}
    for q in queries:
        scored = sorted(((cos(q.embedding, c.embedding), c.vec_id, c.label)
                         for c in corpus),
                        key=lambda t: (-t[0], t[1]))[:10]
        votes = collections.Counter(lbl for _, _, lbl in scored)
        pred, n = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect[q.vec_id] = (q.label, pred, n)
    got = Q.QUERIES["knn_label_vote"](spark, sf_dir).collect()
    release_persisted()
    assert len(got) == len(expect)
    for r in got:
        t_lbl, pred, n = expect[r.query_id]
        assert (r.true_label, r.pred_label, r.n_votes) == (t_lbl, pred, n)
        assert r.hit == int(r.pred_label == r.true_label)


def test_retention_cohorts_match_python_reference(spark, sf_dir):
    """Cell counts must equal the Python cohort rollup; the k=0
    diagonal is exactly the cohort size (retention 1.0) and no later
    offset exceeds it."""
    rows = load_table(spark, sf_dir, "orders") \
        .select("o_custkey", "o_orderdate").collect()
    first: dict = {}
    months: dict = collections.defaultdict(set)
    for r in rows:
        m = r.o_orderdate.year * 12 + r.o_orderdate.month
        months[r.o_custkey].add(m)
        first[r.o_custkey] = min(first.get(r.o_custkey, m), m)
    cells: collections.Counter = collections.Counter()
    for cust, ms in months.items():
        for m in ms:
            cells[(first[cust], m - first[cust])] += 1
    got = Q.QUERIES["retention_cohorts"](spark, sf_dir).collect()
    release_persisted()
    assert {(r.cohort_month, r.month_offset): r.n_active
            for r in got} == dict(cells)
    for r in got:
        assert r.cohort_size == cells[(r.cohort_month, 0)]
        assert r.n_active <= r.cohort_size
        assert math.isclose(r.retention, r.n_active / r.cohort_size,
                            rel_tol=0, abs_tol=1e-12)
        if r.month_offset == 0:
            assert r.retention == 1.0


def test_token_length_exact_quantiles_match_python(spark, sf_dir):
    """Each pXX must be the percentile_disc value: the smallest length
    whose cumulative doc count reaches ceil(p·n/100) within its
    source."""
    rows = load_table(spark, sf_dir, "documents") \
        .select("source", "text").collect()
    by_src: dict = collections.defaultdict(list)
    for r in rows:
        by_src[r.source].append(len(_py_tokens(r.text)))
    got = Q.QUERIES["token_length_exact_quantiles"](spark, sf_dir) \
        .collect()
    release_persisted()
    assert {r.source for r in got} == set(by_src)
    for r in got:
        lens = sorted(by_src[r.source])
        assert r.n_docs == len(lens)
        for p, val in ((50, r.p50_tok), (90, r.p90_tok), (99, r.p99_tok)):
            idx = -(-len(lens) * p // 100)  # ceil
            assert val == lens[idx - 1]


def test_event_transition_matrix_matches_python(spark, sf_dir):
    """Transition counts must equal the Python rollup over per-user
    (ts, event_id)-ordered sequences; margins are row sums and each
    row's probabilities sum to 1."""
    rows = load_table(spark, sf_dir, "events") \
        .select("user_id", "ts", "event_id", "event_type").collect()
    seqs: dict = collections.defaultdict(list)
    for r in rows:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans: collections.Counter = collections.Counter()
    for evs in seqs.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    got = Q.QUERIES["event_transition_matrix"](spark, sf_dir).collect()
    release_persisted()
    assert {(r.prev_type, r.next_type): r.n_trans for r in got} == \
        dict(trans)
    by_prev: dict = collections.defaultdict(list)
    for r in got:
        by_prev[r.prev_type].append(r)
    for rows_p in by_prev.values():
        n_from = rows_p[0].n_from
        assert sum(r.n_trans for r in rows_p) == n_from
        assert all(r.n_from == n_from for r in rows_p)
        assert math.isclose(sum(r.prob for r in rows_p), 1.0,
                            rel_tol=0, abs_tol=1e-9)


def test_dedup_savings_matches_python_reference(spark, sf_dir):
    """Per-source tier counts must equal a pure-Python two-tier dedup:
    md5-fingerprint first-wins, then exact-Jaccard union-find keep-one
    over the winners; classes partition the docs and token accounting
    is exact."""
    import hashlib

    rows = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "text").collect()
    rows.sort(key=lambda r: r.doc_id)

    def norm(text):
        return re.sub(r"\s+", " ",
                      re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()

    seen_fp: dict = {}
    winners, exact_dup = [], []
    for r in rows:
        fp = hashlib.md5(norm(r.text).encode()).hexdigest()
        if fp in seen_fp:
            exact_dup.append(r)
        else:
            seen_fp[fp] = r.doc_id
            winners.append(r)
    sh = {r.doc_id: {" ".join(t)
                     for t in zip(*[norm(r.text).split(" ")[i:]
                                    for i in range(3)])}
          for r in winners}
    parent = {r.doc_id: r.doc_id for r in winners}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = [r.doc_id for r in winners]
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.35:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    by_src: dict = collections.defaultdict(
        lambda: {"n_docs": 0, "n_exact_dup": 0, "n_near_dup": 0,
                 "n_kept": 0, "tok_total": 0, "tok_kept": 0})
    ntok = {r.doc_id: len(norm(r.text).split(" ")) for r in rows}
    for r in rows:
        s = by_src[r.source]
        s["n_docs"] += 1
        s["tok_total"] += ntok[r.doc_id]
    for r in exact_dup:
        by_src[r.source]["n_exact_dup"] += 1
    # min-id cluster root keeps (matches min-label CC + keep-one)
    roots = {d: find(d) for d in ids}
    for r in winners:
        s = by_src[r.source]
        if roots[r.doc_id] == r.doc_id:
            s["n_kept"] += 1
            s["tok_kept"] += ntok[r.doc_id]
        else:
            s["n_near_dup"] += 1
    got = Q.QUERIES["dedup_savings_by_source"](spark, sf_dir).collect()
    release_persisted()
    assert {r.source for r in got} == set(by_src)
    for r in got:
        e = by_src[r.source]
        assert (r.n_docs, r.n_exact_dup, r.n_near_dup, r.n_kept) == \
            (e["n_docs"], e["n_exact_dup"], e["n_near_dup"], e["n_kept"])
        assert r.n_docs == r.n_exact_dup + r.n_near_dup + r.n_kept
        assert (r.tok_total, r.tok_kept) == (e["tok_total"], e["tok_kept"])
        assert math.isclose(r.savings_frac,
                            1.0 - e["tok_kept"] / e["tok_total"],
                            rel_tol=0, abs_tol=1e-12)


def test_cluster_size_histogram_consistency(spark, sf_dir):
    """The histogram must be the exact size rollup of the closure's
    membership: n_docs sums to the corpus, n_docs = size·n_clusters,
    doc fractions sum to 1, and the per-size cluster counts equal the
    rollup of jaccard_dedup_clusters plus untouched singletons."""
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    cc = Q.QUERIES["jaccard_dedup_clusters"](spark, sf_dir).collect()
    release_persisted()
    csize: collections.Counter = collections.Counter(
        r.cluster_id for r in cc)
    n_singletons = n_total - len(cc)
    hist: collections.Counter = collections.Counter(csize.values())
    hist[1] += n_singletons
    got = Q.QUERIES["cluster_size_histogram"](spark, sf_dir).collect()
    release_persisted()
    assert {r.cluster_size: r.n_clusters for r in got} == dict(hist)
    assert sum(r.n_docs for r in got) == n_total
    for r in got:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert math.isclose(r.doc_frac, r.n_docs / n_total,
                            rel_tol=0, abs_tol=1e-12)
    assert math.isclose(sum(r.doc_frac for r in got), 1.0,
                        rel_tol=0, abs_tol=1e-9)


def test_event_rate_anomaly_matches_python(spark, sf_dir):
    """Flagged hours must be exactly those >= 3 sample standard
    deviations above their type's hourly mean, per a pure-Python
    two-pass reference on the same hourly rollup."""
    rows = load_table(spark, sf_dir, "events") \
        .select("event_type", "ts").collect()
    hourly: collections.Counter = collections.Counter(
        (r.event_type, r.ts.replace(minute=0, second=0, microsecond=0))
        for r in rows)
    by_type: dict = collections.defaultdict(dict)
    for (t, h), c in hourly.items():
        by_type[t][h] = c
    expect = {}
    for t, hs in by_type.items():
        n = len(hs)
        s1 = sum(hs.values())
        s2 = sum(c * c for c in hs.values())
        if n <= 1 or n * s2 <= s1 * s1:  # zero variance: never anomalous
            continue
        mean = s1 / n
        std = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
        for h, c in hs.items():
            z = (c - mean) / std
            if z >= 3.0:
                expect[(t, h)] = (c, round(z, 6))
    got = Q.QUERIES["event_rate_anomaly"](spark, sf_dir).collect()
    release_persisted()
    assert {(r.event_type, r.hour_ts): (r.n_events, r.z_score)
            for r in got} == expect


def test_basket_part_pairs_lift_matches_python(spark, sf_dir):
    """Pair counts, margins, and lift must equal the Python
    market-basket rollup; the top-100 cut follows the exact-integer
    (n_both desc, part_a, part_b) order."""
    rows = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_partkey").distinct().collect()
    baskets: dict = collections.defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    marg: collections.Counter = collections.Counter()
    pairs: collections.Counter = collections.Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        marg.update(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pairs[(a, b)] += 1
    n_orders = len(baskets)
    expected = sorted(pairs.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:100]
    got = Q.QUERIES["basket_part_pairs_lift"](spark, sf_dir).collect()
    release_persisted()
    assert sorted(((r.part_a, r.part_b), r.n_both) for r in got) == \
        sorted(expected)
    for r in got:
        assert (r.n_a, r.n_b) == (marg[r.part_a], marg[r.part_b])
        assert math.isclose(
            r.lift, r.n_both * n_orders / (r.n_a * r.n_b),
            rel_tol=0, abs_tol=1e-12)


def test_open_orders_backlog_matches_python(spark, sf_dir):
    """The running open count must equal the Python interval-stabbing
    reference on every day of the dense spine, start at >= 0
    everywhere, and end at 0 the day after the last close."""
    import datetime

    o = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_orderdate").collect()
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_shipdate").collect()
    close: dict = {}
    for r in li:
        d = r.l_shipdate.date()
        close[r.l_orderkey] = max(close.get(r.l_orderkey,
                                            datetime.date.min), d)
    spans = [(r.o_orderdate.date(), close[r.o_orderkey])
             for r in o if r.o_orderkey in close]
    # inverted spans cover zero days under interval stabbing — the
    # operator (and oracle) exclude them
    spans = [(s, e) for s, e in spans if e >= s]
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    deltas: collections.Counter = collections.Counter()
    for s, e in spans:
        deltas[s] += 1
        deltas[e + datetime.timedelta(days=1)] -= 1
    got = sorted(Q.QUERIES["open_orders_backlog"](spark, sf_dir)
                 .collect(), key=lambda r: r.day)
    release_persisted()
    assert got[0].day == lo and got[-1].day == hi
    running = 0
    day = lo
    for r in got:
        assert r.day == day
        assert r.day_delta == deltas.get(day, 0)
        running += deltas.get(day, 0)
        assert r.n_open == running and running >= 0
        day += datetime.timedelta(days=1)
    assert running + deltas.get(hi + datetime.timedelta(days=1), 0) == 0


def test_embedding_similarity_histogram_matches_python(spark, sf_dir):
    """Bucket counts must equal the Python rollup over the same
    bucketed pairing (vec_id mod ceil(n/64) buckets, each vector
    paired with its id-predecessor in the bucket), fractions sum to 1,
    and every pair lands in exactly one bucket."""
    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    n = len(vecs)
    npb = (n + 63) // 64

    def cos(a, b):
        dot = n1 = n2 = 0.0
        for x, y in zip(a, b):
            dot += x * y
            n1 += x * x
            n2 += y * y
        return dot / math.sqrt(n1 * n2)

    buckets: dict = collections.defaultdict(list)
    for vid in sorted(vecs):
        buckets[vid % npb].append(vid)
    hist: collections.Counter = collections.Counter()
    n_pairs = 0
    for ids in buckets.values():
        for prev, cur in zip(ids, ids[1:]):
            c = round(cos(vecs[cur], vecs[prev]), 6)
            hist[min(max(int(math.floor((c + 1.0) * 20 / 2.0)), 0),
                     19)] += 1
            n_pairs += 1
    got = Q.QUERIES["embedding_similarity_histogram"](spark, sf_dir) \
        .collect()
    release_persisted()
    assert {r.bucket: r.n_pairs_in_bucket for r in got} == dict(hist)
    assert all(r.n_pairs == n_pairs for r in got)
    assert math.isclose(sum(r.frac for r in got), 1.0,
                        rel_tol=0, abs_tol=1e-9)
    for r in got:
        assert math.isclose(r.bucket_lo, -1.0 + r.bucket * 0.1,
                            rel_tol=0, abs_tol=1e-12)


def test_join_key_skew_profile_matches_python(spark, sf_dir):
    """Top-20 keys, counts, shares, and the mean multiple must equal
    the Python rollup under the (cnt desc, key) total order."""
    rows = load_table(spark, sf_dir, "lineitem") \
        .select("l_partkey").collect()
    cnt: collections.Counter = collections.Counter(
        r.l_partkey for r in rows)
    n_rows, n_keys = len(rows), len(cnt)
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(Q.QUERIES["join_key_skew_profile"](spark, sf_dir)
                 .collect(), key=lambda r: r.rk)
    release_persisted()
    assert [(r.key, r.cnt) for r in got] == expect
    for r in got:
        assert (r.n_rows, r.n_keys) == (n_rows, n_keys)
        assert math.isclose(r.frac, r.cnt / n_rows,
                            rel_tol=0, abs_tol=1e-12)
        assert math.isclose(r.x_mean, r.cnt * n_keys / n_rows,
                            rel_tol=0, abs_tol=1e-9)


def test_exactsubstr_prune_matches_python_reference(spark):
    """The cut must equal a literal Python implementation of the
    contract on a corpus with PLANTED duplication: a shared 6-token
    passage across three docs (one canonical survivor), an
    intra-document repeat, and a short/unique doc that must pass
    through untouched — md5 of the retained sequence checked, not
    just counts."""
    import hashlib

    from distributed_deduplicator_spark.operators.pipeline import (
        exactsubstr_prune)
    shared = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, f"one two {shared} three four"),          # canonical holder
        (2, f"five six seven {shared} eight"),        # loses the span
        (3, f"{shared} nine ten"),                    # loses the span
        (4, "intra w1 w2 w3 w4 intra w1 w2 w3 w4"),   # self-repeat (5gram)
        (5, "tiny doc"),                              # < n tokens
        (6, None),                                    # NULL text: excluded
    ]
    n = 5

    def py_prune(rows):
        toks = {i: _py_tokens(t) for i, t in rows if t is not None}
        occ = {}
        for i, tk in sorted(toks.items()):
            for p in range(len(tk) - n + 1):
                occ.setdefault(" ".join(tk[p:p + n]), []).append((i, p))
        covered = collections.defaultdict(set)
        for sites in occ.values():
            if len(sites) >= 2:
                for (i, p) in sorted(sites)[1:]:
                    covered[i].update(range(p, p + n))
        out = {}
        for i, tk in toks.items():
            kept = [w for j, w in enumerate(tk) if j not in covered[i]]
            out[i] = (len(tk), len(tk) - len(kept),
                      hashlib.md5(" ".join(kept).encode()).hexdigest())
        return out
    want = py_prune(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.id: (r.n_tokens, r.n_removed_tokens, r.retained_md5)
           for r in exactsubstr_prune(df, "doc_id", "text", n=n).collect()}
    release_persisted()
    assert got == want
    assert 6 not in got  # NULL text excluded, not NULL-poisoned
    # the planted span survives exactly once (doc 1) and is cut from
    # docs 2 and 3; doc 5 is untouched
    assert got[1][1] == 0 and got[5][1] == 0
    assert got[2][1] >= 6 and got[3][1] >= 6


def test_exactsubstr_family_gram_hash_parity(spark, sf_dir):
    """The 100 TB gram-key swap (hash_grams=True: xxhash64 keys, 8-byte
    shuffles) must be OUTPUT-IDENTICAL to the string-keyed form at the
    gate SF for both family members — the decide step
    (dup_span_stats_df) and the apply step (exactsubstr_prune)."""
    from distributed_deduplicator_spark.operators.pipeline import (
        dup_span_stats_df, exactsubstr_prune)
    from distributed_deduplicator_spark.sources import load_table
    d = load_table(spark, sf_dir, "documents")
    for fn in (dup_span_stats_df, exactsubstr_prune):
        s = {tuple(r) for r in fn(d, "doc_id", "text").collect()}
        release_persisted()
        h = {tuple(r)
             for r in fn(d, "doc_id", "text", hash_grams=True).collect()}
        release_persisted()
        assert s and s == h, fn.__name__
