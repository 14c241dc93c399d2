"""Gates for non-oracle relational queries."""

from distributed_deduplicator_spark import queries as Q


def test_approx_distinct_relative_error(spark, sf_dir):
    rows = Q.QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert err <= 0.1, f"{r.l_returnflag}: {err:.3f}"
