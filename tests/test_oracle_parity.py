"""Every registered query with an oracle twin must match it exactly —
the local replica of the driver's t2 correctness gate."""

import pytest

from distributed_deduplicator_spark import queries as Q
from tests.oracle import compare


def _cases():
    return sorted(Q.ORACLE_SQL.keys())


@pytest.mark.parametrize("name", _cases())
def test_query_matches_oracle(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    compare(spark, sf_dir, df, Q.ORACLE_SQL[name])


def test_every_query_is_registered():
    # every oracle has a query; queries without oracle are allowed
    assert set(Q.ORACLE_SQL) <= set(Q.QUERIES)
    assert len(Q.QUERIES) >= 1
