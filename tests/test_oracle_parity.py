"""Run every registered query against its DuckDB oracle at the test
scale factor — the same check the driver performs at sf0.01."""

import pytest

from searchengine_spark.registry import all_oracles, all_queries

# The whole file is the core of the `smoke` tier: one parametrized
# case per registry query, each checked against its DuckDB oracle —
# every operator module exercised end-to-end in ~5 minutes.
pytestmark = pytest.mark.smoke

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    from tests.helpers import assert_matches_oracle

    if name not in ORACLES:
        # Non-SQL-expressible op: weaker rows-only check.
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
        return
    assert_matches_oracle(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir, name)
