"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "flow_score" in df.columns


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # >= 80% of queries must be oracle-checked (rows-only is reserved
    # for genuinely non-SQL ops: LSH hashes, stateful python, stubs)
    assert len(oracles) >= 0.8 * len(qs)


def test_every_query_runs_on_smallest_sf(spark):
    from tests.conftest import SF_SMALL

    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMALL)
        assert df.columns, name
        df.limit(5).collect()  # plan executes
