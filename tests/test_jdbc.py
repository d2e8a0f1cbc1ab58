"""JDBC source/sink adapter tests — run against Apache Derby embedded
(bundled with Spark, no external service), exercising the exact
``format("jdbc")`` code path a MySQL/Postgres deployment uses.

Covers: write→read roundtrip, partitioned parallel scan, the
``load()``-compatible loader contract, and the keyed upsert with the
reference's skip-empty / always-set semantics (WriteSqlDbData,
StreamTest.cpp:134-204) including idempotence.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stream_processing_test_spark.sinks.upsert import upsert_jdbc
from stream_processing_test_spark.sources.jdbc import (
    jdbc_loader,
    read_jdbc,
    write_jdbc,
)

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def test_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", "c"]})
    )
    write_jdbc(df, derby_url, "roundtrip", mode="overwrite", properties=DERBY)
    back = read_jdbc(spark, derby_url, "roundtrip", properties=DERBY)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]


def test_partitioned_scan(spark, derby_url):
    df = spark.createDataFrame(
        pd.DataFrame({"id": list(range(100)), "v": list(range(100))})
    )
    write_jdbc(df, derby_url, "bigscan", mode="overwrite", properties=DERBY)
    scan = read_jdbc(
        spark,
        derby_url,
        "bigscan",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        properties=DERBY,
    )
    # the scan really fans out into parallel range queries...
    assert scan.rdd.getNumPartitions() == 4
    # ...and bounds steer splits without dropping edge rows
    assert scan.count() == 100

    with pytest.raises(ValueError):
        read_jdbc(spark, derby_url, "bigscan", partition_column="id")


def test_loader_contract(spark, derby_url):
    df = spark.createDataFrame(
        pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["AFRICA", "ASIA"]})
    )
    write_jdbc(df, derby_url, "region", mode="overwrite", properties=DERBY)
    load = jdbc_loader(derby_url, properties=DERBY)
    assert load(spark, "ignored-sf-dir", "region").count() == 2
    with pytest.raises(KeyError):
        load(spark, "ignored", "not_a_table")


def test_upsert_jdbc_semantics_and_idempotence(spark, derby_url):
    target = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["1", "2", "3"],
                "name": ["old1", "old2", "old3"],
                "flow_score": [10, 20, 30],
            }
        )
    )
    write_jdbc(target, derby_url, "dim", mode="overwrite", properties=DERBY)

    updates = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["2", "4"],
                # None → skip-empty: keeps old2; id 4 is appended
                "name": pd.array([None, "new4"], dtype="string"),
                "flow_score": [99, 40],
            }
        )
    )
    for _ in range(2):  # second run must be a no-op (T8 idempotence)
        upsert_jdbc(
            spark,
            updates,
            derby_url,
            "dim",
            key="id",
            always_set=("flow_score",),
            properties=DERBY,
        )
        rows = {
            r["id"]: (r["name"], r["flow_score"])
            for r in read_jdbc(
                spark, derby_url, "dim", properties=DERBY
            ).collect()
        }
        assert rows == {
            "1": ("old1", 10),   # untouched row passes through
            "2": ("old2", 99),   # empty name skipped, always-set score set
            "3": ("old3", 30),
            "4": ("new4", 40),   # appended
        }


def _exec_sql(spark, url, stmts):
    from stream_processing_test_spark.sinks.upsert import _execute_driver_sql

    _execute_driver_sql(spark, url, stmts, properties=DERBY)


def test_upsert_jdbc_pushdown_merge(spark, derby_url):
    """DB-native MERGE upsert: same skip-empty/always-set semantics as
    the portable form, idempotent, and — the point of pushing down —
    rows absent from the update batch are never rewritten (asserted by
    an AFTER UPDATE trigger logging every physically updated key).

    Key columns must have comparable SQL types: Spark's Derby dialect
    maps StringType to CLOB, which Derby refuses to compare in MERGE's
    ON clause — so the tables are created with VARCHAR keys via the
    ``createTableColumnTypes`` write option (exactly what a production
    schema would have; you never key on a LOB)."""
    from stream_processing_test_spark.sinks.upsert import upsert_jdbc_pushdown

    # only the MERGE key needs a comparable type; nullable non-key
    # columns stay CLOB (Spark setNull sends the dialect default type
    # code, which Derby rejects against an overridden VARCHAR column)
    typed = dict(DERBY, createTableColumnTypes="id VARCHAR(10)")
    target = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["1", "2", "3"],
                "name": ["old1", "old2", "old3"],
                "flow_score": [10, 20, 30],
            }
        )
    )
    write_jdbc(target, derby_url, "dimp", mode="overwrite", properties=typed)
    _exec_sql(
        spark,
        derby_url,
        [
            'CREATE TABLE touch_log ("id" VARCHAR(10))',
            'CREATE TRIGGER dimp_touch AFTER UPDATE ON dimp '
            'REFERENCING OLD AS o FOR EACH ROW '
            'INSERT INTO touch_log VALUES (o."id")',
        ],
    )
    updates = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["2", "4"],
                "name": pd.array([None, "new4"], dtype="string"),
                "flow_score": [99, 40],
            }
        )
    )
    for _ in range(2):  # second run must be a no-op (T8 idempotence)
        upsert_jdbc_pushdown(
            spark,
            updates,
            derby_url,
            "dimp",
            key="id",
            always_set=("flow_score",),
            properties=typed,
        )
        rows = {
            r["id"]: (r["name"], r["flow_score"])
            for r in read_jdbc(
                spark, derby_url, "dimp", properties=DERBY
            ).collect()
        }
        assert rows == {
            "1": ("old1", 10),
            "2": ("old2", 99),   # empty name skipped, always-set score set
            "3": ("old3", 30),
            "4": ("new4", 40),   # appended
        }
    touched = [
        r["id"]
        for r in read_jdbc(spark, derby_url, "touch_log", properties=DERBY).collect()
    ]
    # keys 1 and 3 were never physically updated — MERGE only touches
    # matched keys ("2" twice, "4" matched on the idempotent second run)
    assert set(touched) == {"2", "4"} and sorted(touched) == ["2", "2", "4"]


def test_merge_into_sql_dialects():
    """MySQL emits INSERT..ON DUPLICATE KEY UPDATE (the reference's
    engine, StreamTest.cpp:151-171); everything else ANSI MERGE."""
    from stream_processing_test_spark.sinks.upsert import merge_into_sql

    std = merge_into_sql(
        "dim", "dim__stg", ["id", "name", "score"], "id", ("score",)
    )
    assert std.startswith("MERGE INTO dim t USING dim__stg s")
    assert 'COALESCE(s."name", t."name")' in std
    assert '"score" = s."score"' in std

    my = merge_into_sql(
        "dim", "dim__stg", ["id", "name", "score"], "id", ("score",),
        dialect="mysql",
    )
    assert my.startswith("INSERT INTO dim")
    assert "ON DUPLICATE KEY UPDATE" in my
    # backticks, not ANSI double quotes: stock MySQL (no ANSI_QUOTES)
    # parses "name" as a string literal (r12 review finding)
    assert "COALESCE(new.`name`, dim.`name`)" in my
    assert "`score` = new.`score`" in my
    assert '"' not in my
    # derived-table alias, not VALUES(): deprecated 8.0.20, removal
    # announced (r12 review finding)
    assert "VALUES(" not in my


def test_merge_into_sql_mysql_verbatim():
    """The MySQL statement asserted VERBATIM (VERDICT r11 item 7): no
    live MySQL exists in this environment, so the exact string IS the
    contract a deployment runs — fragment asserts could silently pass
    a malformed whole."""
    from stream_processing_test_spark.sinks.upsert import merge_into_sql

    my = merge_into_sql(
        "dim", "dim__stg", ["id", "name", "score"], "id", ("score",),
        dialect="mysql",
    )
    assert my == (
        "INSERT INTO dim (`id`, `name`, `score`) "
        "SELECT `id`, `name`, `score` FROM "
        "(SELECT `id`, `name`, `score` FROM dim__stg) AS new "
        "ON DUPLICATE KEY UPDATE "
        "`name` = COALESCE(new.`name`, dim.`name`), "
        "`score` = new.`score`"
    )


def test_upsert_pushdown_mysql_dispatch(spark, monkeypatch):
    """A jdbc:mysql: URL routes through the MySQL dialect branch:
    staging is written first, the executed statement is exactly
    merge_into_sql(dialect='mysql'), and staging is dropped after —
    the branch's control flow covered without a live server (the
    statement text itself is pinned verbatim above and semantically
    below)."""
    from stream_processing_test_spark.sinks import upsert as U

    calls: list[tuple] = []
    monkeypatch.setattr(
        "stream_processing_test_spark.sources.jdbc.write_jdbc",
        lambda df, url, table, mode, properties=None: calls.append(
            ("write", table, mode)
        ),
    )
    monkeypatch.setattr(
        U,
        "_execute_driver_sql",
        lambda spark_, url, statements, properties=None, transactional=False: calls.append(
            ("sql", tuple(statements))
        ),
    )
    updates = spark.createDataFrame(
        pd.DataFrame({"id": ["1"], "name": ["a"], "flow_score": [1]})
    )
    U.upsert_jdbc_pushdown(
        spark, updates, "jdbc:mysql://db/x", "dim", key="id",
        always_set=("flow_score",),
    )
    expected = U.merge_into_sql(
        "dim", "dim__stg", ["id", "name", "flow_score"], "id",
        ("flow_score",), dialect="mysql",
    )
    assert calls == [
        ("write", "dim__stg", "overwrite"),
        ("sql", (expected,)),
        ("sql", ("DROP TABLE dim__stg",)),
    ]
    assert "ON DUPLICATE KEY UPDATE" in expected


def test_mysql_upsert_semantics_via_duckdb_on_conflict(spark):
    """Semantic check of the generated MySQL statement itself: the
    row-alias reference ``new.col`` is DuckDB's ``EXCLUDED.col`` and
    ``ON DUPLICATE KEY UPDATE`` is ``ON CONFLICT (key) DO UPDATE SET``
    — a purely mechanical rewrite, so executing the rewritten
    statement in DuckDB exercises the statement's OWN skip-empty
    COALESCE and always-set clauses against a real conflict
    resolution engine (the derived-table source survives the rewrite
    verbatim — DuckDB parses it unchanged). Expected state replays
    merge_upsert's contract: empty-name update skipped, always-set
    score overwritten, new key inserted, untouched key intact."""
    import duckdb

    from stream_processing_test_spark.sinks.upsert import merge_into_sql

    my = merge_into_sql(
        "dim", "dim__stg", ["id", "name", "score"], "id", ("score",)
        , dialect="mysql",
    )
    ddb = (
        my.replace("ON DUPLICATE KEY UPDATE", 'ON CONFLICT ("id") DO UPDATE SET')
        .replace("new.`name`", 'EXCLUDED."name"')
        .replace("new.`score`", 'EXCLUDED."score"')
        .replace("`", '"')  # backtick -> ANSI quoting, char for char
    )
    con = duckdb.connect()
    con.execute(
        'CREATE TABLE dim ("id" VARCHAR PRIMARY KEY, "name" VARCHAR, "score" INT)'
    )
    con.execute(
        "INSERT INTO dim VALUES ('1','old1',10), ('2','old2',20), ('3','old3',30)"
    )
    con.execute('CREATE TABLE dim__stg ("id" VARCHAR, "name" VARCHAR, "score" INT)')
    con.execute(
        "INSERT INTO dim__stg VALUES "
        "('2', NULL, 99), "      # empty name -> skip, score always-set
        "('4', 'new4', 40)"      # new key -> insert
    )
    con.execute(ddb)
    rows = {
        r[0]: (r[1], r[2])
        for r in con.execute('SELECT "id","name","score" FROM dim').fetchall()
    }
    assert rows == {
        "1": ("old1", 10),
        "2": ("old2", 99),
        "3": ("old3", 30),
        "4": ("new4", 40),
    }


def test_upsert_jdbc_survives_mid_swap_crash(spark, derby_url):
    """Failure injection for the stage-and-swap: if the process dies (or
    the statement fails) BETWEEN the DELETE and the INSERT of the swap
    transaction, the database must roll back to the pre-upsert table —
    at no point is the only durable copy of the dimension gone. This is
    the data-loss window the old truncate-then-write form had."""
    from stream_processing_test_spark.sinks import upsert as U

    target = spark.createDataFrame(
        pd.DataFrame({"id": ["1", "2"], "name": ["a", "b"], "flow_score": [1, 2]})
    )
    write_jdbc(target, derby_url, "crashdim", mode="overwrite", properties=DERBY)
    updates = spark.createDataFrame(
        pd.DataFrame({"id": ["2"], "name": ["B"], "flow_score": [99]})
    )

    real_exec = U._execute_driver_sql

    def sabotage(spark_, url, statements, properties=None, transactional=False):
        if transactional:
            # the INSERT half of the swap "crashes": same transaction,
            # statement 2 fails after the DELETE already executed
            statements = [statements[0], "INSERT INTO no_such_table VALUES (1)"]
        return real_exec(spark_, url, statements, properties, transactional)

    U._execute_driver_sql = sabotage
    try:
        with pytest.raises(Exception):
            upsert_jdbc(
                spark, updates, derby_url, "crashdim", key="id",
                always_set=("flow_score",), properties=DERBY,
            )
    finally:
        U._execute_driver_sql = real_exec

    rows = {
        r["id"]: (r["name"], r["flow_score"])
        for r in read_jdbc(spark, derby_url, "crashdim", properties=DERBY).collect()
    }
    assert rows == {"1": ("a", 1), "2": ("b", 2)}, "rollback must restore the table"
    # the staging table was dropped on the error path (no orphan)
    with pytest.raises(Exception):
        read_jdbc(spark, derby_url, "crashdim__swap", properties=DERBY).collect()
    # and a clean retry completes the upsert
    upsert_jdbc(
        spark, updates, derby_url, "crashdim", key="id",
        always_set=("flow_score",), properties=DERBY,
    )
    rows = {
        r["id"]: (r["name"], r["flow_score"])
        for r in read_jdbc(spark, derby_url, "crashdim", properties=DERBY).collect()
    }
    assert rows == {"1": ("a", 1), "2": ("B", 99)}


def test_upsert_pushdown_survives_failed_merge(spark, derby_url):
    """If the MERGE statement itself fails, the live table is untouched
    (it was never deleted or truncated) and staging is cleaned up."""
    from stream_processing_test_spark.sinks import upsert as U
    from stream_processing_test_spark.sinks.upsert import upsert_jdbc_pushdown

    target = spark.createDataFrame(
        pd.DataFrame({"id": ["1"], "name": ["a"], "flow_score": [1]})
    )
    write_jdbc(target, derby_url, "mdim", mode="overwrite", properties=DERBY)
    updates = spark.createDataFrame(
        pd.DataFrame({"id": ["1"], "name": ["A"], "flow_score": [9]})
    )

    real_merge = U.merge_into_sql
    U.merge_into_sql = lambda *a, **k: "MERGE INTO definitely broken sql"
    try:
        with pytest.raises(Exception):
            upsert_jdbc_pushdown(
                spark, updates, derby_url, "mdim", key="id", properties=DERBY
            )
    finally:
        U.merge_into_sql = real_merge

    rows = [(r["id"], r["name"], r["flow_score"])
            for r in read_jdbc(spark, derby_url, "mdim", properties=DERBY).collect()]
    assert rows == [("1", "a", 1)]
    with pytest.raises(Exception):
        read_jdbc(spark, derby_url, "mdim__stg", properties=DERBY).collect()


def test_upsert_pushdown_survives_merge_crash(spark, derby_url):
    """Failure injection for the MERGE pushdown path, mirroring the
    stage-and-swap crash test: if the MERGE statement itself fails
    AFTER staging was written, (1) the live table is untouched — MERGE
    is one statement, so the DB's own atomicity protects it, there is
    no partial-merge state; (2) the staging table is still dropped on
    the error path (the finally clause, no orphan accumulating per
    failed run); (3) a clean retry completes the upsert with the full
    skip-empty / always-set semantics. Only the key column gets a
    VARCHAR override — nullable non-key columns must stay CLOB (Spark
    setNull sends the dialect default type code, which Derby rejects
    against an overridden VARCHAR column)."""
    from stream_processing_test_spark.sinks import upsert as U
    from stream_processing_test_spark.sinks.upsert import upsert_jdbc_pushdown

    typed = dict(DERBY, createTableColumnTypes="id VARCHAR(10)")
    target = spark.createDataFrame(
        pd.DataFrame({"id": ["1", "2"], "name": ["a", "b"], "flow_score": [1, 2]})
    )
    write_jdbc(target, derby_url, "crashmerge", mode="overwrite", properties=typed)

    real_exec = U._execute_driver_sql

    def sabotage(spark_, url, statements, properties=None, transactional=False):
        if any("MERGE INTO" in s for s in statements):
            statements = ["INSERT INTO no_such_table VALUES (1)"]
        return real_exec(spark_, url, statements, properties, transactional)

    updates = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ["2", "3"],
                "name": pd.array([None, "c"], dtype="string"),
                "flow_score": [99, 3],
            }
        )
    )
    U._execute_driver_sql = sabotage
    try:
        with pytest.raises(Exception):
            upsert_jdbc_pushdown(
                spark, updates, derby_url, "crashmerge", key="id",
                always_set=("flow_score",), properties=typed,
            )
    finally:
        U._execute_driver_sql = real_exec

    rows = {
        r["id"]: (r["name"], r["flow_score"])
        for r in read_jdbc(spark, derby_url, "crashmerge", properties=DERBY).collect()
    }
    assert rows == {"1": ("a", 1), "2": ("b", 2)}, "failed MERGE must not touch target"
    # staging dropped on the error path
    with pytest.raises(Exception):
        read_jdbc(spark, derby_url, "crashmerge__stg", properties=DERBY).collect()
    # clean retry lands the batch: skip-empty keeps name 'b', always-set
    # overwrites the score, new key appended
    upsert_jdbc_pushdown(
        spark, updates, derby_url, "crashmerge", key="id",
        always_set=("flow_score",), properties=typed,
    )
    rows = {
        r["id"]: (r["name"], r["flow_score"])
        for r in read_jdbc(spark, derby_url, "crashmerge", properties=DERBY).collect()
    }
    assert rows == {"1": ("a", 1), "2": ("b", 99), "3": ("c", 3)}
