"""CLI surface tests: ``python -m stream_processing_test_spark``.

Driven in-process through ``main(argv)`` (the subprocess path would
pay a fresh JVM per test); the printed output contract is what an
operator scripting against the CLI would parse.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest

from stream_processing_test_spark.__main__ import main
from tests.conftest import SF_SMALL


def test_cli_list(capsys, spark):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    from stream_processing_test_spark.registry import all_queries

    assert len(lines) == len(all_queries())
    assert any(l.startswith("q1_pricing_summary") for l in lines)
    assert all("[oracle]" in l or "[rows-only]" in l for l in lines)


def test_cli_run_show_and_write(capsys, spark, tmp_path):
    assert main(["run", "vendor_flow_stats", "--sf-dir", SF_SMALL]) == 0
    out = capsys.readouterr().out
    assert "pct_80_100" in out  # schema surfaced in the shown table

    dest = str(tmp_path / "vfs")
    assert main(
        ["run", "vendor_flow_stats", "--sf-dir", SF_SMALL, "--out", dest]
    ) == 0
    assert spark.read.parquet(dest).count() > 0


def test_cli_run_unknown_query():
    with pytest.raises(SystemExit, match="unknown query"):
        main(["run", "no_such_query", "--sf-dir", SF_SMALL])


def test_cli_day_close(capsys, spark, tmp_path):
    out_dir = tmp_path / "close"
    assert main(
        ["day-close", "--sf-dir", SF_SMALL, "--out", str(out_dir)]
    ) == 0
    dim = spark.read.parquet(str(out_dir / "source_dim"))
    assert dim.filter(dim.flow_score.isNotNull()).count() > 0
    pages = sorted(out_dir.glob("*_page*.md"))
    assert pages, "no report pages written"
    first = pages[0].read_text()
    assert first.startswith("|") and " --- " in first  # markdown table
    csvs = sorted(out_dir.glob("rollup_*.csv"))
    assert csvs, "no S7 rollup CSV written"
    rollup_back = spark.read.option("header", True).csv(str(csvs[0]))
    assert rollup_back.count() > 0 and "user_id" in rollup_back.columns
    assert "day-close complete" in (out_dir / "summary.txt").read_text()

    # idempotence: a second close over the same day leaves the dim stable
    before = sorted(map(tuple, dim.collect()))
    assert main(
        ["day-close", "--sf-dir", SF_SMALL, "--out", str(out_dir)]
    ) == 0
    after = sorted(
        map(tuple, spark.read.parquet(str(out_dir / "source_dim")).collect())
    )
    assert before == after


def test_cli_run_check_oracle(capsys, spark):
    assert main(
        ["run", "vendor_flow_stats", "--sf-dir", SF_SMALL, "--check"]
    ) == 0
    assert "vendor_flow_stats: OK" in capsys.readouterr().out


def test_cli_probe_appends_envelope_events(capsys, spark, tmp_path):
    """EP1 via the CLI: probe a dimension parquet, append one outcome
    event per source as JSON-lines, readable back through the envelope
    adapter."""
    import pandas as pd

    from stream_processing_test_spark.sources.envelope import (
        read_probe_events,
    )

    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [str(i) for i in range(12)],
                "url": [f"http://cdn{i % 2}/s/{i}" for i in range(12)],
                "target_matching": [f"Channel {i % 3}" for i in range(12)],
                "target_matching_id": [str(i % 3) for i in range(12)],
            }
        )
    ).write.parquet(dim_path)
    out = str(tmp_path / "events")
    assert main(["probe", "--dim", dim_path, "--out", out]) == 0
    assert "probed 12 sources" in capsys.readouterr().out
    ev = read_probe_events(spark, out, fmt="json")
    assert ev.count() == 12
    assert ev.filter(ev.created_time.isNull()).count() == 0


def test_gen_rotation_owed_list_from_history(tmp_path):
    """tools/gen_rotation.py is load-bearing contract tooling (the
    driver-window rotation is computed from CORRECTNESS history, not
    hand-maintained): pin its core — the stale-minimum cohort is owed,
    the fill ranks by prior-row age, never-checked queries always
    lead."""
    import json

    from tools.gen_rotation import history

    for rnd, names in [
        (1, ["a", "b", "c"]),
        (2, ["a", "b", "d"]),
        (3, ["b", "d"]),
    ]:
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps({n: {"rows_match": True} for n in names})
        )
    hist = history(tmp_path)
    assert hist == {"a": [1, 2], "b": [1, 2, 3], "c": [1], "d": [2, 3]}
    newest = {q: rs[-1] for q, rs in hist.items()}
    stale_min = min(newest.values())
    owed = sorted(q for q, n in newest.items() if n == stale_min)
    assert owed == ["c"]  # newest row r1 = the stale minimum
    # fill ranking within the r2 cohort: 'a' (prior r1) before nothing
    cohort = sorted(
        (q for q, n in newest.items() if n == 2),
        key=lambda q: (hist[q][-2] if len(hist[q]) > 1 else 0, q),
    )
    assert cohort == ["a"]


def test_pq_similarity_import_order_both_ways():
    """pq and similarity need each other's helpers at REGISTRATION
    time (oracle builders run as decorator arguments), so each must be
    importable FIRST in a fresh interpreter — executors import
    whichever module the pickled Arrow kernel lives in, and the r14
    sf0.1 bench caught pq-first workers dying on a partially
    initialized sibling (fixed via the leaf ``llm.params`` module +
    lazy function imports). Fresh subprocess per direction — the
    test's own interpreter has both cached."""
    import subprocess
    import sys

    for first in (
        "stream_processing_test_spark.llm.pq",
        "stream_processing_test_spark.llm.similarity",
    ):
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import {first}; "
                "import stream_processing_test_spark.llm.pq as p; "
                "import stream_processing_test_spark.llm.similarity as s; "
                "assert p.PQ_RERANK and s.N_PROBE",
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, f"{first} first: {proc.stderr[-800:]}"
