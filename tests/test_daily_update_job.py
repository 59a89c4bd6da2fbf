"""e2e drive of jobs/daily_update.py: bootstrap -> incremental ->
cold-fallback-on-removal, with state carried across runs."""

from __future__ import annotations

import json
import sys


def _run(monkeypatch, capsys, argv):
    from pyspark.sql import SparkSession

    from jobs import daily_update

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    monkeypatch.setattr(sys, "argv", ["daily_update.py", *argv])
    daily_update.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def _write(spark, tmp_path, name, pairs):
    path = str(tmp_path / name)
    spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "src string, dst string"
    ).write.mode("overwrite").parquet(path)
    return path


def test_daily_update_three_days(spark, tmp_path, monkeypatch, capsys):
    from smatchpp_spark.operators.pagerank import pagerank

    state = str(tmp_path / "state")
    day1 = [(1, 2), (2, 3), (3, 1), (4, 5)]
    day2 = day1 + [(3, 4), (5, 1)]          # additions only
    day3 = [p for p in day2 if p != (4, 5)]  # a removal

    s1 = _run(monkeypatch, capsys,
              ["--edges", _write(spark, tmp_path, "d1", day1),
               "--state-dir", state, "--tol", "1e-12"])
    assert s1["mode"] == "bootstrap" and s1["run_id"] == 0

    s2 = _run(monkeypatch, capsys,
              ["--edges", _write(spark, tmp_path, "d2", day2),
               "--state-dir", state, "--tol", "1e-12"])
    assert s2["mode"] == "incremental"
    assert (s2["n_added"], s2["n_removed"]) == (2, 0)

    s3 = _run(monkeypatch, capsys,
              ["--edges", _write(spark, tmp_path, "d3", day3),
               "--state-dir", state, "--tol", "1e-12"])
    assert s3["mode"] == "cold_cc_removals" and s3["n_removed"] == 1

    # final state equals from-scratch answers on day-3's graph
    import os

    final = os.path.join(state, "run=2")
    got_r = {r.vertex: r.rank
             for r in spark.read.parquet(f"{final}/ranks").collect()}
    want_r = {
        r.vertex: r.rank
        for r in pagerank(
            spark.createDataFrame(
                [(str(a), str(b)) for a, b in day3],
                "src string, dst string",
            ),
            tol=1e-13, max_supersteps=300,
        ).ranks.collect()
    }
    assert got_r.keys() == want_r.keys()
    assert max(abs(got_r[v] - want_r[v]) for v in want_r) < 1e-9
    comp = {r.vertex: r.component
            for r in spark.read.parquet(f"{final}/components").collect()}
    assert comp["5"] == "1"  # 5 -> 1 keeps 5 attached after 4-5 removal
    assert comp["4"] == "1"  # 3 -> 4 keeps 4 attached
