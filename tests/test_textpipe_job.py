"""e2e drives of jobs/textpipe.py — the training-data pipeline
spark-submit surface (document analog of jobs/linkgraph.py)."""

from __future__ import annotations

import json
import sys


def _run_job(monkeypatch, capsys, argv):
    from pyspark.sql import SparkSession

    from jobs import textpipe

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    monkeypatch.setattr(sys, "argv", ["textpipe.py", *argv])
    textpipe.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def _write_docs(spark, tmp_path, texts, name="docs"):
    path = str(tmp_path / name)
    spark.createDataFrame(
        [(i, t, "en", f"src{i % 2}") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    ).write.mode("overwrite").parquet(path)
    return path


def test_textpipe_dedup_family(spark, tmp_path, monkeypatch, capsys):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "the quick brown fox jumps over the lazy cat",   # near dup
        "completely different content about spark joins",
    ]
    dpath = _write_docs(spark, tmp_path, texts)

    s = _run_job(monkeypatch, capsys,
                 ["--op", "exact_dedup", "--docs", dpath,
                  "-o", str(tmp_path / "ed")])
    assert s["rows"] == 3  # one exact dup dropped

    s = _run_job(monkeypatch, capsys,
                 ["--op", "neardup_clusters", "--docs", dpath,
                  "--threshold", "0.5", "--num-hashes", "8",
                  "--band-size", "2", "-o", str(tmp_path / "nd")])
    # clusters table holds only docs with >= 1 duplicate
    assert s["rows"] >= 2 and s["n_dropped"] >= 1

    s = _run_job(monkeypatch, capsys,
                 ["--op", "split", "--docs", dpath,
                  "--weights", "train:0.5,test:0.5",
                  "-o", str(tmp_path / "sp")])
    assert s["rows"] == 4 and sum(s["splits"].values()) == 4


def test_textpipe_quality_and_tokenizer(spark, tmp_path, monkeypatch, capsys):
    texts = [
        "low lower lowest newest widest " * 6,
        "spark joins shuffle partitions broadcast " * 8,
    ]
    dpath = _write_docs(spark, tmp_path, texts)

    s = _run_job(monkeypatch, capsys,
                 ["--op", "gopher", "--docs", dpath,
                  "-o", str(tmp_path / "gf")])
    assert s["rows"] == 2 and "n_kept" in s

    s = _run_job(monkeypatch, capsys,
                 ["--op", "chunks", "--docs", dpath, "--window", "8",
                  "--stride", "4", "-o", str(tmp_path / "ch")])
    assert s["rows"] > 2  # both docs chunked into several windows

    s = _run_job(monkeypatch, capsys,
                 ["--op", "bpe_train", "--docs", dpath, "--n-merges", "6",
                  "-o", str(tmp_path / "bpe")])
    assert s["n_merges"] == 6
    s = _run_job(monkeypatch, capsys,
                 ["--op", "bpe_segment", "--docs", dpath,
                  "--merges", str(tmp_path / "bpe"),
                  "-o", str(tmp_path / "seg")])
    assert s["rows"] == 2
    segs = spark.read.parquet(str(tmp_path / "seg")).collect()
    assert all(r["n_subwords"] >= r["n_words"] for r in segs)

    s = _run_job(monkeypatch, capsys,
                 ["--op", "pii", "--docs", dpath,
                  "-o", str(tmp_path / "pii")])
    assert s["rows"] == 2


def test_textpipe_requires_dependent_inputs(spark, tmp_path, monkeypatch, capsys):
    import pytest as _pytest

    dpath = _write_docs(spark, tmp_path, ["a b c"])
    with _pytest.raises(SystemExit):
        _run_job(monkeypatch, capsys,
                 ["--op", "decontaminate", "--docs", dpath,
                  "-o", str(tmp_path / "x")])
    with _pytest.raises(SystemExit):
        _run_job(monkeypatch, capsys,
                 ["--op", "bpe_segment", "--docs", dpath,
                  "-o", str(tmp_path / "y")])


def test_textpipe_unimax(spark, tmp_path, monkeypatch, capsys):
    # _write_docs assigns source src{i % 2}: src0 = indices 0/2/4
    # (6 tokens, capacity 12), src1 = 1/3/5 (24 tokens, capacity 48)
    texts = ["a b", "p q r s t u v w", "c d",
             "m n o p q r s t", "e f", "h i j k l m n o"]
    dpath = _write_docs(spark, tmp_path, texts)
    out = str(tmp_path / "um")
    s = _run_job(
        monkeypatch, capsys,
        ["--op", "unimax", "--docs", dpath, "--domain-col", "source",
         "--budget-tokens", "30", "--max-epochs", "2", "-o", out],
    )
    assert s["n_domains"] == 2
    rows = {r.domain: r for r in spark.read.parquet(out).collect()}
    # src0 binds (12*2 <= 30); theta = (30-12)/1 = 18 for src1
    assert rows["src0"].allocation == 12.0 and rows["src0"].epochs == 2.0
    assert rows["src1"].allocation == 18.0


def test_textpipe_round7_late_ops(spark, tmp_path, monkeypatch, capsys):
    texts = [
        "machine learning is fun and machine learning is useful",
        "machine learning is fun and machine learning is useful",
        "the quick brown fox jumps over the lazy dog",
        "a a a a a a a a",
    ]
    dpath = _write_docs(spark, tmp_path, texts)
    ref = _write_docs(spark, tmp_path, texts[:2], name="ref")

    s = _run_job(monkeypatch, capsys,
                 ["--op", "entropy", "--docs", dpath,
                  "-o", str(tmp_path / "ent")])
    assert s["rows"] == 4
    ent = {r.doc_id: r.token_entropy
           for r in spark.read.parquet(str(tmp_path / "ent")).collect()}
    assert ent[3] == 0.0 and ent[2] > ent[0]

    s = _run_job(monkeypatch, capsys,
                 ["--op", "collocations", "--docs", dpath,
                  "--k", "5", "--min-count", "2",
                  "-o", str(tmp_path / "coll")])
    assert 0 < s["rows"] <= 5

    s = _run_job(monkeypatch, capsys,
                 ["--op", "lm_score", "--docs", dpath, "--ref-docs", ref,
                  "-o", str(tmp_path / "lm")])
    assert s["rows"] == 4
    lm = {r.doc_id: r.ppl
          for r in spark.read.parquet(str(tmp_path / "lm")).collect()}
    assert lm[0] < lm[2]  # in-reference text beats out-of-domain

    s = _run_job(monkeypatch, capsys,
                 ["--op", "dedup_against", "--docs", dpath,
                  "--ref-docs", ref, "--threshold", "0.8",
                  "-o", str(tmp_path / "da")])
    assert s["rows"] == 4 and s["n_flagged"] >= 2  # docs 0,1 exact-match ref

    s = _run_job(monkeypatch, capsys,
                 ["--op", "containment", "--docs", dpath,
                  "--threshold", "0.8", "-o", str(tmp_path / "cont")])
    pairs = {(r.doc_a, r.doc_b)
             for r in spark.read.parquet(str(tmp_path / "cont")).collect()}
    assert (0, 1) in pairs  # identical docs contain each other
