"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank_edges_per_sec": ..., "pagerank_supersteps_per_hour": ...,
   "cpus": ...}

The PageRank numbers are the north-rule throughput metrics: a fixed
10-superstep power iteration over the order→part edge table, with
edges/sec = supersteps × |E| / wall.  Run with SPARK_GRAFT_CPUS=8 and
=32 on the same input for the two-cluster-size scaling evidence
(BASELINE.md §sandbox adaptation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

PR_SUPERSTEPS = 10


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from smatchpp_spark import get_spark

    spark = get_spark(
        app_name="smatchpp-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    import __spark_entry__ as em
    from smatchpp_spark.corpus import corpus_dataframe
    from smatchpp_spark.operators.components import connected_components
    from smatchpp_spark.operators.degrees import degrees
    from smatchpp_spark.operators.labelprop import label_propagation
    from smatchpp_spark.operators.pagerank import pagerank
    from smatchpp_spark.operators.standardize import amr_standardize
    from smatchpp_spark.operators.triangles import triangle_count
    from smatchpp_spark.pipeline import dedup, similarity

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    # best-of-N walls (default 2): this box is a shared VM with measured
    # ±30%+ noisy-neighbor windows; the min of two back-to-back runs of an
    # idempotent read-only query is the standard robust estimator of the
    # plan's true cost.  Reported in the JSON as "runs"/"agg".
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

    def timed(name):
        def deco(fn):
            best = None
            out = None
            for _ in range(n_runs):
                t0 = time.monotonic()
                out = fn()
                wall = time.monotonic() - t0
                best = wall if best is None else min(best, wall)
            timings[name] = round(best, 3)
            return out

        return deco

    # warm the Python-worker pool + Arrow path + the window/join/codegen
    # operators once, untimed: the first mapInPandas stage of a session
    # pays worker spawn + import costs, and the first complex plan pays
    # JIT/codegen compilation — both one-time session costs that would
    # otherwise land on whichever query runs them first (measured: the
    # full AMR pipeline is ~5.6s warm vs ~26s as the session's first
    # windowed multi-join plan)
    from smatchpp_spark.corpus import corpus_dataframe
    from smatchpp_spark.sources.penman import parse_edges as _pe

    amr_standardize(_pe(corpus_dataframe(spark, 32, seed=1))).count()
    # ...and the wedge-join/localCheckpoint path (triangles) — same
    # one-time codegen/JIT cost class, measured up to +10s on the first
    # heavy self-join of a session
    triangle_count(
        spark.createDataFrame(
            [("wa", "wb"), ("wb", "wc"), ("wa", "wc")], "src string, dst string"
        )
    ).total

    e_op = em._e_op(spark, sf_dir).persist()
    n_edges = e_op.count()

    @timed("pagerank_10steps")
    def _pr():
        r = pagerank(e_op, alpha=0.85, tol=-1.0, max_supersteps=PR_SUPERSTEPS)
        return r.ranks.agg(F.sum("rank")).collect()

    pr_sec = timings["pagerank_10steps"]
    extras["pagerank_edges_per_sec"] = round(PR_SUPERSTEPS * n_edges / pr_sec, 1)
    extras["pagerank_supersteps_per_hour"] = round(PR_SUPERSTEPS / pr_sec * 3600, 1)
    extras["n_edges"] = n_edges

    @timed("degrees")
    def _deg():
        return degrees(e_op).count()

    @timed("connected_components")
    def _cc():
        return connected_components(em._e_cust(spark, sf_dir)).components.count()

    @timed("label_propagation_5steps")
    def _lpa():
        return label_propagation(e_op, max_supersteps=5).labels.count()

    @timed("triangle_counts")
    def _tri():
        return triangle_count(em._e_co(spark, sf_dir)).total

    @timed("parse_standardize_2k")
    def _amr():
        from smatchpp_spark.sources.penman import parse_edges

        corpus = corpus_dataframe(spark, 2000, seed=42)
        return amr_standardize(parse_edges(corpus)).count()

    @timed("doc_neardup")
    def _nd():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return dedup.neardup_pairs_jaccard(
            docs, threshold=0.5, num_hashes=8, band_size=2
        ).count()

    @timed("emb_topk")
    def _topk():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") % 50 == 0), k=5
        ).count()

    e_op.unpersist()
    total = round(sum(timings.values()), 3)
    vs_best = _update_best_ledger(timings, sf=sf, cpus=cpus)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "runs": n_runs,
                "agg": "min",
                **({"vs_best": vs_best} if vs_best else {}),
                **extras,
            }
        )
    )
    spark.stop()


def _update_best_ledger(
    timings: dict[str, float], sf: str, cpus: int
) -> dict[str, float] | None:
    """Maintain BENCH/best_of_history.json: per-query best-of-N walls
    across ALL rounds at the canonical config (sf0.1, 32 cpus), so the
    cross-round 2x regression check is mechanical rather than prose.
    Cross-round comparison must be per-query best-of-history because
    this box has measured ±30% noisy-neighbor windows (BENCH/NOTES.md);
    a single round's wall is not a floor.  Returns {query: ratio vs
    best} for the canonical config, None otherwise (scaling-evidence
    runs at other cpu counts must not pollute the ledger)."""
    if sf != "0.1" or cpus != 32:
        return None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "best_of_history.json")
    ledger: dict = {"config": {"sf": "0.1", "cpus": 32}, "queries": {}}
    if os.path.exists(path):
        try:
            with open(path) as f:
                ledger = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass
    qs = ledger.setdefault("queries", {})
    vs_best: dict[str, float] = {}
    for name, sec in timings.items():
        ent = qs.setdefault(name, {"best_sec": sec, "n_runs": 0})
        ent["best_sec"] = round(min(ent["best_sec"], sec), 3)
        ent["last_sec"] = sec
        ent["n_runs"] = int(ent.get("n_runs", 0)) + 1
        ent["ratio_last_vs_best"] = round(sec / ent["best_sec"], 3) if ent["best_sec"] else 1.0
        vs_best[name] = ent["ratio_last_vs_best"]
    ledger["worst_ratio"] = max(vs_best.values()) if vs_best else 1.0
    ledger["updated_unix"] = round(time.time(), 1)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        return vs_best
    return vs_best


if __name__ == "__main__":
    main()
