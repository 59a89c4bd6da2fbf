"""Round-8 measurement harness (bench.py itself is FROZEN for driver
measurement; this file exists for guide §1 work: per-query isolation,
noop-sink timing, and `.explain("formatted")` capture).

Usage:
    python bench_extra.py [query ...]            # default: all
    SMATCHPP_PLAN_DUMP=plans/r08 python bench_extra.py pagerank_10steps

Each query is timed with the SAME action bench.py times (so the numbers
are comparable), run N times (SPARK_GRAFT_BENCH_RUNS, default 2, min
reported), and its physical plan is written to
``plans/r08/<query>_<tag>.txt`` where ``tag`` comes from
$SMATCHPP_PLAN_TAG (default "probe").  Jobs are labelled via
``setJobDescription`` so the UI/eventlog is readable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

PR_SUPERSTEPS = 10
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "plans", "r08"
)


def _dump_plan(df, name: str, tag: str) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    try:
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
    with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as fh:
        fh.write(txt)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = os.environ.get("SMATCHPP_PLAN_TAG", "probe")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    only = set(sys.argv[1:])

    from smatchpp_spark import get_spark

    spark = get_spark(
        app_name="smatchpp-spark-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext

    import __spark_entry__ as em
    from smatchpp_spark.corpus import corpus_dataframe
    from smatchpp_spark.operators.components import connected_components
    from smatchpp_spark.operators.degrees import degrees
    from smatchpp_spark.operators.labelprop import label_propagation
    from smatchpp_spark.operators.pagerank import pagerank
    from smatchpp_spark.operators.standardize import amr_standardize
    from smatchpp_spark.operators.triangles import triangle_count
    from smatchpp_spark.pipeline import dedup, similarity
    from smatchpp_spark.sources.penman import parse_edges

    # same untimed warmup as bench.py
    amr_standardize(parse_edges(corpus_dataframe(spark, 32, seed=1))).count()
    triangle_count(
        spark.createDataFrame(
            [("wa", "wb"), ("wb", "wc"), ("wa", "wc")], "src string, dst string"
        )
    ).total

    e_op = em._e_op(spark, sf_dir).persist()
    e_op.count()

    def q_pagerank():
        r = pagerank(e_op, alpha=0.85, tol=-1.0, max_supersteps=PR_SUPERSTEPS)
        out = r.ranks.agg(F.sum("rank")).collect()
        return r.ranks, out

    def q_degrees():
        d = degrees(e_op)
        return d, d.count()

    def q_cc():
        r = connected_components(em._e_cust(spark, sf_dir))
        return r.components, r.components.count()

    def q_lpa():
        r = label_propagation(e_op, max_supersteps=5)
        return r.labels, r.labels.count()

    def q_tri():
        r = triangle_count(em._e_co(spark, sf_dir))
        return r.per_vertex, r.total

    def q_parse():
        corpus = corpus_dataframe(spark, 2000, seed=42)
        d = amr_standardize(parse_edges(corpus))
        return d, d.count()

    def q_neardup():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        d = dedup.neardup_pairs_jaccard(
            docs, threshold=0.5, num_hashes=8, band_size=2
        )
        return d, d.count()

    def q_topk():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        d = similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") % 50 == 0), k=5
        )
        return d, d.count()

    queries = {
        "pagerank_10steps": q_pagerank,
        "degrees": q_degrees,
        "connected_components": q_cc,
        "label_propagation_5steps": q_lpa,
        "triangle_counts": q_tri,
        "parse_standardize_2k": q_parse,
        "doc_neardup": q_neardup,
        "emb_topk": q_topk,
    }

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        best = None
        df = None
        for i in range(n_runs):
            sc.setJobDescription(f"{name} run {i}")
            t0 = time.monotonic()
            df, _ = fn()
            wall = time.monotonic() - t0
            best = wall if best is None else min(best, wall)
        sc.setJobDescription(None)
        timings[name] = round(best, 3)
        if df is not None:
            _dump_plan(df, name, tag)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bench_extra_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "cpus": cpus,
                "runs": n_runs,
                "agg": "min",
                "tag": tag,
            }
        )
    )
    e_op.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
