"""spark-submit job mirroring the reference CLI (__main__.py:4-92):

  spark-submit --py-files smatchpp_spark.zip jobs/score_corpus.py \
      -a corpus_a.parquet -b corpus_b.parquet \
      [--graph_type amr|generic|none] [--solver auto|exhaustive|hillclimber]
      [--score_type micro|macro|micromacro|pairwise] [--bootstrap]
      [--lossless_graph_compression] [--pair_col pair_id] [-o out_dir]

Inputs are parquet corpus tables with (pair_col, content) columns; with
``--penman_files`` the inputs are instead reference-style Penman corpus
text files (graphs separated by blank lines, ``# ::`` metadata dropped —
data_helpers.py:7-16), paired positionally like the reference CLI.
"""

from __future__ import annotations

import argparse
import json


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="distributed smatch corpus scoring")
    p.add_argument("-a", required=True, help="corpus A (parquet dir or penman file)")
    p.add_argument("-b", required=True, help="corpus B (parquet dir or penman file)")
    p.add_argument("--graph_type", default="generic", choices=["amr", "generic", "none"])
    p.add_argument("--solver", default="auto",
                   choices=["auto", "exhaustive", "hillclimber", "dummy"])
    p.add_argument("--score_type", default="micromacro",
                   choices=["micro", "macro", "micromacro", "pairwise"])
    p.add_argument("--bootstrap", action="store_true")
    p.add_argument("--lossless_graph_compression", action="store_true")
    p.add_argument("--pair_col", default="pair_id")
    p.add_argument("--penman_files", action="store_true",
                   help="inputs are reference-style text corpora")
    p.add_argument("-o", "--output", default=None, help="optional parquet out dir")
    p.add_argument("--master", default=None)
    return p


def read_penman_file(spark, path: str):
    """Blank-line separated graphs, '# ::' metadata dropped
    (data_helpers.py:7-16), paired positionally by block index."""
    from pyspark.sql import functions as F

    text = spark.read.text(path).withColumn(
        "row", F.monotonically_increasing_id()
    )
    # small-file path: collect & split driver-side (reference semantics),
    # then re-distribute — corpus files are lines of text, the heavy data
    # lives in parquet corpora
    lines = [r["value"] for r in text.orderBy("row").collect()]
    blocks, cur = [], []
    for line in lines:
        if line.strip() == "":
            if cur:
                blocks.append("\n".join(cur))
                cur = []
            continue
        if line.strip().startswith("# ::"):
            continue
        cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    return spark.createDataFrame(
        [(i, b) for i, b in enumerate(blocks)], "pair_id long, content string"
    )


def main() -> None:
    args = build_arg_parser().parse_args()

    from smatchpp_spark import get_spark
    from smatchpp_spark.engine import EngineConfig, SmatchppSpark
    from smatchpp_spark.operators.align import AlignConfig

    spark = get_spark(app_name="smatchpp-score-corpus", master=args.master)

    if args.penman_files:
        ca = read_penman_file(spark, args.a)
        cb = read_penman_file(spark, args.b)
        pair_col = "pair_id"
    else:
        ca = spark.read.parquet(args.a)
        cb = spark.read.parquet(args.b)
        pair_col = args.pair_col

    cfg = EngineConfig(
        standardizer=args.graph_type,
        score_type=args.score_type,
        align=AlignConfig(
            solver=args.solver, compress=args.lossless_graph_compression
        ),
        bootstrap=args.bootstrap,
    )
    engine = SmatchppSpark(cfg)
    results = engine.score_corpus(ca, cb, pair_col=pair_col)

    out = {}
    for name, df in results.items():
        if name == "pairs" and args.output:
            df.write.mode("overwrite").parquet(f"{args.output}/pairs")
            continue
        if name != "pairs":
            out[name] = [r.asDict() for r in df.collect()]
    print(json.dumps(out, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
