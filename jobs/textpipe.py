"""spark-submit job for the training-data text pipeline — the document
side of jobs/linkgraph.py.  One op per invocation over a parquet (or
catalog) documents table; ops compose by chaining invocations on each
other's parquet output, the standard staged-corpus layout.

    spark-submit --py-files smatchpp_spark.zip jobs/textpipe.py \\
        --op neardup_clusters --docs /data/docs -o /data/dedup

Each run prints ONE JSON summary line (op, output, rows, op-specific
stats) to stdout — machine-parseable for pipeline drivers.
"""

from __future__ import annotations

import argparse
import json
import sys


OPS = [
    "exact_dedup", "neardup_clusters", "simhash_clusters", "line_dedup",
    "substring_dedup", "decontaminate",
    "quality", "gopher", "c4", "ccnet", "repetition", "langid",
    "fingerprints", "token_stats",
    "chunks", "pack", "split", "mix", "dsir", "unimax",
    "bpe_train", "bpe_segment", "pii",
    "lm_score", "collocations", "entropy", "containment", "dedup_against",
]


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="training-data text pipeline")
    p.add_argument("--op", required=True, choices=OPS)
    p.add_argument("--docs", required=True,
                   help="documents parquet dir (or table name with "
                        "--docs-table); columns doc_id, text[, lang, source]")
    p.add_argument("--docs-table", action="store_true")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="jaccard threshold (neardup) / keep threshold")
    p.add_argument("--num-hashes", type=int, default=16)
    p.add_argument("--band-size", type=int, default=4)
    p.add_argument("--hamming-radius", type=int, default=3,
                   help="simhash_clusters: max hamming distance")
    p.add_argument("--ngram", type=int, default=5,
                   help="substring_dedup / decontaminate gram size")
    p.add_argument("--eval-docs", default=None,
                   help="decontaminate: eval-set parquet dir")
    p.add_argument("--target-docs", default=None,
                   help="dsir: target-distribution parquet dir")
    p.add_argument("--window", type=int, default=128, help="chunks window")
    p.add_argument("--stride", type=int, default=64, help="chunks stride")
    p.add_argument("--max-tokens", type=int, default=2048, help="pack budget")
    p.add_argument("--n-buckets", type=int, default=256,
                   help="pack buckets / dsir hash buckets")
    p.add_argument("--weights", default="train:0.9,val:0.05,test:0.05",
                   help="split fractions name:frac,...")
    p.add_argument("--alpha", type=float, default=0.5,
                   help="mix temperature / dsir smoothing")
    p.add_argument("--domain-col", default="source")
    p.add_argument("--budget-tokens", type=int, default=1_000_000,
                   help="unimax: total token budget to allocate")
    p.add_argument("--max-epochs", type=int, default=4,
                   help="unimax: per-domain epoch cap")
    p.add_argument("--target-rate", type=float, default=0.5,
                   help="mix overall keep rate")
    p.add_argument("--n-merges", type=int, default=64, help="bpe_train")
    p.add_argument("--merges", default=None,
                   help="bpe_segment: merges parquet dir from bpe_train")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ref-docs", default=None,
                   help="lm_score / dedup_against: parquet dir of the "
                        "trusted / existing corpus")
    p.add_argument("--k", type=int, default=200,
                   help="collocations: top-k pairs")
    p.add_argument("--min-count", type=int, default=5,
                   help="collocations: hapax guard")
    p.add_argument("-o", "--output", required=True, help="output parquet dir")
    p.add_argument("--master", default=None)
    return p


def main() -> None:
    args = build_arg_parser().parse_args()

    from pyspark.sql import functions as F

    from smatchpp_spark import get_spark

    spark = get_spark(app_name=f"smatchpp-textpipe-{args.op}", master=args.master)
    docs = (
        spark.table(args.docs) if args.docs_table
        else spark.read.parquet(args.docs)
    )
    idc, txc = args.id_col, args.text_col
    summary: dict = {"op": args.op}

    if args.op == "exact_dedup":
        from smatchpp_spark.pipeline.dedup import exact_dedup

        out = exact_dedup(docs, id_col=idc, text_col=txc)
    elif args.op == "neardup_clusters":
        from smatchpp_spark.pipeline.dedup import duplicate_clusters

        out = duplicate_clusters(
            docs, threshold=args.threshold, num_hashes=args.num_hashes,
            band_size=args.band_size, id_col=idc, text_col=txc,
        )
        # output contract: one row per doc with >= 1 duplicate,
        # (id, cluster_id, is_canonical) — drop the non-canonical ones
        summary["n_dropped"] = out.filter(~F.col("is_canonical")).count()
    elif args.op == "simhash_clusters":
        from smatchpp_spark.pipeline.dedup import simhash_dedup_clusters

        out = simhash_dedup_clusters(
            docs, max_hamming=args.hamming_radius, id_col=idc, text_col=txc,
        )
        summary["n_dropped"] = out.filter(~F.col("is_canonical")).count()
    elif args.op == "line_dedup":
        from smatchpp_spark.pipeline.text import line_dedup

        out = line_dedup(docs, id_col=idc, text_col=txc)
    elif args.op == "substring_dedup":
        from smatchpp_spark.pipeline.dedup import substring_dedup_spans

        out = substring_dedup_spans(docs, ngram=args.ngram, id_col=idc,
                                    text_col=txc)
    elif args.op == "decontaminate":
        from smatchpp_spark.pipeline.dedup import decontaminate

        if not args.eval_docs:
            raise SystemExit("decontaminate requires --eval-docs")
        out = decontaminate(
            docs, spark.read.parquet(args.eval_docs),
            ngram=args.ngram, id_col=idc, text_col=txc,
        )
        summary["n_contaminated"] = out.filter(F.col("contaminated")).count()
    elif args.op == "quality":
        from smatchpp_spark.pipeline.text import quality_features

        out = quality_features(docs, id_col=idc, text_col=txc)
    elif args.op == "gopher":
        from smatchpp_spark.pipeline.text import gopher_filter

        out = gopher_filter(docs, id_col=idc, text_col=txc)
        summary["n_kept"] = out.filter(F.col("keep")).count()
    elif args.op == "c4":
        from smatchpp_spark.pipeline.text import c4_filter

        out = c4_filter(docs, id_col=idc, text_col=txc)
        summary["n_kept"] = out.filter(F.col("keep")).count()
    elif args.op == "ccnet":
        from smatchpp_spark.pipeline.relevance import ccnet_quality_buckets

        out = ccnet_quality_buckets(docs, id_col=idc, text_col=txc)
    elif args.op == "repetition":
        from smatchpp_spark.pipeline.text import repetition_features

        out = repetition_features(docs, id_col=idc, text_col=txc)
    elif args.op == "langid":
        from smatchpp_spark.pipeline.text import langid

        out = langid(docs, id_col=idc, text_col=txc)
    elif args.op == "fingerprints":
        from smatchpp_spark.pipeline.text import fingerprints

        out = fingerprints(docs, id_col=idc, text_col=txc)
    elif args.op == "token_stats":
        from smatchpp_spark.pipeline.text import token_stats

        out = token_stats(docs, id_col=idc, text_col=txc)
    elif args.op == "chunks":
        from smatchpp_spark.pipeline.packing import chunk_documents

        out = chunk_documents(docs, window=args.window, stride=args.stride,
                              id_col=idc, text_col=txc)
    elif args.op == "pack":
        from smatchpp_spark.pipeline.packing import pack_sequences

        out = pack_sequences(docs, max_tokens=args.max_tokens,
                             n_buckets=args.n_buckets, id_col=idc,
                             text_col=txc)
    elif args.op == "split":
        from smatchpp_spark.pipeline.mixing import hash_split

        fracs = {
            n: float(f)
            for n, f in (kv.split(":") for kv in args.weights.split(","))
        }
        out = hash_split(docs, fracs, id_col=idc)
        summary["splits"] = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
    elif args.op == "mix":
        from smatchpp_spark.pipeline.mixing import domain_mixture

        out = domain_mixture(
            docs, alpha=args.alpha, target_rate=args.target_rate,
            domain_col=args.domain_col, id_col=idc,
        )
        summary["n_kept"] = out.count()
    elif args.op == "unimax":
        from smatchpp_spark.pipeline.mixing import unimax_allocation

        out = unimax_allocation(
            docs, budget_tokens=args.budget_tokens,
            max_epochs=args.max_epochs, domain_col=args.domain_col,
        )
        summary["n_domains"] = out.count()
    elif args.op == "dsir":
        from smatchpp_spark.pipeline.mixing import dsir_importance

        target = (
            spark.read.parquet(args.target_docs) if args.target_docs
            else docs.filter(F.col("lang") == "en")
        )
        out = dsir_importance(docs, target, n_buckets=args.n_buckets,
                              alpha=args.alpha, id_col=idc, text_col=txc)
    elif args.op == "bpe_train":
        from smatchpp_spark.pipeline.bpe import bpe_merges

        out = bpe_merges(docs, n_merges=args.n_merges, text_col=txc)
        summary["n_merges"] = out.count()
    elif args.op == "bpe_segment":
        from smatchpp_spark.pipeline.bpe import bpe_segment

        if not args.merges:
            raise SystemExit("bpe_segment requires --merges (bpe_train output)")
        out = bpe_segment(docs, spark.read.parquet(args.merges),
                          text_col=txc, id_col=idc)
    elif args.op == "lm_score":
        from smatchpp_spark.pipeline.text import backoff_lm_scores

        if not args.ref_docs:
            raise SystemExit("lm_score requires --ref-docs (trusted corpus)")
        out = backoff_lm_scores(
            docs, spark.read.parquet(args.ref_docs),
            text_col=txc, id_col=idc,
        )
    elif args.op == "collocations":
        from smatchpp_spark.pipeline.text import collocations

        out = collocations(docs, k=args.k, min_count=args.min_count,
                           text_col=txc, id_col=idc)
    elif args.op == "entropy":
        from smatchpp_spark.pipeline.text import token_entropy

        out = token_entropy(docs, text_col=txc, id_col=idc)
    elif args.op == "containment":
        from smatchpp_spark.pipeline.dedup import containment_pairs

        out = containment_pairs(docs, threshold=args.threshold,
                                text_col=txc, id_col=idc)
    elif args.op == "dedup_against":
        from smatchpp_spark.pipeline.dedup import dedup_against

        if not args.ref_docs:
            raise SystemExit(
                "dedup_against requires --ref-docs (the existing corpus)"
            )
        out = dedup_against(
            docs, spark.read.parquet(args.ref_docs),
            threshold=args.threshold, text_col=txc, id_col=idc,
        )
        summary["n_flagged"] = out.filter(
            "exact_dup OR near_dup"
        ).count()
    else:  # pii
        from smatchpp_spark.pipeline.pii import pii_scrub

        out = pii_scrub(docs, id_col=idc, text_col=txc)

    out.write.mode("overwrite").parquet(args.output)
    summary["output"] = args.output
    summary["rows"] = spark.read.parquet(args.output).count()
    print(json.dumps(summary), file=sys.stdout)
    spark.stop()


if __name__ == "__main__":
    main()
