"""Corpus relevance & statistical-LM quality operators over the
``documents`` table — the retrieval/curation layer of a training-data
pipeline (TF-IDF term salience, BM25 search, corpus-trained bigram-LM
scoring à la CCNet's perplexity buckets).  All formulas are the public
textbook ones (Salton TF-IDF with sklearn's smooth idf; Robertson /
Sparck-Jones BM25 as popularized by Lucene; add-alpha-smoothed bigram
MLE), chosen for exact cross-engine replayability — every operator has
a DuckDB oracle in ``__spark_entry__.py``.

Tokenization contract is shared with pipeline/text.py: whitespace
tokens of the trimmed text, lowercased; empty text → no terms.

Scale shape at 100 TB:
* term statistics are map-side-combined groupBys (hot stopwords are
  exactly what partial aggregation absorbs);
* per-doc term frequencies pre-aggregate on (doc, term) BEFORE any join
  against corpus-level tables, so stopword skew never rides a join key
  with per-row fanout;
* corpus scalars (N docs, avg doc length, vocab size) are 1-row
  DataFrames attached by crossJoin — broadcast by the planner, never a
  driver round-trip inside the plan (pagerank.py discipline);
* BM25 filters the posting lists to the query's literal terms at the
  scan (predicate pushdown), so a search touches only matching rows;
* top-k outputs go through orderBy+limit (TakeOrdered — k rows per
  partition cross the wire) or per-doc windows bounded by doc length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smatchpp_spark.pipeline.text import tokens


def _terms(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) — one row per token occurrence, lowercased, nonempty."""
    return docs.select(
        F.col(id_col),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("term"),
    ).filter(F.length("term") > 0)


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    ``idf = ln((N + 1) / (df + 1)) + 1`` (the sklearn smooth-idf
    variant — never zero, division-safe), ``score = tf * idf``.
    Output ``(doc_id, term, tf, score, rank)``, rank 1..k per doc by
    ``(score desc, term asc)`` — deterministic under ties.  Documents
    with no tokens are absent.
    """
    terms = _terms(docs, text_col, id_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0)
    )
    scored = (
        tf.join(df_t, "term")
        .crossJoin(n_docs)
        .select(
            id_col,
            "term",
            "tf",
            F.round(F.col("tf") * idf, 9).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    top_n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval: the ``top_n`` documents for a bag of query terms.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with the Robertson/Sparck-Jones idf ``ln((N−df+0.5)/(df+0.5) + 1)``
    (non-negative; the +1 is the Lucene convention).  ``dl`` is the
    document's token count, ``avgdl`` the corpus mean over ALL documents
    (empty ones included — they just score nothing).  Output
    ``(doc_id, score, n_matched)`` ordered by ``(score desc, doc_id
    asc)``; only documents matching ≥ 1 query term appear.

    The query terms are plan literals: the exploded term stream is
    filtered to them immediately, so document frequencies, term
    frequencies and the final join all run over the matching slice
    only.
    """
    q = sorted({t.lower() for t in query_terms if t})
    if not q:
        raise ValueError("bm25_search requires at least one query term")
    terms = _terms(docs, text_col, id_col).filter(F.col("term").isin(q))
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = docs.select(
        F.col(id_col), F.size(tokens(text_col)).cast("double").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col)).cast("double")).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * (
        F.col("tf") * (F.lit(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(df_t, "term")
        .join(dl, id_col)
        .crossJoin(stats)
        .groupBy(id_col)
        .agg(
            F.round(F.sum(term_score), 9).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_matched"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_n)
    )


def bigram_lm_scores(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-likelihood under an add-``alpha``
    smoothed bigram LM trained on the SAME corpus — the statistical-LM
    quality signal of a CCNet-style pipeline (documents whose token
    transitions are unlike the corpus score low: boilerplate, gibberish,
    wrong-language shards).

    ``P(w2|w1) = (c(w1,w2) + α) / (c₁(w1) + α·|V|)`` where ``c₁`` is the
    bigram left-marginal and ``|V|`` the corpus vocabulary size; the
    score is the mean ``ln P`` over the document's bigrams.  Output
    ``(doc_id, n_bigrams, avg_logp)``; documents with < 2 tokens get
    ``n_bigrams = 0`` and null ``avg_logp``.

    Plan: one explode builds the (doc, w1, w2) bigram stream (guarded
    for < 2 tokens — ``sequence(1, 0)`` would COUNT DOWN, the classic
    trap), pre-aggregated per (doc, w1, w2) before the two count joins
    so repeated bigrams ride the join once.
    """
    toks = F.transform(tokens(text_col), F.lower)
    n = F.size(toks)
    bigrams = F.when(n < 2, F.array().cast("array<struct<w1:string,w2:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        )
    )
    doc_bg = (
        docs.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bg_counts = doc_bg.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    left_counts = bg_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        docs.select(F.explode(toks).alias("w"))
        .filter(F.length("w") > 0)
        .agg(F.count_distinct("w").cast("double").alias("v"))
    )
    logp = F.log(
        (F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
    )
    per_doc = (
        doc_bg.join(bg_counts, ["w1", "w2"])
        .join(left_counts, "w1")
        .crossJoin(vocab)
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("n") * logp) / F.sum("n"), 6).alias("avg_logp"),
        )
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.col("avg_logp"),
    )


def ccnet_quality_buckets(
    docs: DataFrame,
    min_count: int = 3,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The CCNet quality pipeline end-to-end (Wenzek et al. 2019,
    public): corpus-level line dedup (boilerplate removal) → add-alpha
    bigram-LM scoring of the CLEANED text → head/middle/tail quality
    buckets by corpus log-probability terciles; CCNet keeps
    head+middle.

    Output per doc: ``(doc_id, n_dropped, n_bigrams, avg_logp, bucket,
    keep)`` — ``bucket`` ∈ head/middle/tail ('empty' with keep=false
    when the cleaned doc has < 2 tokens and no LM score exists).

    Tercile boundaries are EXACT interpolated percentiles (1/3, 2/3)
    of the rounded per-doc scores, computed as one partial-merge
    aggregate and shipped back as plan literals (the IVF-codebook /
    domain-mix discipline) — bucketing is then a stateless projection.
    No global-sort window anywhere: at 100 TB swap the exact
    ``percentile`` (which buffers values per partition) for
    ``approx_percentile`` — one line, documented here — and the plan
    shape is unchanged.
    """
    from smatchpp_spark.pipeline.text import line_dedup

    ld = line_dedup(docs, text_col=text_col, id_col=id_col, min_count=min_count)
    cleaned = ld.select(id_col, F.col("text_clean").alias(text_col))
    lm = bigram_lm_scores(cleaned, alpha=alpha, text_col=text_col, id_col=id_col)
    row = (
        lm.filter(F.col("avg_logp").isNotNull())
        .agg(
            F.percentile(F.col("avg_logp"), F.lit(1.0 / 3)).alias("b_lo"),
            F.percentile(F.col("avg_logp"), F.lit(2.0 / 3)).alias("b_hi"),
        )
        .collect()[0]
    )
    b_lo, b_hi = row["b_lo"], row["b_hi"]
    if b_lo is None:  # nothing scored: everything is 'empty'
        bucket = F.lit("empty")
    else:
        # boundaries rounded like the scores so a >= comparison can
        # never flip between engines on the 6-dp score grid
        b_lo, b_hi = round(b_lo, 6), round(b_hi, 6)
        bucket = (
            F.when(F.col("avg_logp").isNull(), F.lit("empty"))
            .when(F.col("avg_logp") >= F.lit(b_hi), F.lit("head"))
            .when(F.col("avg_logp") >= F.lit(b_lo), F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    return lm.join(ld.select(id_col, "n_dropped"), id_col).select(
        id_col,
        "n_dropped",
        "n_bigrams",
        "avg_logp",
        bucket.alias("bucket"),
        bucket.isin("head", "middle").alias("keep"),
    )
