"""Byte-pair-encoding merge training and segmentation — the standard
subword tokenizer learner (Sennrich, Haddow & Birch, ACL 2016, public;
the GPT-2/Llama tokenizer family trains this way).

Trained on the WORD-FREQUENCY table, not the raw corpus — the classic
scalability move: the corpus is scanned ONCE to count words, and every
merge round then works on ≤ |vocab| rows (each a short symbol array)
weighted by frequency.  Per round:

  1. adjacent-pair counts: one narrow explode over the symbol arrays +
     one map-side-combined groupBy (pair occurrences counted with
     multiplicity × word frequency, Sennrich's statistics);
  2. best pair: deterministic argmax (count desc, left asc, right asc)
     via TakeOrdered — one driver row;
  3. merge application: greedy LEFT-TO-RIGHT NON-OVERLAPPING rewrite of
     every symbol array ('a a a' + (a,a) → 'aa a'), implemented as ONE
     ``F.aggregate`` left fold in the scan projection — no shuffle, no
     UDF, stays in codegen.

Oracle parity: the fold is replayed in SQL through the equivalent
RUN-PARITY formulation — positions where the pair matches form
consecutive runs, and the greedy rewrite merges exactly the
even-offset positions of each run (gaps-and-islands window per word,
bounded by word length).  Two independent formulations of the same
function, which is stronger evidence than a transliteration.

Symbols start as characters plus the word-end marker ``</w>`` (Sennrich
§3.2), so merges never cross word boundaries and the learned vocab
distinguishes suffixes from prefixes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from smatchpp_spark.pipeline.text import tokens

END_OF_WORD = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus scan."""
    t = tokens(text_col)
    if lowercase:
        t = F.transform(t, lambda w: F.lower(w))
    return (
        docs.select(F.explode(t).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Characters + the end-of-word marker.  Char extraction via
    substr(i, 1) over a 1..length sequence — identical in DuckDB
    (word[i] slicing), no split('') trailing-empty ambiguity."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of ONE merge
    (left, right) → left||right to a symbol array, as a single
    ``F.aggregate`` fold: hold a ``left``, merge when ``right``
    follows, otherwise flush the held symbol — 'a a a' + (a,a) →
    ['aa', 'a'], the BPE standard."""
    merged = left + right
    empt = F.array().cast("array<string>")
    acc0 = F.struct(empt.alias("out"), F.lit(False).alias("held"))

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(
                acc["held"] & (s == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(False).alias("held"),
                ),
            )
            .when(
                acc["held"],
                F.struct(
                    F.concat(
                        acc["out"],
                        F.array(F.lit(left)),
                        F.when(s == F.lit(left), empt).otherwise(F.array(s)),
                    ).alias("out"),
                    (s == F.lit(left)).alias("held"),
                ),
            )
            .when(
                s == F.lit(left),
                F.struct(acc["out"].alias("out"), F.lit(True).alias("held")),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(s)).alias("out"),
                    F.lit(False).alias("held"),
                )
            )
        )

    def fin(acc: Column) -> Column:
        return F.when(
            acc["held"], F.concat(acc["out"], F.array(F.lit(left)))
        ).otherwise(acc["out"])

    return F.aggregate(syms, acc0, step, fin)


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent symbol pairs weighted by word freq,
    occurrences with multiplicity (Sennrich's get_stats)."""
    # guard 1-symbol words: sequence(1, 0) DESCENDS in Spark ([1, 0]),
    # so an unguarded transform would element_at out of bounds
    pair_structs = F.when(
        F.size("syms") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("l"),
                F.element_at("syms", i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    pairs = words.select("freq", F.explode(pair_structs).alias("p"))
    return pairs.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("freq").alias("cnt"))


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table ``(round int, left, right, merged, pair_freq long)`` in merge
    order — THE artifact of BPE training (segmentation replays it).
    Stops early when no adjacent pair remains (tiny corpora).

    Scale: one corpus scan (word frequencies), then per round one
    explode+groupBy over the ≤|vocab|-row word table, one TakeOrdered
    argmax (single driver row — the only sequential dependency, same
    as every published distributed BPE), and one fold rewrite in the
    scan projection.  Word arrays only shrink.
    """
    if n_merges < 1:
        raise ValueError(f"bpe_merges: n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    words = word_frequencies(docs, text_col=text_col, lowercase=lowercase)
    state = words.select(
        "freq", _initial_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)

    from smatchpp_spark.operators.supersteps import free_local_checkpoint

    out_rows = []
    for r in range(1, n_merges + 1):
        best = (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        out_rows.append((r, left, right, left + right, int(cnt)))
        prev = state
        state = state.select(
            "freq", apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
        free_local_checkpoint(prev)
    free_local_checkpoint(state)
    return spark.createDataFrame(
        out_rows,
        "round int, left string, right string, merged string, pair_freq long",
    )


def bpe_segment(
    docs: DataFrame,
    merges: "DataFrame | list[tuple[str, str]]",
    text_col: str = "text",
    lowercase: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment documents with a trained merge list: replay the merges
    in order over each word's symbol array (the standard BPE encoder).
    ``merges`` is the bpe_merges table (collected — merge lists are
    small by construction) or a python list of (left, right).

    Output ``(id, n_words int, n_subwords int, subwords array<string>)``
    per document.  One scan; K folds fused into one projection — the
    merge list ships as plan literals like every other trained-model
    artifact here (IVF codebook, domain keep-probs)."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("round").collect()
        mlist = [(x["left"], x["right"]) for x in rows]
    else:
        mlist = list(merges)
    t = tokens(text_col)
    if lowercase:
        t = F.transform(t, lambda w: F.lower(w))
    per_word = F.transform(t, lambda w: _segment_word(w, mlist))
    return docs.select(
        F.col(id_col),
        F.size(t).alias("n_words"),
        F.flatten(per_word).alias("subwords"),
    ).select(
        id_col,
        "n_words",
        F.size("subwords").alias("n_subwords"),
        "subwords",
    )


def _segment_word(word: Column, mlist: "list[tuple[str, str]]") -> Column:
    syms = _initial_symbols(word)
    for left, right in mlist:
        syms = apply_merge(syms, left, right)
    return syms
