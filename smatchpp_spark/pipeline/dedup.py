"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (the part that matters at 100 TB):

* **exact** — one hash-groupBy; map-side partial aggregation absorbs hot
  duplicates, the shuffle carries one row per (partition, hash).
* **minhash/LSH** — signatures are a pure map pass (no shuffle); the
  candidate-pair join shuffles on ``(band_idx, band_hash)`` which is
  uniform by construction (hash keys), so no skew handling is needed; a
  guard drops degenerate mega-buckets (e.g. the empty-text bucket) before
  the self-join can go quadratic.
* **simhash** — map pass + one groupBy on doc id (already unique → Spark
  rewrites it into a partial-only aggregation).
* **jaccard verify** — only runs on LSH candidates, never all pairs.

All hashes route through ``functions.hashing`` — ``portable=True`` makes
every signature bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from smatchpp_spark.functions.hashing import hash64
from smatchpp_spark.pipeline.text import tokens


def exact_dedup_groups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(content_hash, keep_id, n_copies): one row per distinct content;
    ``keep_id`` = min id is the canonical survivor."""
    return (
        docs.select(hash64(F.col(text_col), portable).alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one row (the min-id one) per distinct text.

    One map-side-combinable aggregation: ``min_by(struct(all columns),
    id)`` keeps the whole min-id row per content hash, so a text with
    10^9 boilerplate copies costs one partial row per map partition —
    the previous ``row_number`` window put EVERY copy of one text into a
    single task (the classic hot-partition collapse at corpus scale).
    A groupBy + semi-join would not do: it keeps both copies when
    duplicate rows share the same id; ``min_by`` keeps exactly one.
    Ties on ``id_col`` among identical texts resolve to one arbitrary
    full row — same contract as the old window (row_number ties were
    partition-order-dependent too)."""
    cols = docs.columns
    return (
        docs.groupBy(hash64(F.col(text_col)).alias("_h"))
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_row"))
        .select(*[F.col(f"_row.{c}").alias(c) for c in cols])
    )


def shingles(text_col: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams of the lowercased text; docs shorter than k
    words use the whole (normalized) text as their single shingle.

    Built as zip_with over k shifted slices of the token array — each
    slice references the token expression once (constant per row).  The
    per-gram element_at(i..i+k) formulation re-evaluates the whole
    tokenize expression per element under projection collapse (O(n·k)
    regex splits per document)."""
    t = F.transform(tokens(text_col), F.lower)
    n = F.size(t)
    m = F.greatest(n - (k - 1), F.lit(0))  # gram count (slice needs len >= 0)
    grams = F.slice(t, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(t, j + 1, m),
            lambda acc, w: F.concat(acc, F.lit(" "), w),
        )
    whole = F.array(F.concat_ws(" ", t))
    return F.array_distinct(F.when(n < k, whole).otherwise(grams))


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, sig array<long> of length num_hashes).

    sig[i] = min over shingles of hash(shingle || '#i'), computed
    explode-style: one row per (doc, shingle) hashed k ways, then a
    map-side-combined min aggregation.  An all-array formulation
    (array_min over transform per seed) looks shuffle-free but Catalyst's
    projection collapse inlines the whole tokenize+shingle expression
    into every element access — measured ~50x slower.  The explode pass
    evaluates shingling exactly once per document, and the min-agg
    shuffle carries k longs per (partition, doc)."""
    sh_rows = docs.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_k)).alias("shingle")
    )
    hashed = sh_rows.select(
        id_col,
        *[
            hash64(F.concat(F.col("shingle"), F.lit(f"#{i}")), portable).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        id_col, F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_bands(
    signatures: DataFrame,
    num_hashes: int,
    id_col: str = "doc_id",
    band_size: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Split each signature into bands; band key = hash of the joined band
    values.  Output (id, band_idx, band_hash) — the LSH bucket table."""
    n = num_hashes
    bands = []
    for b in range(0, n, band_size):
        vals = [F.element_at("sig", i + 1).cast("string") for i in range(b, min(b + band_size, n))]
        bands.append(
            F.struct(
                F.lit(b // band_size).alias("band_idx"),
                hash64(F.concat_ws(",", *vals), portable).alias("band_hash"),
            )
        )
    return signatures.select(
        id_col, F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")


def neardup_pairs_minhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band.

    Output (doc_a, doc_b, n_shared_bands) with doc_a < doc_b.  Buckets
    larger than ``max_bucket`` are dropped before the self-join — the
    standard guard against degenerate buckets going quadratic at scale.
    """
    # materialize the signature table once: Catalyst's projection
    # collapse would otherwise inline the full shingle+minhash expression
    # tree into EVERY element_at() of the band projection (k× recompute,
    # measured 25x slower end-to-end), and every downstream branch
    # (bucket sizing, guard semi-join, both self-join sides) multiplies
    # it again.  At scale this is the "write the signature table once"
    # step of a production near-dup pipeline.
    sigs = minhash_signatures(
        docs, text_col, id_col, num_hashes, shingle_k, portable
    ).localCheckpoint(eager=False)
    bands = lsh_bands(sigs, num_hashes, id_col, band_size, portable)
    sizes = bands.groupBy("band_idx", "band_hash").agg(F.count(F.lit(1)).alias("sz"))
    bands = bands.join(
        sizes.filter(F.col("sz") <= max_bucket).select("band_idx", "band_hash"),
        ["band_idx", "band_hash"],
        "left_semi",
    )
    a = bands.select("band_idx", "band_hash", F.col(id_col).alias("doc_a"))
    b = bands.select("band_idx", "band_hash", F.col(id_col).alias("doc_b"))
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for the given candidate (doc_a, doc_b) pairs."""
    sh = docs.select(F.col(id_col), shingles(text_col, shingle_k).alias("sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(union == 0, F.lit(0.0))
            .otherwise(inter.cast("double") / union)
            .alias("jaccard"),
        )
    )


def neardup_pairs_jaccard(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **minhash_kwargs,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard ≥ threshold —
    the standard two-stage near-dup pipeline."""
    cands = neardup_pairs_minhash(docs, text_col, id_col, **minhash_kwargs)
    jac = jaccard_pairs(docs, cands.select("doc_a", "doc_b"), text_col, id_col)
    return jac.filter(F.col("jaccard") >= threshold)


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    portable: bool = False,
) -> DataFrame:
    """(id, simhash): per-bit majority vote over token hashes.

    Computed entirely inside array expressions (one map pass): for bit i,
    sum over tokens of ±1 by the token-hash bit, then assemble the sign
    bits into one integer.
    """
    t = tokens(text_col)
    th = F.transform(t, lambda x: hash64(x, portable))
    def _vote(i: int) -> Column:
        return F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i) % 2 == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    bit_votes = [_vote(i) for i in range(bits)]
    code = None
    for i, v in enumerate(bit_votes):
        term = F.when(v > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        code = term if code is None else code + term
    return docs.select(id_col, code.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit codes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_blocks(
    codes: DataFrame,
    bits: int,
    n_blocks: int,
    id_col: str = "doc_id",
    code_col: str = "simhash",
) -> DataFrame:
    """Split each SimHash code into ``n_blocks`` contiguous bit blocks;
    output (id, block_idx, block_val, code) — the Manku et al. (WWW'07,
    public) candidate-bucket table.  Pigeonhole: two codes within
    hamming distance ``n_blocks − 1`` agree on at least one block, so an
    equi-join on (block_idx, block_val) has full recall at that radius.
    """
    width = bits // n_blocks
    widths = [width + (1 if i < bits % n_blocks else 0) for i in range(n_blocks)]
    blocks, off = [], 0
    for i, w in enumerate(widths):
        blocks.append(
            F.struct(
                F.lit(i).alias("block_idx"),
                (F.shiftright(F.col(code_col), off) % F.lit(1 << w)).alias(
                    "block_val"
                ),
            )
        )
        off += w
    return codes.select(
        id_col, code_col, F.explode(F.array(*blocks)).alias("b")
    ).select(id_col, code_col, "b.block_idx", "b.block_val")


def neardup_pairs_simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    n_blocks: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-duplicate pairs (Charikar fingerprint + Manku
    block-match candidates): docs sharing ≥1 of ``n_blocks`` bit blocks
    are candidates; verified by exact ``hamming64 ≤ max_hamming``.
    Output (doc_a, doc_b, hamming) with doc_a < doc_b.

    Recall is EXACT for ``max_hamming ≤ n_blocks − 1`` (pigeonhole on
    the blocks); larger radii need more blocks.  Scale shape matches the
    MinHash path: candidates come from an equi-join on
    (block_idx, block_val) — never all-pairs — and buckets larger than
    ``max_bucket`` (e.g. the empty-text all-zeros code) are dropped
    before the self-join, the standard degenerate-bucket guard.  The
    verify step is a bit_count on the pair row — no second text scan.
    """
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"neardup_pairs_simhash: max_hamming={max_hamming} exceeds the "
            f"block-match recall radius n_blocks-1={n_blocks - 1}; raise "
            "n_blocks"
        )
    # materialize codes once: the band explode + both join sides would
    # otherwise each inline the full per-bit vote expression tree
    # (projection collapse — same hazard as minhash signatures)
    codes = simhash(docs, text_col, id_col, bits, portable).localCheckpoint(
        eager=False
    )
    blocks = simhash_blocks(codes, bits, n_blocks, id_col)
    sizes = blocks.groupBy("block_idx", "block_val").agg(
        F.count(F.lit(1)).alias("sz")
    )
    blocks = blocks.join(
        sizes.filter(F.col("sz") <= max_bucket).select("block_idx", "block_val"),
        ["block_idx", "block_val"],
        "left_semi",
    )
    a = blocks.select(
        "block_idx", "block_val",
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("code_a"),
    )
    b = blocks.select(
        "block_idx", "block_val",
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("code_b"),
    )
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            hamming64(F.col("code_a"), F.col("code_b")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    n_blocks: int = 4,
    max_hamming: int = 3,
    max_rounds: int = 30,
    max_bucket: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """SimHash near-duplicate CLUSTERS with a canonical representative —
    the fingerprint twin of ``duplicate_clusters`` (MinHash/Jaccard) and
    ``embedding_dedup_clusters`` (cosine): block-match candidates →
    hamming verify (``neardup_pairs_simhash``) → hash-min connected
    components → keep-lowest policy.  Identical output contract:
    ``(id_col, cluster_id, is_canonical)``, one row per doc with ≥1
    near-duplicate; raises on a truncated CC fixpoint (a split cluster
    would silently keep duplicates).
    """
    from smatchpp_spark.operators.components import connected_components

    pairs = neardup_pairs_simhash(
        docs, text_col, id_col, bits, n_blocks, max_hamming, max_bucket,
        portable,
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges, max_supersteps=max_rounds)
    if not cc.converged:
        raise RuntimeError(
            "simhash_dedup_clusters: connected-components did not converge "
            f"within max_rounds={max_rounds} (pair-graph diameter exceeds "
            "the cap); raise max_rounds"
        )
    return cc.components.select(
        F.col("vertex").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("vertex") == F.col("component")).alias("is_canonical"),
    )


def neardup_pairs_embedding(
    emb: DataFrame,
    threshold: float = 0.9,
    planes: list[list[float]] | None = None,
    bits: int = 4,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 64,
    max_bucket: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket candidates
    (hashed hyperplanes + multi-probe on one side), verified by exact
    cosine ≥ ``threshold``; canonical (a < b) output.

    The 100 TB shape matches the MinHash path: candidates come from an
    equi-join on the bucket key, never all-pairs; the verify step runs
    only inside buckets.  Recall follows the ANN path's geometry — near
    duplicates have near-identical hyperplane margins, so they co-bucket
    or differ in the lowest-margin bit, which multi-probe covers.

    Bucket geometry at scale: with FIXED bits the expected bucket size
    grows with N and the in-bucket self-join goes quadratic (measured:
    10x input → 14.5x wall with 4 bits).  When ``planes`` is not given,
    ``bits`` therefore auto-scales to
    ``max(bits, ceil(log2(N / target_bucket)))`` (capped at 24) so the
    expected bucket size stays ~``target_bucket`` and candidate volume
    stays ~``N · target_bucket`` — linear.  Near-exact duplicates agree
    on almost every hyperplane sign, so recall survives the extra bits
    (multi-probe covers the low-margin flips).  ``max_bucket`` (optional)
    additionally drops oversized buckets before the join — the same
    degenerate-bucket guard as ``neardup_pairs_minhash`` (e.g. an
    all-zeros embedding cluster); dropped buckets lose their pairs, so
    the default is off and the knob is for adversarial inputs.
    """
    from smatchpp_spark.pipeline.similarity import (
        _to_double,
        cosine,
        margins_to_bucket,
        plane_margins,
        probe_buckets,
        random_planes,
    )

    if planes is None:
        first = emb.select(vec_col).first()
        if first is None or first[0] is None:
            # empty input: no pairs, matching the MinHash path's behavior
            return emb.select(
                F.col(id_col).alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0.0).alias("cosine_sim"),
            ).limit(0)
        n = emb.count()
        auto_bits = min(
            24, max(bits, math.ceil(math.log2(max(n, 1) / max(target_bucket, 1))))
            if n > target_bucket else bits,
        )
        planes = random_planes(len(first[0]), bits=auto_bits, seed=seed)
    bits = len(planes)
    margins = plane_margins(vec_col, planes)
    a = emb.select(
        F.col(id_col).alias("id_a"),
        _to_double(vec_col).alias("va"),
        F.explode(probe_buckets(margins, bits, probes)).alias("bucket"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        _to_double(vec_col).alias("vb"),
        margins_to_bucket(margins, bits).alias("bucket"),
    )
    if max_bucket is not None:
        ok = (
            b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") <= max_bucket)
            .select("bucket")
        )
        a = a.join(ok, "bucket", "left_semi")
        b = b.join(ok, "bucket", "left_semi")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def positional_ngrams(text_col: Column | str, k: int = 5) -> Column:
    """Array of word k-grams of the lowercased text IN POSITION ORDER
    (``posexplode`` recovers the 0-based token offset) — unlike
    ``shingles`` there is no distinct and no short-text fallback: a doc
    with fewer than k tokens has no k-gram and contributes no rows.

    Same zip_with-over-slices build as ``shingles`` (each slice
    references the token expression once — the projection-collapse-safe
    formulation)."""
    t = F.transform(tokens(text_col), F.lower)
    n = F.size(t)
    m = F.greatest(n - (k - 1), F.lit(0))
    grams = F.slice(t, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams,
            F.slice(t, j + 1, m),
            lambda acc, w: F.concat(acc, F.lit(" "), w),
        )
    return grams


def substring_dedup_spans(
    docs: DataFrame,
    ngram: int = 5,
    min_span: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Substring-level exact dedup — the n-gram inverted-index
    approximation of suffix-array span dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", public
    algorithm): find maximal TOKEN SPANS that are exactly repeated
    across documents, the complement of doc-level dedup (a 10-page doc
    embedding one plagiarized paragraph passes every whole-doc and
    near-dup filter; this catches the paragraph).

    Mechanics: every k-token gram is hashed; grams occurring in at
    least ``min_count`` DISTINCT documents are duplicate grams; per
    document, maximal runs of consecutive duplicate-gram positions
    become spans covering tokens ``[span_start, span_start + n_tokens)``
    and spans shorter than ``min_span`` tokens are dropped.

    Output: (doc_id, span_start int, n_tokens int) — 0-based token
    offsets into the lowercased whitespace tokenization.

    Scale shape: one posexplode map pass; one groupBy on the gram hash
    (uniform keys — hash-distributed, map-side combined distinct-doc
    count); one semi-join back on the hash; the run-merge window
    partitions BY DOCUMENT, so its sort is bounded by a single
    document's gram count, never by corpus size.  No all-pairs path —
    cost is linear in total tokens, the same budget as tokenizing."""
    grams = docs.select(
        F.col(id_col),
        F.posexplode(positional_ngrams(F.col(text_col), ngram)).alias(
            "pos", "gram"
        ),
    ).select(id_col, "pos", hash64(F.col("gram"), portable).alias("gh"))
    dup_hashes = (
        grams.groupBy("gh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_count)
        .select("gh")
    )
    dup_pos = grams.join(dup_hashes, "gh", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = dup_pos.withColumn(
        "run", F.col("pos") - F.row_number().over(w)
    )
    return (
        runs.groupBy(id_col, "run")
        .agg(F.min("pos").alias("span_start"), F.max("pos").alias("pmax"))
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            (F.col("pmax") - F.col("span_start") + ngram)
            .cast("int")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= min_span)
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    ngram: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Training-set decontamination by n-gram containment (the
    GPT-3/Pile-style procedure, public): a training document is
    CONTAMINATED when at least ``min_hits`` of its ``ngram``-token
    grams also occur in any evaluation document — the standard guard
    against benchmark leakage into training data.

    Output: one row per contaminated training document —
    ``(doc_id, n_hits int, n_grams int)`` with ``n_hits`` the number of
    gram POSITIONS matching the eval gram set and ``n_grams`` the
    document's total gram count (callers compute hit fractions or
    anti-join the ids to drop).  Clean documents are absent.

    Scale shape: the eval side (benchmarks — thousands of docs) reduces
    to a DISTINCT gram-hash set, typically small enough to broadcast;
    the corpus side is one posexplode map pass + the semi-join + one
    per-doc count — linear in corpus tokens, the same budget as
    ``substring_dedup_spans`` and no all-pairs path.
    """
    ev_text = eval_text_col or text_col
    eval_hashes = (
        eval_docs.select(
            F.explode(
                F.array_distinct(positional_ngrams(F.col(ev_text), ngram))
            ).alias("gram")
        )
        .select(hash64(F.col("gram"), portable).alias("gh"))
        .distinct()
    )
    grams = docs.select(
        F.col(id_col),
        F.posexplode(positional_ngrams(F.col(text_col), ngram)).alias(
            "pos", "gram"
        ),
    ).select(id_col, hash64(F.col("gram"), portable).alias("gh"))
    totals = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_grams")
    )
    hits = (
        grams.join(eval_hashes, "gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
    return hits.join(totals, id_col).select(id_col, "n_hits", "n_grams")


def duplicate_clusters(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rounds: int = 30,
    **minhash_kwargs,
) -> DataFrame:
    """Near-duplicate CLUSTERS with a canonical representative — the
    full training-data dedup composition: MinHash-LSH candidates →
    exact-Jaccard verification (``neardup_pairs_jaccard``) → hash-min
    connected components over the duplicate-pair graph
    (operators/components.py) → keep/drop decision per document.

    Output: one row per document that belongs to a duplicate cluster —
    ``(doc_id, cluster_id, is_canonical)`` with ``cluster_id`` = the
    minimum doc id in the cluster and ``is_canonical`` true on exactly
    that id (the standard keep-lowest policy; callers anti-join
    ``is_canonical = false`` rows to drop duplicates).  Documents with
    no near-duplicate are absent (they keep themselves trivially).

    Scale shape: the pair graph is SPARSE (LSH-bucketed candidate
    generation, never all-pairs), so CC over it touches only documents
    with at least one duplicate — a tiny fraction of the corpus at
    real-world duplication rates.
    """
    from smatchpp_spark.operators.components import connected_components

    pairs = neardup_pairs_jaccard(
        docs, threshold=threshold, text_col=text_col, id_col=id_col,
        **minhash_kwargs,
    )
    # keep the native id type: min-label CC then yields the NUMERIC
    # minimum as cluster id for integer ids (a string cast would make
    # it lexicographic — "10" < "9")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges, max_supersteps=max_rounds)
    if not cc.converged:
        # a truncated hash-min fixpoint leaves non-minimal labels: one
        # real cluster splits into several, each electing its own
        # canonical row — duplicates would silently survive the
        # keep-lowest policy, so fail loudly instead
        raise RuntimeError(
            "duplicate_clusters: connected-components did not converge "
            f"within max_rounds={max_rounds} (pair-graph diameter exceeds "
            "the cap); raise max_rounds"
        )
    return cc.components.select(
        F.col("vertex").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("vertex") == F.col("component")).alias("is_canonical"),
    )


def embedding_dedup_clusters(
    emb: DataFrame,
    threshold: float = 0.9,
    max_rounds: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **neardup_kwargs,
) -> DataFrame:
    """Semantic (embedding-space) near-duplicate CLUSTERS with a
    canonical representative — the SemDeDup-style composition
    (Abbas et al. 2023, public): sign-LSH candidate pairs verified by
    exact cosine (``neardup_pairs_embedding``) → hash-min connected
    components over the duplicate-pair graph → keep-lowest policy.

    The shingle-Jaccard twin of this composition is
    ``duplicate_clusters``; output contract is identical —
    ``(id_col, cluster_id, is_canonical)``, one row per vector that has
    at least one semantic near-duplicate, ``cluster_id`` = minimum
    vector id in the cluster, ``is_canonical`` true exactly there.
    Callers drop ``is_canonical = false`` rows to deduplicate.

    Scale shape: candidates come from the hyperplane-bucket equi-join
    (never all-pairs), the pair graph is sparse at real duplication
    rates, and CC touches only vectors with at least one duplicate.
    Raises if CC is truncated before the fixpoint — a split cluster
    would silently keep duplicates (``duplicate_clusters`` contract).
    """
    from smatchpp_spark.operators.components import connected_components

    pairs = neardup_pairs_embedding(
        emb, threshold=threshold, id_col=id_col, vec_col=vec_col,
        **neardup_kwargs,
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cc = connected_components(edges, max_supersteps=max_rounds)
    if not cc.converged:
        raise RuntimeError(
            "embedding_dedup_clusters: connected-components did not "
            f"converge within max_rounds={max_rounds} (pair-graph "
            "diameter exceeds the cap); raise max_rounds"
        )
    return cc.components.select(
        F.col("vertex").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("vertex") == F.col("component")).alias("is_canonical"),
    )


def source_similarity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Corpus-level overlap matrix between document GROUPS (sources /
    domains / dump snapshots): one union-MinHash signature per group —
    ``sig_i(G) = min over all shingles of all docs in G`` — then the
    pairwise signature agreement rate estimates the shingle-set Jaccard
    between groups (Broder 1997 resemblance, public; the MinHash of a
    union is the min of the MinHashes, so grouping by source instead of
    doc_id gives the group sketch for free).

    The "which dumps duplicate each other / which domains overlap"
    planning query every corpus refresh runs before dedup.

    Output: ``(src_a, src_b, est_jaccard)`` for all group pairs
    (src_a < src_b), plus each group's shingle signature row count
    folded in at K rows total — K groups means K·(K−1)/2 output rows
    regardless of corpus size.

    Scale shape at 100 TB: the ONLY corpus-scan stage is the
    (group, shingle) explode feeding one map-side-combined min
    aggregation (num_hashes longs per (partition, group)); the K-row
    signature table then cross-pairs driver-free (K² rows, broadcast
    territory).  No pairwise document work anywhere."""
    if num_hashes <= 0:
        raise ValueError(
            f"source_similarity: num_hashes must be positive, got {num_hashes}"
        )
    sigs = minhash_signatures(
        docs.select(F.col(group_col).alias("grp"), F.col(text_col)),
        text_col=text_col,
        id_col="grp",
        num_hashes=num_hashes,
        shingle_k=shingle_k,
        portable=portable,
    )
    a = sigs.select(F.col("grp").alias("src_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col("grp").alias("src_b"), F.col("sig").alias("sig_b"))
    pairs = a.crossJoin(b).filter(F.col("src_a") < F.col("src_b"))
    matches = F.size(
        F.filter(
            F.zip_with(
                "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
            ),
            lambda v: v == 1,
        )
    )
    return pairs.select(
        "src_a",
        "src_b",
        (matches.cast("double") / F.lit(float(num_hashes))).alias(
            "est_jaccard"
        ),
    )


def dedup_against(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """Cross-corpus (incremental-ingest) dedup: flag every ``new_docs``
    row that exactly or nearly duplicates something already in
    ``corpus_docs`` — the production path where yesterday's corpus is
    the index and today's crawl batch is the probe.  Within-batch
    duplicates are a separate concern (compose with ``exact_dedup`` /
    ``duplicate_clusters`` on the batch).

    Stages (both sides of every join are bucketed — nothing quadratic):
      1. exact — content-hash anti-semantics: a batch doc whose text
         hash exists in the corpus is ``exact_dup`` (match = min corpus
         id for that hash, deterministic).
      2. near — MinHash signatures on BOTH sides, LSH band keys, and a
         batch-bands ⋈ corpus-bands equi-join on (band_idx, band_hash).
         Corpus mega-buckets (> ``max_bucket``) are dropped before the
         join — the corpus side is the one that accumulates degenerate
         buckets over time.  Candidates verify with exact shingle
         Jaccard ≥ ``threshold``; best match per batch doc =
         ``min(struct(-jaccard, corpus_id))`` (one aggregation,
         deterministic argmax).

    Returns one row per ``new_docs`` row: (id, exact_dup, near_dup,
    match_id nullable, match_jaccard nullable).  ``near_dup`` is true
    only for VERIFIED near-duplicates; an exact dup is also reported
    through the near stage only if its bands survive the bucket guard
    (exact_dup is the authoritative bit for identical text).
    """
    # exact stage: corpus hash groups are the index
    corpus_hashes = (
        corpus_docs.select(
            hash64(F.col(text_col), portable).alias("content_hash"),
            F.col(id_col).alias("corpus_id"),
        )
        .groupBy("content_hash")
        .agg(F.min("corpus_id").alias("exact_match_id"))
    )
    exact = new_docs.select(
        F.col(id_col),
        hash64(F.col(text_col), portable).alias("content_hash"),
    ).join(corpus_hashes, "content_hash", "left")

    # near stage: signature tables once per side (projection-collapse
    # discipline of neardup_pairs_minhash)
    sig_new = minhash_signatures(
        new_docs, text_col, id_col, num_hashes, shingle_k, portable
    ).localCheckpoint(eager=False)
    sig_cor = minhash_signatures(
        corpus_docs, text_col, id_col, num_hashes, shingle_k, portable
    ).localCheckpoint(eager=False)
    bands_new = lsh_bands(sig_new, num_hashes, id_col, band_size, portable)
    bands_cor = lsh_bands(sig_cor, num_hashes, id_col, band_size, portable)
    cor_sizes = bands_cor.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    bands_cor = bands_cor.join(
        cor_sizes.filter(F.col("sz") <= max_bucket).select(
            "band_idx", "band_hash"
        ),
        ["band_idx", "band_hash"],
        "left_semi",
    )
    cands = (
        bands_new.select(
            "band_idx", "band_hash", F.col(id_col).alias("new_id")
        )
        .join(
            bands_cor.select(
                "band_idx", "band_hash", F.col(id_col).alias("corpus_id")
            ),
            ["band_idx", "band_hash"],
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    sh_new = new_docs.select(
        F.col(id_col).alias("new_id"), shingles(text_col, shingle_k).alias("sh_a")
    )
    sh_cor = corpus_docs.select(
        F.col(id_col).alias("corpus_id"),
        shingles(text_col, shingle_k).alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    verified = (
        cands.join(sh_new, "new_id")
        .join(sh_cor, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.when(union == 0, F.lit(0.0))
            .otherwise(inter.cast("double") / union)
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    best = (
        verified.groupBy("new_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("jaccard")).alias("nj"),
                    F.col("corpus_id").alias("cid"),
                )
            ).alias("b")
        )
        .select(
            F.col("new_id").alias(id_col),
            F.col("b.cid").alias("near_match_id"),
            (-F.col("b.nj")).alias("near_jaccard"),
        )
    )
    return (
        exact.join(best, id_col, "left")
        .select(
            id_col,
            F.col("exact_match_id").isNotNull().alias("exact_dup"),
            F.col("near_match_id").isNotNull().alias("near_dup"),
            F.coalesce("exact_match_id", "near_match_id").alias("match_id"),
            F.when(F.col("exact_match_id").isNotNull(), F.lit(1.0))
            .otherwise(F.col("near_jaccard"))
            .alias("match_jaccard"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """Asymmetric near-CONTAINMENT pairs (Broder 1997): containment
    c(A→B) = |S(A) ∩ S(B)| / |S(A)| — how much of A's shingle set lives
    inside B.  Catches the duplicates symmetric Jaccard misses: a short
    doc quoted wholesale inside a long one scores Jaccard ≈ |A|/|B|
    (tiny) but containment ≈ 1.

    Candidates come from the SAME MinHash LSH band join as
    ``neardup_pairs_minhash`` (minhash still concentrates around
    Jaccard, so pure-containment pairs with tiny Jaccard can be missed
    by banding — the documented trade; lower ``band_size`` raises
    recall).  Verification is exact on the shingle sets.  Output one
    row per candidate pair with ``containment_ab``/``containment_ba``
    where either direction clears ``threshold``, ``doc_a < doc_b``.
    """
    sigs = minhash_signatures(
        docs, text_col, id_col, num_hashes, shingle_k, portable
    ).localCheckpoint(eager=False)
    bands = lsh_bands(sigs, num_hashes, id_col, band_size, portable)
    sizes = bands.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("sz")
    )
    bands = bands.join(
        sizes.filter(F.col("sz") <= max_bucket).select("band_idx", "band_hash"),
        ["band_idx", "band_hash"],
        "left_semi",
    )
    a = bands.select("band_idx", "band_hash", F.col(id_col).alias("doc_a"))
    b = bands.select("band_idx", "band_hash", F.col(id_col).alias("doc_b"))
    cands = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh = docs.select(F.col(id_col), shingles(text_col, shingle_k).alias("sh"))
    sa = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    c_ab = F.when(F.size("sh_a") == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / F.size("sh_a")
    )
    c_ba = F.when(F.size("sh_b") == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / F.size("sh_b")
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(c_ab, 9).alias("containment_ab"),
            F.round(c_ba, 9).alias("containment_ba"),
        )
        .filter(
            (F.col("containment_ab") >= threshold)
            | (F.col("containment_ba") >= threshold)
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003):
    hash every positional word ``k``-gram, slide a ``window`` over the
    hash sequence, keep each window's minimal hash (ties → RIGHTMOST,
    the classic rule that makes consecutive windows reuse the same
    pick), and emit the distinct survivors per doc.  Guarantees every
    shared run of ≥ ``window + k − 1`` tokens shares a fingerprint —
    the code-clone / plagiarism detector for a source-code corpus,
    robust to insertions between shared blocks (where full-doc minhash
    dilutes).

    Output (id, fp long) — one row per distinct fingerprint.  The
    window minimum is an elementwise ``least`` fold over ``window``
    shifted SLICES of the staged (hash, −pos) struct array (each slice
    references the materialized column once — the projection-collapse-
    safe formulation; a nested element_at scan would re-inline the
    tokenize+hash tree per access).  Docs with fewer than
    ``k + window − 1`` tokens emit nothing.
    """
    grams = positional_ngrams(text_col, k)
    hs = F.transform(grams, lambda g: hash64(g, portable))
    staged = docs.select(
        F.col(id_col),
        F.transform(
            hs,
            lambda h, i: F.struct(h.alias("h"), (-i).cast("long").alias("np")),
        ).alias("s"),
    ).localCheckpoint(eager=False)
    m = F.greatest(F.size(F.col("s")) - (window - 1), F.lit(0))
    acc = F.slice(F.col("s"), 1, m)
    for j in range(1, window):
        acc = F.zip_with(
            acc, F.slice(F.col("s"), j + 1, m), lambda a, b: F.least(a, b)
        )
    return staged.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.transform(acc, lambda x: x["h"]))
        ).alias("fp"),
    )


def clone_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1000,
    portable: bool = False,
) -> DataFrame:
    """Code-clone candidate pairs by winnowing-fingerprint overlap:
    ``shared / min(|fp_a|, |fp_b|) ≥ threshold`` (containment-style
    normalization — a file pasted into a larger one still scores 1.0).
    Fingerprints shared by more than ``max_bucket`` docs are dropped
    before the self-join (boilerplate headers are the degenerate
    buckets of code corpora).  Output (doc_a, doc_b, shared_fps,
    overlap rounded 9), doc_a < doc_b.
    """
    fps = winnow_fingerprints(
        docs, k, window, text_col, id_col, portable
    ).localCheckpoint(eager=False)
    counts = fps.groupBy(id_col).agg(F.count(F.lit(1)).alias("nfp"))
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") <= max_bucket)
        .select("fp")
    )
    pruned = fps.join(keep, "fp", "left_semi")
    a = pruned.select("fp", F.col(id_col).alias("doc_a"))
    b = pruned.select("fp", F.col(id_col).alias("doc_b"))
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    ca = counts.select(F.col(id_col).alias("doc_a"), F.col("nfp").alias("na"))
    cb = counts.select(F.col(id_col).alias("doc_b"), F.col("nfp").alias("nb"))
    return (
        shared.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            F.round(
                F.col("shared_fps") / F.least("na", "nb"), 9
            ).alias("overlap"),
        )
        .filter(F.col("overlap") >= threshold)
    )
