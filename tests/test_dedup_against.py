"""Cross-corpus dedup: planted exact/near/unique docs, corpus-side
bucket guard, deterministic best match."""

from __future__ import annotations

from pyspark.sql import functions as F

from smatchpp_spark.pipeline.dedup import dedup_against

CORPUS = [
    (100, "the quick brown fox jumps over the lazy dog again and again"),
    (101, "pack my box with five dozen liquor jugs for the long trip"),
    (102, "completely unrelated corpus text about distributed systems"),
]
BATCH = [
    # verbatim copy of corpus 100
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    # near copy of corpus 101 (one word changed)
    (2, "pack my box with five dozen liquor jugs for the short trip"),
    # genuinely new
    (3, "a brand new document with entirely fresh vocabulary inside"),
]


def _run(spark, **kw):
    new = spark.createDataFrame(BATCH, "doc_id long, text string")
    cor = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in dedup_against(new, cor, threshold=0.5, band_size=1, **kw).collect()
    }


def test_exact_near_and_unique(spark):
    got = _run(spark)
    assert len(got) == 3  # one row per batch doc, droppers and keepers
    assert got[1].exact_dup and got[1].match_id == 100
    assert got[1].match_jaccard == 1.0
    assert (not got[2].exact_dup) and got[2].near_dup
    assert got[2].match_id == 101 and 0.5 <= got[2].match_jaccard < 1.0
    assert not got[3].exact_dup and not got[3].near_dup
    assert got[3].match_id is None and got[3].match_jaccard is None


def test_best_match_deterministic_tie(spark):
    # two identical corpus docs → best near match = min corpus id
    cor = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta eta theta"),
         (5, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta iota")],
        "doc_id long, text string",
    )
    r = dedup_against(new, cor, threshold=0.3, band_size=1).collect()[0]
    assert r.near_dup and r.match_id == 5


def test_corpus_bucket_guard_drops_megabuckets(spark):
    # 50 identical corpus docs form one mega-bucket per band; with
    # max_bucket=10 the near stage must skip them (exact stage still
    # catches verbatim copies)
    cor = spark.createDataFrame(
        [(i, "same boilerplate text repeated all over the corpus")
         for i in range(50)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(900, "same boilerplate text repeated all over the corpus"),
         (901, "same boilerplate text repeated all over the place")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in dedup_against(new, cor, threshold=0.3, band_size=1, max_bucket=10).collect()
    }
    assert got[900].exact_dup and got[900].match_id == 0
    assert not got[900].near_dup  # bucket guard suppressed the near stage
    assert not got[901].near_dup  # near-match hidden by the guard: the
    # documented trade — the guard keeps the join linear; boilerplate
    # this common is line-dedup territory, not near-dup territory
    n = dedup_against(new, cor, threshold=0.3, band_size=1, max_bucket=100)
    got2 = {r.doc_id: r for r in n.collect()}
    assert got2[901].near_dup  # with room, the same match is found


def test_containment_catches_subset_duplicates(spark):
    from smatchpp_spark.pipeline.dedup import containment_pairs

    long_text = " ".join(f"w{i}" for i in range(60))
    short = " ".join(f"w{i}" for i in range(20, 35))  # verbatim slice
    docs = [(1, long_text), (2, short),
            (3, "x y z entirely other words here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {(r.doc_a, r.doc_b): (r.containment_ab, r.containment_ba)
            for r in containment_pairs(df, threshold=0.8, band_size=1).collect()}
    # the short doc is fully contained: c(B->A) = 1.0 even though
    # symmetric Jaccard is ~0.22 (below every dedup threshold)
    assert rows[(1, 2)][1] == 1.0
    assert rows[(1, 2)][0] < 0.3
    assert all(p == (1, 2) for p in rows)  # unrelated doc produces nothing


def test_containment_symmetric_for_identical_docs(spark):
    from smatchpp_spark.pipeline.dedup import containment_pairs

    t = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    r = containment_pairs(df, threshold=0.8, band_size=1).collect()[0]
    assert r.containment_ab == 1.0 and r.containment_ba == 1.0
