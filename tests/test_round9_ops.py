"""Round-9: r8 ADVICE fixes — the persist-handle re-track leak class
(q_idf_jaccard_pairs / q_cluster_purity_nmi / q_semdedup_capped and the
17 older queries with the same shape), plus the structural guard that
keeps the class extinct: building ANY registry plan and releasing it
must leave Spark's SQL cache empty."""

from __future__ import annotations

import pytest


@pytest.mark.single_leg
def test_release_leaves_no_cached_plans(spark):
    """Every registry query builder must route tracked persist handles
    to its RETURNED frame (``_carry`` in plans/queries.py): a
    ``.select()``/``.orderBy()`` chained on a tracked frame returns a
    NEW DataFrame without ``_d2b_persisted``, and ``cache.release``
    then silently leaks the cached intermediate for the rest of the
    bench/gate session (the r8 ADVICE finding class).

    The check is exact and cheap per query: ``persist()``/``cache()``
    register the plan in Spark's CacheManager at BUILD time (no
    execution needed), and ``release()`` must empty it again.  Queries
    that execute driver-side jobs while building (kmeans seeds, graph
    peels) still only run sf0.001-sized work.
    """
    from d2b_dataframework_spark.datapipe import cache
    from d2b_dataframework_spark.plans.queries import REGISTRY

    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    sf = "/root/testdata/sf0.001"
    leaks: list[str] = []
    for name, spec in REGISTRY.items():
        df = spec.spark(spark, sf)
        cache.release(df)
        if not cm.isEmpty():
            leaks.append(name)
            cm.clearCache()
    assert not leaks, (
        f"queries leaking cached frames after release(): {leaks} — "
        "wrap the returned frame with _carry(result, *tracked_sources)"
    )


@pytest.mark.single_leg
def test_carry_attaches_all_source_handles(spark):
    """_carry must collect ``_d2b_persisted`` from EVERY source and
    attach the union to the result (q_contrastive_pairs carries two
    independent tracked frames)."""
    from d2b_dataframework_spark.datapipe.cache import track
    from d2b_dataframework_spark.plans.queries import _carry

    a = spark.range(3)
    b = spark.range(4)
    h1 = spark.range(5).persist()
    h2 = spark.range(6).persist()
    try:
        src1 = track(a.select("id"), h1)
        src2 = track(b.select("id"), h2)
        out = _carry(src1.union(src2), src1, src2)
        handles = list(getattr(out, "_d2b_persisted", ()))
        assert h1 in handles and h2 in handles
    finally:
        h1.unpersist()
        h2.unpersist()


def test_remove_duplicate_spans_excises_planted_block(spark):
    """A 12-token block copied between two docs must disappear from
    BOTH partners (merged-interval excision), the unique remainder must
    survive verbatim, and an untouched doc must pass through with
    removed_tokens = 0 and its normalized text."""
    from d2b_dataframework_spark.datapipe import dedup as dd

    block = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [
        (1, f"one unique opening here {block} and a distinct tail one"),
        (2, f"two other start text now {block} totally different ending two"),
        (3, "independent document with no copied material at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = dd.duplicate_spans(docs, min_run=5, n=3, max_df=50)
    out = {
        r["doc_id"]: r
        for r in dd.remove_duplicate_spans(docs, spans).collect()
    }
    for tok in block.split():
        assert tok not in out[1]["cleaned_text"].split()
        assert tok not in out[2]["cleaned_text"].split()
    assert "opening" in out[1]["cleaned_text"].split()
    assert "ending" in out[2]["cleaned_text"].split()
    assert out[1]["removed_tokens"] == 12
    assert out[2]["removed_tokens"] == 12
    assert out[3]["removed_tokens"] == 0
    assert out[3]["cleaned_text"] == rows[2][1]
    assert out[1]["n_tokens"] == len(rows[0][1].split())
    assert out[1]["removed_share"] == pytest.approx(12 / out[1]["n_tokens"], abs=1e-6)


def test_remove_duplicate_spans_merges_overlapping_intervals(spark):
    """Two overlapping reported intervals on one doc must merge before
    excision — tokens in the overlap are removed once, never counted
    twice (removed_tokens = union length, not sum of spans)."""
    from d2b_dataframework_spark.datapipe import dedup as dd

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        # doc 1 intervals [2,7) and [5,9) -> union [2,9) = 7 tokens
        [(1, 99, 2, 0, 5, 5), (1, 98, 5, 0, 4, 4)],
        "id_a long, id_b long, start_a long, start_b long, "
        "run_grams long, span_tokens long",
    )
    row = dd.remove_duplicate_spans(docs, spans).filter("doc_id = 1").collect()[0]
    assert row["removed_tokens"] == 7
    assert row["cleaned_text"] == "t0 t1 t9"


def test_canonicalize_url_contract(spark):
    """The documented canonical form: case, www, default ports,
    fragments, tracking params, param order, trailing slashes — and
    the things that must NOT collapse (non-default port, real params)."""
    from d2b_dataframework_spark.datapipe.web import canonicalize_url

    cases = [
        # (raw, expected canonical)
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_x=1&b=2&a=1#f", "https://ex.com/a/b?a=1&b=2"),
        ("https://ex.com/a/b?a=1&b=2", "https://ex.com/a/b?a=1&b=2"),
        ("http://ex.com:80/", "http://ex.com"),
        ("http://ex.com:8080/p", "http://ex.com:8080/p"),
        ("https://ex.com/p?fbclid=abc&gclid=x&ref=tw", "https://ex.com/p"),
        ("https://ex.com/p?z=1&utm_campaign=c&y=2", "https://ex.com/p?y=2&z=1"),
        ("https://www.ex.com", "https://ex.com"),
        ("https://ex.com///", "https://ex.com"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [e for _, e in cases]


def test_host_dedup_rollup_counts(spark):
    from d2b_dataframework_spark.datapipe.web import host_dedup_rollup

    df = spark.createDataFrame(
        [
            ("HTTPS://A.com/x?utm_a=1",),
            ("https://a.com/x",),
            ("https://a.com/y",),
            ("http://b.com/only",),
        ],
        "url string",
    )
    rows = {r["host"]: r for r in host_dedup_rollup(df).collect()}
    assert rows["a.com"]["n_records"] == 3
    assert rows["a.com"]["n_raw"] == 3
    assert rows["a.com"]["n_canonical"] == 2
    assert rows["a.com"]["dup_rate"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert rows["b.com"]["n_canonical"] == 1 and rows["b.com"]["dup_rate"] == 0.0


def test_remove_repeated_lines_corpus_wide(spark):
    """A line repeated across more than max_df distinct docs is removed
    from every doc; under-cap shared lines and unique lines survive in
    original order; repeats WITHIN one doc count once toward df."""
    from d2b_dataframework_spark.datapipe import dedup as dd

    footer = "copyright footer"
    docs = spark.createDataFrame(
        [
            (1, f"unique one\n{footer}\nshared pair"),
            (2, f"{footer}\nunique two\nshared pair"),
            (3, f"unique three\n{footer}\n{footer}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dd.remove_repeated_lines(docs, max_df=2).collect()
    }
    # footer df = 3 docs > 2 -> removed everywhere; "shared pair" df = 2 kept
    assert out[1]["cleaned_text"] == "unique one\nshared pair"
    assert out[2]["cleaned_text"] == "unique two\nshared pair"
    assert out[3]["cleaned_text"] == "unique three"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 1
    assert out[3]["n_lines"] == 3 and out[3]["n_removed"] == 2


def test_chunk_language_mix_detects_code_switching(spark):
    """Pure, mixed, and unknown-only docs: the minority chunk must be
    localized (mixed flag), zero-hit chunks must never vote, and a pure
    doc must stay unmixed with dom_share 1.0."""
    from d2b_dataframework_spark.datapipe.text import STOPWORDS, chunk_language_mix

    de = " ".join(STOPWORDS["de"] * 4)   # one full 32-token chunk
    en = " ".join(STOPWORDS["en"] * 4)
    fr = " ".join(STOPWORDS["fr"] * 4)
    docs = spark.createDataFrame(
        [
            (1, f"{de} {de}"),                 # pure: 2 de chunks
            (2, f"{en} {fr}"),                 # mixed 50/50
            (3, "xx yy zz qq " * 8),           # unknown only
            (4, f"{de} {de} {de} {en}"),       # 75/25 -> mixed at the boundary
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in chunk_language_mix(docs, 32).collect()}
    assert out[1]["dom_lang"] == "de" and out[1]["dom_share"] == 1.0
    assert out[1]["is_mixed"] is False
    assert out[2]["is_mixed"] is True and out[2]["n_langs"] == 2
    assert out[2]["dom_share"] == 0.5
    assert out[3]["n_known"] == 0 and out[3]["dom_lang"] is None
    assert out[3]["is_mixed"] is False
    assert out[4]["dom_lang"] == "de" and out[4]["dom_share"] == 0.75
    assert out[4]["is_mixed"] is True  # <= 0.75 boundary is mixed


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every near-dup cluster member gets the SAME split (the hash is
    over the cluster id); singletons are their own cluster and still
    get an assignment."""
    from d2b_dataframework_spark.datapipe.splits import leakage_safe_split

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 21)], "doc_id long"
    )
    # clusters: {1,2,3}, {4,5}; 6..20 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    rows = leakage_safe_split(docs, pairs).collect()
    assert len(rows) == 20
    by_doc = {r["doc_id"]: r for r in rows}
    assert (
        by_doc[1]["split"] == by_doc[2]["split"] == by_doc[3]["split"]
    )
    assert by_doc[1]["cluster_id"] == by_doc[2]["cluster_id"] == 1
    assert by_doc[4]["split"] == by_doc[5]["split"]
    assert by_doc[7]["cluster_id"] == 7  # singleton
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # invariant over the whole frame: one split per cluster
    from collections import defaultdict

    seen = defaultdict(set)
    for r in rows:
        seen[r["cluster_id"]].add(r["split"])
    assert all(len(s) == 1 for s in seen.values())


def test_token_budget_sample_frontier(spark):
    """Selection stops at the first doc whose inclusion would overflow
    the cell budget; ranking is quality-desc with doc-id tiebreak and
    never crosses cells."""
    from d2b_dataframework_spark.datapipe.splits import token_budget_sample

    scored = spark.createDataFrame(
        [
            (1, "en", 0.9, 50),
            (2, "en", 0.8, 40),
            (3, "en", 0.7, 30),   # cum 120 > 100 -> dropped
            (4, "en", 0.6, 5),    # below the frontier -> also dropped
            (5, "de", 0.1, 60),   # other cell: own budget
        ],
        "doc_id long, lang string, quality double, n_tokens long",
    )
    rows = {r["doc_id"]: r for r in token_budget_sample(scored, 100).collect()}
    assert set(rows) == {1, 2, 5}
    assert rows[1]["rank"] == 1 and rows[1]["cum_tokens"] == 50
    assert rows[2]["rank"] == 2 and rows[2]["cum_tokens"] == 90
    assert rows[5]["rank"] == 1 and rows[5]["cum_tokens"] == 60
