"""Datapipe operator tests: dedup / similarity / text-analysis scale
paths (the training-data-pipeline layer)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from d2b_dataframework_spark.datapipe import cache
from d2b_dataframework_spark.datapipe import dedup as dd
from d2b_dataframework_spark.datapipe import similarity as sim
from d2b_dataframework_spark.datapipe import text as dt


@pytest.fixture(scope="module")
def vectors(spark):
    """16 base vectors + near-identical copies of the first 3."""
    import math

    rows = []
    for i in range(16):
        v = [math.sin(0.1 * (i + 1) * (d + 1)) for d in range(64)]
        rows.append((i, v))
    for i in range(3):
        v = [math.sin(0.1 * (i + 1) * (d + 1)) for d in range(64)]
        v[0] += 0.01
        rows.append((100 + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_near_dup_finds_planted_pairs(vectors):
    out = sim.cosine_near_dup_pairs(vectors, threshold=0.98)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert {(0, 100), (1, 101), (2, 102)} <= pairs
    assert all(r["cosine_sim"] >= 0.98 for r in out.collect())


def test_ivf_agrees_with_brute_force_on_probed_lists(vectors):
    queries = vectors.filter(F.col("vec_id") < 2)
    exact = sim.brute_force_topk(vectors, queries, k=3)
    approx = sim.ivf_topk(vectors, queries, k=3, nlist=4, nprobe=4)
    # nprobe == nlist → every list probed → identical to brute force
    e = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
    a = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in approx.collect()}
    assert e == a


def test_pair_builders_release_persisted_intermediates(vectors):
    """The persisted signature tables must be releasable by the caller —
    a long-lived session otherwise accumulates cached blocks."""
    out = sim.cosine_near_dup_pairs(vectors, threshold=0.98)
    out.collect()
    handles = getattr(out, "_d2b_persisted")
    assert handles and all(h.is_cached for h in handles)
    cache.release(out)
    assert all(not h.is_cached for h in handles)


def test_ivf_assignment_is_map_side(vectors):
    """List assignment must be a projection over literal centroids: the
    only Window in the plan is the final top-k rank, and there is no
    cross join anywhere (round-1 shape shuffled nlist× the corpus
    through a row_number window — VERDICT r1 Performance #1)."""
    queries = vectors.filter(F.col("vec_id") < 2)
    out = sim.ivf_topk(vectors, queries, k=3, nlist=4, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # "Window [" is the exec node; WindowGroupLimit (rank pushdown) is fine.
    assert plan.count("Window [") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_vectorized_matches_declarative(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "the quick brown fox jumps over the lazy cat")],
        "doc_id long, text string",
    )
    fast = {r["doc_id"]: r["simhash"]
            for r in dd.simhash(docs, vectorized=True, shingle_n=3).collect()}
    slow = {r["doc_id"]: r["simhash"]
            for r in dd.simhash(docs, vectorized=False, shingle_n=3).collect()}
    assert fast == slow
    fast_w = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs, vectorized=True).collect()}
    slow_w = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs, vectorized=False).collect()}
    assert fast_w == slow_w


def test_vectorized_twins_match_declarative_on_unicode(spark):
    """Unicode parity (VERDICT r1 caveat): accented text, a non-breaking
    space (Python \\s matches it, Java \\s does not — the twin must use
    Java semantics), Greek with a final sigma, CJK without spaces, and
    uppercase accents that lowercase multi-byte."""
    docs = spark.createDataFrame(
        [
            (1, "El Ñandú corrió rápido hacia el árbol más alto"),
            (2, "voici des mots collés par une espace insécable"),
            (3, "ΤΟ ΓΡΗΓΟΡΟ ΚΑΦΕ ΑΛΕΠΟΥ ΠΗΔΑΕΙ ΨΗΛΑ ΟΜΩΣ"),
            (4, "日本語のテキスト 分かち書き なし でも 同じ ハッシュ"),
            (5, "ÉCOLE FRANÇAISE Straße GROSSE Übung MÜDE"),
        ],
        "doc_id long, text string",
    )
    for kwargs in ({"shingle_n": 3}, {"shingle_n": None}):
        fast = {r["doc_id"]: r["simhash"]
                for r in dd.simhash(docs, vectorized=True, **kwargs).collect()}
        slow = {r["doc_id"]: r["simhash"]
                for r in dd.simhash(docs, vectorized=False, **kwargs).collect()}
        assert fast == slow, f"simhash diverges on unicode ({kwargs})"
    cols = ["token_hashes"] + [f"mh_{i}" for i in range(dd.N_HASHES)]
    fast_m = {r["doc_id"]: tuple(sorted(r["token_hashes"])) + tuple(r[c] for c in cols[1:])
              for r in dd.minhash_signatures(docs, vectorized=True).collect()}
    slow_m = {r["doc_id"]: tuple(sorted(r["token_hashes"])) + tuple(r[c] for c in cols[1:])
              for r in dd.minhash_signatures(docs, vectorized=False).collect()}
    assert fast_m == slow_m, "minhash diverges on unicode"


def test_filter_documents_thresholds_and_allowlist(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and that is all of the story today"),  # en, keeps
            (2, "tiny"),                                                        # too short
            (3, "el perro corre en la casa y los gatos de el barrio un dia"),   # es
        ],
        "doc_id long, text string",
    )
    kept = dt.filter_documents(df, min_tokens=5, min_quality=0.0)
    assert {r["doc_id"] for r in kept.collect()} == {1, 3}
    en_only = dt.filter_documents(df, min_tokens=5, min_quality=0.0, allowed_langs=["en"])
    rows = {r["doc_id"]: r["lang_pred"] for r in en_only.collect()}
    assert rows == {1: "en"}


def test_clean_text_scrubs_markup_urls_emails(spark):
    df = spark.createDataFrame(
        [(1, '<b>Hello</b> World visit Https://x.io/a?z=1 mail A.B@c.io now')],
        "doc_id long, text string",
    )
    out = df.select(dt.clean_text("text").alias("t")).collect()[0]["t"]
    assert out == "hello world visit mail now"


def test_chunk_documents_overlap_and_tail(spark):
    # 10 tokens, chunk 4, overlap 2 → stride 2: starts 0,2,4,6,8
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    rows = dt.chunk_documents(df, chunk_size=4, overlap=2, clean=False).collect()
    got = [(r["chunk_id"], r["chunk_text"], r["n_tokens"]) for r in rows]
    assert got == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t2 t3 t4 t5", 4),
        (2, "t4 t5 t6 t7", 4),
        (3, "t6 t7 t8 t9", 4),
        (4, "t8 t9", 2),  # short tail kept, unpadded
    ]
    with pytest.raises(ValueError, match="overlap"):
        dt.chunk_documents(df, chunk_size=4, overlap=4)


def test_connected_components_chain_and_islands(spark):
    """A 4-chain (needs label propagation across hops), a 2-island, and
    a triangle — min id labels every member of its component."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain: all → 1
         (10, 11),                      # island: both → 10
         (20, 21), (21, 22), (20, 22)], # triangle: all → 20
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dd.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_simhash_near_dup_pigeonhole(spark):
    base_words = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(base_words)),
            (2, " ".join(base_words[:-1] + ["extra"])),  # 1-word edit
            (3, " ".join(f"z{i}" for i in range(50))),  # unrelated
        ],
        "doc_id long, text string",
    )
    out = dd.simhash_near_dup_pairs(docs, max_hamming=3)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_token_bpe_stats(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, world! 42 times"), (2, "aaa aaa")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dt.token_bpe_stats(docs).collect()}
    # "hello , world ! 42 times" → pieces: hello , world ! 42 times = 6
    assert out[1]["n_pieces"] == 6
    assert out[1]["n_unique_pieces"] == 6
    assert out[2]["n_pieces"] == 2 and out[2]["n_unique_pieces"] == 1
    # chars_per_piece: non-space chars / pieces = 6/2 = 3
    assert out[2]["chars_per_piece"] == pytest.approx(3.0)


def test_exact_and_minhash_dedup_consistency(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four five six seven"),
         (2, "one two three four five six seven"),
         (3, "something else entirely different now")],
        "doc_id long, text string",
    )
    exact = dd.exact_duplicates(docs).collect()
    assert len(exact) == 1 and exact[0]["n_docs"] == 2 and exact[0]["canonical_id"] == 1
    mh = dd.minhash_duplicate_pairs(docs, threshold=0.9)
    assert {(r["id_a"], r["id_b"]) for r in mh.collect()} == {(1, 2)}


def test_multimodal_image_features_plumbing(spark):
    from d2b_dataframework_spark.datapipe.multimodal import (
        ASSET_SCHEMA,
        extract_image_features,
        sample_video_frames,
    )

    assets = spark.createDataFrame(
        [
            ("a1", "image", bytes(range(200)), {"src": "cam"}),
            ("a2", "image", b"", None),
            ("a3", "audio", b"\x00" * 50, None),  # filtered before Python
            ("v1", "video", b"\x01" * 4096, None),
        ],
        ASSET_SCHEMA,
    )
    feats = extract_image_features(assets, feature_dim=8)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert set(rows) == {"a1", "a2"}  # modality filter pushed before UDF
    assert rows["a1"]["n_bytes"] == 200 and len(rows["a1"]["features"]) == 8
    assert rows["a2"]["width"] == 64 and rows["a2"]["features"] == [0.0] * 8
    # determinism: same bytes → same features
    feats2 = {r["asset_id"]: r for r in extract_image_features(assets, 8).collect()}
    assert feats2["a1"]["features"] == rows["a1"]["features"]

    frames = sample_video_frames(assets, every_n=2).collect()
    assert all(r["asset_id"] == "v1" for r in frames)
    assert [r["frame_index"] for r in frames] == [0, 2]  # 4 frames, step 2


# ---------------------------------------------------------------------------
# repetition signals / PII / splits
# ---------------------------------------------------------------------------


def test_repetition_signals_values(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam eggs"),      # top tok 3/4, bigram "spam spam" 2/3
            (2, "all words differ here"),
            (3, "one"),                       # single token: bigram frac 0
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dt.repetition_signals(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_token_ratio"] == 0.5          # 2 unique / 4
    assert r1["top_token_frac"] == 0.75
    assert r1["top_bigram_frac"] == round(2 / 3, 6)
    r2 = rows[2]
    assert r2["dup_token_ratio"] == 0.0 and r2["top_token_frac"] == 0.25
    assert rows[3]["top_bigram_frac"] == 0.0


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "Mail Bob.Smith@corp.EXAMPLE.com or +1 555 0100 from 10.0.0.7"),
            (2, "card 4111111111111111 twice 4111111111111111"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dt.pii_scrub(df).collect()}
    r1 = rows[1]
    assert (r1["n_email"], r1["n_phone"], r1["n_ipv4"]) == (1, 1, 1)
    assert r1["text"] == "mail <EMAIL> or <PHONE> from <IP>"
    assert rows[2]["n_card"] == 2
    assert rows[2]["text"] == "card <CARD> twice <CARD>"
    r3 = rows[3]
    assert (r3["n_email"], r3["n_ipv4"], r3["n_card"], r3["n_phone"]) == (0, 0, 0, 0)
    assert r3["text"] == "clean text only"


def test_assign_split_deterministic_and_partitioning_invariant(spark):
    from d2b_dataframework_spark.datapipe.splits import assign_split

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in assign_split(df).collect()}
    b = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in assign_split(df.repartition(7)).collect()
    }
    assert a == b  # pure function of id, independent of layout
    assert all(0 <= v[0] < 10 for v in a.values())
    splits = {v[1] for v in a.values()}
    assert splits == {"train", "val", "test"}
    n_train = sum(1 for v in a.values() if v[1] == "train")
    assert 120 < n_train < 190  # ~80% of 200


def test_assign_split_custom_weights_cover_all_buckets(spark):
    from d2b_dataframework_spark.datapipe.splits import assign_split

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    out = assign_split(df, weights={"a": 1, "b": 1}).collect()
    assert all(r["split"] in ("a", "b") for r in out)


def test_sample_per_group_exact_n_and_stable(spark):
    from d2b_dataframework_spark.datapipe.splits import sample_per_group

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(60)], "doc_id long, lang string"
    )
    s1 = sample_per_group(df, "lang", 5)
    assert s1.groupBy("lang").count().collect()[0]["count"] == 5
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in sample_per_group(df.repartition(11), "lang", 5).collect())
    assert ids1 == ids2


def test_connected_components_star_chain_and_equivalence(spark):
    import random

    def labels(df):
        return {r["doc_id"]: r["cluster_id"] for r in df.collect()}

    # adversarial chain: diameter >> O(log n) star rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a long, id_b long"
    )
    ls = labels(dd.connected_components_star(chain))
    assert len(ls) == 60 and set(ls.values()) == {0}

    random.seed(3)
    edges = [(random.randrange(40), random.randrange(40)) for _ in range(45)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    assert labels(dd.connected_components_star(df)) == labels(
        dd.connected_components(df)
    )


def test_connected_components_star_singleton_and_selfloop(spark):
    df = spark.createDataFrame([(5, 5), (7, 8)], "id_a long, id_b long")
    out = {r["doc_id"]: r["cluster_id"]
           for r in dd.connected_components_star(df).collect()}
    assert out == {5: 5, 7: 7, 8: 7}


def test_pack_plan_offsets_contiguous_and_budgeted(spark):
    from d2b_dataframework_spark.datapipe.packing import pack_plan

    df = spark.createDataFrame(
        [(i, "s", 100) for i in range(10)], "doc_id long, shard string, n_tokens long"
    )
    rows = sorted(
        pack_plan(df, budget=256, partition_cols=["shard"]).collect(),
        key=lambda r: (r["pack_id"], r["offset_in_pack"]),
    )
    # stream of 10x100 tokens cut every 256: offsets are 0,100,200,300,...
    offs = [r["pack_id"] * 256 + r["offset_in_pack"] for r in rows]
    assert offs == [i * 100 for i in range(10)]
    assert all(0 <= r["offset_in_pack"] < 256 for r in rows)
    assert rows[-1]["pack_id"] == 900 // 256


def test_pack_plan_deterministic_under_repartition(spark):
    from d2b_dataframework_spark.datapipe.packing import pack_plan

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), 10 + i) for i in range(40)],
        "doc_id long, shard string, n_tokens long",
    )
    a = {r["doc_id"]: (r["pack_id"], r["offset_in_pack"])
         for r in pack_plan(df, budget=64, partition_cols=["shard"]).collect()}
    b = {r["doc_id"]: (r["pack_id"], r["offset_in_pack"])
         for r in pack_plan(df.repartition(13), budget=64, partition_cols=["shard"]).collect()}
    assert a == b


def test_kmeans_two_blobs_separate(spark):
    from d2b_dataframework_spark.datapipe.clustering import kmeans_assignments

    # Two tight blobs far apart; k=2 seeded by ids 0 (blob A) and 1 (blob B).
    rows = []
    for i in range(10):
        base = [10.0, 10.0] if i % 2 == 0 else [-10.0, -10.0]
        rows.append((i, [base[0] + 0.01 * i, base[1] - 0.01 * i]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vid"]: r["cluster"] for r in kmeans_assignments(df, k=2, iters=3).collect()}
    assert all(out[i] == 0 for i in range(0, 10, 2))
    assert all(out[i] == 1 for i in range(1, 10, 2))


def test_kmeans_deterministic_under_repartition(spark):
    from d2b_dataframework_spark.datapipe.clustering import kmeans_assignments

    rows = [(i, [float((i * 7) % 13), float((i * 3) % 5)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {(r["vid"], r["cluster"], r["dist"]) for r in kmeans_assignments(df, k=4, iters=2).collect()}
    b = {(r["vid"], r["cluster"], r["dist"])
         for r in kmeans_assignments(df.repartition(7), k=4, iters=2).collect()}
    assert a == b and len(a) == 40


def test_decontaminate_flags_overlap_only(spark):
    from d2b_dataframework_spark.datapipe.dedup import decontaminate

    train = spark.createDataFrame(
        [(1, "the secret benchmark answer is here today"),
         (2, "completely unrelated words nothing shared at all")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "the secret benchmark answer differs later")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(train, bench, n=3).collect()}
    assert out[1]["contaminated"] and out[1]["n_contaminated"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_contaminated"] == 0
    assert out[2]["contamination_ratio"] == 0.0


def test_global_shuffle_is_permutation(spark):
    from d2b_dataframework_spark.datapipe.splits import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    rows = global_shuffle(df, n_shards=4).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(100))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():  # positions are 1..n contiguous per shard
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in global_shuffle(df.repartition(9), n_shards=4).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_weighted_sample_rates_and_determinism(spark):
    from d2b_dataframework_spark.datapipe.splits import weighted_sample

    df = spark.createDataFrame(
        [(i, "keep" if i % 2 == 0 else "drop") for i in range(200)],
        "doc_id long, group string",
    )
    out = weighted_sample(df, "group", {"keep": 1.0, "drop": 0.0}).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == list(range(0, 200, 2))  # rate 1.0 keeps all, 0.0 drops all
    half = weighted_sample(df, "group", {"keep": 0.5, "drop": 0.5}).count()
    assert 60 <= half <= 140  # ~100 expected, deterministic but hash-spread
    again = weighted_sample(df.repartition(11), "group", {"keep": 0.5, "drop": 0.5}).count()
    assert half == again


def test_quantize_int8_bounds_and_reconstruction(spark):
    from d2b_dataframework_spark.datapipe.similarity import quantize_int8

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    codes1 = [int(c) for c in out[1]["codes"].split(",")]
    assert codes1[0] == 127 and all(-127 <= c <= 127 for c in codes1)
    assert out[1]["n_saturated"] >= 1
    assert out[1]["recon_err"] < (out[1]["scale"] ** 2) * len(codes1)
    assert out[2]["codes"] == "0,0,0,0" and out[2]["recon_err"] == 0.0


def test_segment_dup_stats_flags_shared_segments(spark):
    from d2b_dataframework_spark.datapipe.dedup import segment_dup_stats

    shared = " ".join(f"w{i}" for i in range(10))  # exactly one 10-token segment
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, f"{shared} {uniq_a}"), (2, f"{shared} {uniq_b}"), (3, uniq_b + " tail words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in segment_dup_stats(df, window=10).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_shared_segments"] == 1
    assert out[1]["shared_ratio"] == 0.5
    # doc 3's first segment is exactly uniq_b, which doc 2 also contains —
    # so doc 2 shares both its segments and doc 3 shares one of two.
    assert out[2]["n_shared_segments"] == 2
    assert out[3]["n_segments"] == 2 and out[3]["n_shared_segments"] == 1


def test_kmeans_assignment_plan_is_map_side(spark):
    """The returned assignment plan must be a pure projection over the
    cached base — no Exchange/Window between scan and cluster id (the
    whole point of literal-centroid assignment)."""
    from d2b_dataframework_spark.datapipe.clustering import kmeans_assignments

    df = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_assignments(df, k=3, iters=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan


def test_bm25_ranks_term_rich_docs_higher(spark):
    from d2b_dataframework_spark.datapipe.text import bm25_scores

    df = spark.createDataFrame(
        [(1, "spark spark spark table row"),
         (2, "spark unrelated words only here"),
         (3, "nothing matching at all today")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["spark", "table"]).collect()}
    assert out[1] > out[2] > out[3] == 0.0


def test_bpe_merge_counts_char_pairs(spark):
    from d2b_dataframework_spark.datapipe.text import bpe_merge_candidates

    df = spark.createDataFrame(
        [(1, "aaaa bb"), (2, "aaab x")], "doc_id long, text string"
    )
    # "aaaa" -> aa,aa,aa; "aaab" -> aa,aa,ab; "bb" -> bb; "x" skipped
    rows = {r["pair"]: (r["rank"], r["n_occ"])
            for r in bpe_merge_candidates(df, top_n=10).collect()}
    assert rows["aa"] == (1, 5)
    assert rows["ab"][1] == 1 and rows["bb"][1] == 1


def test_cosine_near_dup_hot_bucket_cap(spark):
    """A concentrated family (identical vectors) lands in one bucket per
    band; the cap drops those buckets, spread pairs still verify."""
    rows = [(i, [10.0, 10.0, 0.0, 0.0]) for i in range(20)]  # hot family
    rows += [(100, [1.0, -2.0, 3.0, -4.0]), (101, [1.0, -2.0, 3.0, -4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = sim.cosine_near_dup_pairs(df, threshold=0.99, dim=4)
    n_uncapped = uncapped.count()
    assert n_uncapped >= 20 * 19 // 2  # hot family is quadratic
    capped = sim.cosine_near_dup_pairs(df, threshold=0.99, dim=4, max_bucket_size=5)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs          # spread pair survives the cap
    assert all(a >= 100 for a, _ in pairs)  # hot family dropped
    cache.release(uncapped)
    cache.release(capped)


def test_kmeans_vectorized_matches_declarative(spark):
    from d2b_dataframework_spark.datapipe.clustering import kmeans_assignments

    rows = [(i, [((i * 13 + d * 7) % 29) / 7.0 - 2.0 for d in range(16)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fast = {(r["vid"], r["cluster"], r["dist"])
            for r in kmeans_assignments(df, k=5, iters=3, vectorized=True).collect()}
    slow = {(r["vid"], r["cluster"], r["dist"])
            for r in kmeans_assignments(df, k=5, iters=3, vectorized=False).collect()}
    assert fast == slow and len(fast) == 60


def test_incremental_dedup_classifies_batch(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),          # exact
         (11, "one two three four five six seven eight nine extra"),      # near
         (12, "wholly unrelated fresh content with novel words only")],   # new
        "doc_id long, text string",
    )
    out = dd.incremental_dedup(batch, corpus, threshold=0.5)
    got = {r["doc_id"]: (r["status"], r["admitted"]) for r in out.collect()}
    assert got == {
        10: ("exact_dup", False),
        11: ("near_dup", False),
        12: ("new", True),
    }
    cache.release(out)


def test_temperature_sample_flattens_distribution(spark):
    from d2b_dataframework_spark.datapipe.splits import temperature_sample

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, group string")
    out = temperature_sample(df, "group", alpha=0.5, target_frac=0.5)
    kept = out.groupBy("group").count().collect()
    got = {r["group"]: r["count"] for r in kept}
    # natural shares 90/10; alpha=0.5 weights 30/10 -> small's share triples
    big_share = got["big"] / (got["big"] + got["small"])
    assert 0.6 < big_share < 0.85  # flattened from 0.9 toward 0.75
    assert got["small"] == 100  # rate > 1 -> fully kept, never replicated
    again = temperature_sample(df.repartition(7), "group", alpha=0.5, target_frac=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_lm_bigram_scores_smoothing_and_oov(spark):
    """Known tiny model: train 'a b a b' → c(a b)=2, c(b a)=1, c1(a)=2,
    c1(b)=2, V=2. Doc 'a b c' has bigrams 'a b' (p=(2+.5)/(2+1)=5/6)
    and 'b c' (unseen, p=.5/3=1/6); mean=.5, oov=1."""
    from d2b_dataframework_spark.datapipe.text import lm_bigram_scores

    train = spark.createDataFrame([(0, "a b a b")], ["doc_id", "text"])
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    row = lm_bigram_scores(train, docs).collect()[0]
    assert row["n_bigrams"] == 2 and row["oov_bigrams"] == 1
    assert abs(row["mean_bigram_p"] - 0.5) < 1e-6


def test_linear_quality_scores_no_join_in_plan(spark):
    """Scoring is a projection + one aggregation: deterministic logit,
    and the physical plan must contain no Join (weights are a literal
    array, not a joined table)."""
    from d2b_dataframework_spark.datapipe.text import linear_quality_scores

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha")], ["doc_id", "text"]
    )
    weights = [0.1] * 64
    out = linear_quality_scores(docs, weights, bias=1.0)
    rows = {r["doc_id"]: r for r in out.collect()}
    # every bucket weighs 0.1 → mean 0.1 + bias regardless of hashing
    assert abs(rows[1]["logit"] - 1.1) < 1e-6 and rows[1]["n_tokens"] == 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_pagerank_hub_ranks_highest_and_mass_conserved(spark):
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.graph import pagerank

    # star: hub h connected to 5 spokes (undirected)
    spokes = [f"s{i}" for i in range(5)]
    pairs = [("h", s) for s in spokes] + [(s, "h") for s in spokes]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    out = pagerank(edges, damping=0.85, iterations=5)
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    assert max(ranks, key=ranks.get) == "h"
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # no dangling nodes -> mass conserved
    spoke_ranks = {v for k, v in ranks.items() if k != "h"}
    assert len(spoke_ranks) == 1  # symmetry: all spokes equal
    release(out)


def test_retrieval_topk_ranks_matching_docs(spark):
    from pyspark.sql import functions as F
    from d2b_dataframework_spark.datapipe.retrieval import inverted_index, retrieve_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple apple apple cherry"),
            (4, "durian durian"),
        ],
        "doc_id long, text string",
    )
    postings = inverted_index(docs)
    assert {(r["term"], r["doc_id"], r["tf"]) for r in postings.collect()} >= {
        ("apple", 1, 2),
        ("apple", 3, 3),
        ("banana", 2, 1),
    }
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    out = retrieve_topk(postings, {"qa": ["apple"], "qb": ["cherry", "durian"]}, n, k=2)
    rows = {(r["query_id"], r["rank"]): r["doc_id"] for r in out.collect()}
    # qa: doc 3 has tf=3 > doc 1 tf=2
    assert rows[("qa", 1)] == 3 and rows[("qa", 2)] == 1
    # qb: doc 4 matches the rarer term twice (higher idf*tf)
    assert rows[("qb", 1)] == 4


def test_chunk_audio_offsets_and_tail(spark):
    from pyspark.sql import functions as F
    from d2b_dataframework_spark.datapipe.multimodal import chunk_audio

    assets = spark.createDataFrame(
        [
            ("a1", "audio", bytearray(b"x" * 350), {"sample_rate": "16000", "channels": "1", "bit_depth": "16"}),
            ("a2", "audio", bytearray(b""), {"sample_rate": "16000"}),
            ("i1", "image", bytearray(b"y" * 999), {}),
        ],
        "asset_id string, modality string, content binary, meta map<string,string>",
    )
    # 0.005s @ 16kHz mono 16-bit = 160 bytes/chunk
    out = chunk_audio(assets, chunk_seconds=0.005).collect()
    rows = {(r["asset_id"], r["chunk_index"]): (r["byte_start"], r["n_chunk_bytes"]) for r in out}
    assert rows[("a1", 0)] == (0, 160)
    assert rows[("a1", 1)] == (160, 160)
    assert rows[("a1", 2)] == (320, 30)  # tail truncation
    assert rows[("a2", 0)] == (0, 0)     # empty payload -> one empty chunk
    assert not any(a == "i1" for a, _ in rows)  # non-audio filtered out
    # chunk payload carries the FULL window (not a preview): length
    # matches n_chunk_bytes for every emitted row
    for r in out:
        assert len(bytes(r["chunk"] or b"")) == r["n_chunk_bytes"]


def test_pseudonymize_is_stable_and_secret_dependent(spark):
    from pyspark.sql import functions as F
    from d2b_dataframework_spark.datapipe.text import pseudonymize

    df = spark.createDataFrame([(42,), (42,), (7,)], "uid long")
    out = df.select(
        pseudonymize("uid", "k1").alias("t1"),
        pseudonymize("uid", "k2").alias("t2"),
    ).collect()
    # same input + secret -> same token; different secret -> different token
    assert out[0]["t1"] == out[1]["t1"] and len(out[0]["t1"]) == 16
    assert out[0]["t1"] != out[0]["t2"]
    assert out[2]["t1"] != out[0]["t1"]


def test_containment_catches_subset_that_jaccard_misses(spark):
    from pyspark.sql import functions as F
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import containment_pairs, ngram_jaccard_pairs

    long_text = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    short_text = " ".join(long_text.split()[:12])  # strict prefix
    df = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, "zz qq rr ss tt uu")],
        "doc_id long, text string",
    )
    cont = containment_pairs(df, n=3, threshold=0.9)
    pairs = {(r["id_a"], r["id_b"]): r["containment"] for r in cont.collect()}
    assert pairs.get((1, 2)) == 1.0  # prefix fully contained
    assert (1, 3) not in pairs
    release(cont)
    jac = ngram_jaccard_pairs(df, n=3, threshold=0.5, block_col=None)
    assert not [r for r in jac.collect() if (r["id_a"], r["id_b"]) == (1, 2)]
    release(jac)


def test_containment_index_bucket_cap(spark):
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import containment_pairs

    # Clean corpus (every shingle rare): cap far above bucket sizes must
    # be a no-op — identical pairs to the uncapped run.
    long_text = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    short_text = " ".join(long_text.split()[:12])
    clean = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, "zz qq rr ss tt uu")],
        "doc_id long, text string",
    )
    exact = containment_pairs(clean, n=3, threshold=0.9)
    capped = containment_pairs(clean, n=3, threshold=0.9, max_index_bucket_size=100)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, capped.collect()))
    release(exact)
    release(capped)

    # Boilerplate corpus: docs 0..11 end with the same footer, so the
    # footer's shingle hashes are held by all of them; at a permissive
    # threshold the uncapped run emits footer-driven pairs between
    # unrelated docs. With the cap the footer hashes are dropped from
    # the index before the join, those pairs disappear, and the genuine
    # (footer-free) containment pair (20, 21) still comes through.
    footer = " common legal footer all rights reserved contact support team"
    body = [" ".join(f"u{d}t{i}" for i in range(6)) for d in range(12)]
    rows = [(d, body[d] + footer) for d in range(12)]
    rows.append((20, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((21, "alpha beta gamma delta epsilon"))
    boiler = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = containment_pairs(boiler, n=3, threshold=0.4)
    upairs = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    assert any(a < 12 and b < 12 for a, b in upairs)  # footer pollution
    release(uncapped)
    got = containment_pairs(boiler, n=3, threshold=0.4, max_index_bucket_size=5)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    assert not any(a < 12 and b < 12 for a, b in pairs)
    assert (20, 21) in pairs
    release(got)


def test_pagerank_checkpoint_invariant_and_severs_lineage(spark):
    """localCheckpoint every k iterations must not change a single rank
    (decimal-exact arithmetic), and must keep the final plan from
    embedding every prior iteration."""
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.graph import pagerank

    edges = spark.createDataFrame(
        [(a, b) for a in range(8) for b in ((a + 1) % 8, (a + 3) % 8)],
        "src int, dst int",
    )
    plain = pagerank(edges, iterations=9, checkpoint_every=0)
    ckpt = pagerank(edges, iterations=9, checkpoint_every=3)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, ckpt.collect()))
    assert a == b
    # lineage: the checkpointed plan is dramatically shorter — its last
    # segment covers at most checkpoint_every iterations
    p_plain = plain._jdf.queryExecution().executedPlan().toString()
    p_ckpt = ckpt._jdf.queryExecution().executedPlan().toString()
    assert len(p_ckpt) < len(p_plain) / 2
    release(plain)
    release(ckpt)


def test_keep_best_elects_quality_keeper_and_keeps_singletons(spark):
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import keep_best

    corpus = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (9, 99)], "doc_id long, q long"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = keep_best(corpus, pairs, "q")
    rows = {r["doc_id"]: (r["cluster_id"], r["keeper_id"], r["kept"]) for r in out.collect()}
    # cluster {1,2,3}: keeper is 2 (q=30), NOT the min id
    assert rows[1] == (1, 2, False)
    assert rows[2] == (1, 2, True)
    assert rows[3] == (1, 2, False)
    # singleton 9 keeps itself
    assert rows[9] == (9, 9, True)
    release(out)


def test_keep_best_tie_breaks_on_min_id(spark):
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import keep_best

    corpus = spark.createDataFrame([(5, 7), (6, 7)], "doc_id long, q long")
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    out = keep_best(corpus, pairs, "q")
    rows = {r["doc_id"]: r["keeper_id"] for r in out.collect()}
    assert rows == {5: 5, 6: 5}
    release(out)


def test_image_dimensions_parses_png_and_jpeg_headers(spark):
    """Byte-level container parsing: valid PNG IHDR, a JPEG whose SOF0
    sits behind APP0+DQT segments (marker-walk required), and garbage."""
    import struct

    from d2b_dataframework_spark.datapipe.multimodal import image_dimensions

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 800, 600)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 4
    )
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
    sof2 = (
        b"\xff\xc2"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", 1080, 1920)
        + b"\x03"
        + b"\x00" * 9
    )
    jpg = b"\xff\xd8" + app0 + dqt + sof2
    assets = spark.createDataFrame(
        [
            ("p1", "image", bytearray(png)),
            ("j1", "image", bytearray(jpg)),
            ("g1", "image", bytearray(b"not an image at all")),
            ("a1", "audio", bytearray(png)),  # wrong modality -> filtered
        ],
        "asset_id string, modality string, content binary",
    )
    rows = {r["asset_id"]: (r["format"], r["width"], r["height"])
            for r in image_dimensions(assets).collect()}
    assert rows["p1"] == ("png", 800, 600)
    assert rows["j1"] == ("jpeg", 1920, 1080)  # SOF stores height first
    assert rows["g1"] == (None, None, None)
    assert "a1" not in rows


def test_wav_meta_parses_riff_chunks(spark):
    import struct

    from d2b_dataframework_spark.datapipe.multimodal import wav_meta

    def wav(rate, ch, bits, n_data):
        fmt = (
            b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
        )
        data = b"data" + struct.pack("<I", n_data) + b"\x00" * n_data
        body = b"WAVE" + fmt + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    assets = spark.createDataFrame(
        [
            ("w1", "audio", bytearray(wav(44100, 2, 16, 64))),
            ("w2", "audio", bytearray(wav(16000, 1, 8, 7))),  # odd data len (padding)
            ("g1", "audio", bytearray(b"RIFFxxxxNOPE")),
        ],
        "asset_id string, modality string, content binary",
    )
    rows = {r["asset_id"]: (r["sample_rate"], r["channels"], r["bit_depth"], r["n_data_bytes"])
            for r in wav_meta(assets).collect()}
    assert rows["w1"] == (44100, 2, 16, 64)
    assert rows["w2"] == (16000, 1, 8, 7)
    assert rows["g1"] == (None, None, None, None)


def test_pq_encode_seed_vectors_code_to_themselves(vectors):
    """A codebook seed vector is at distance 0 from its own codeword in
    every subspace, so it must encode to its own cid across the board."""
    out = {r["vec_id"]: r["codes"] for r in sim.pq_encode(vectors, m=8, ksub=4).collect()}
    for vid in range(4):
        assert out[vid] == [vid] * 8
    assert all(all(0 <= c < 4 for c in codes) for codes in out.values())


def test_pq_encode_is_pure_projection(vectors):
    """Encode must be map-side against the constant-folded codebook
    literal: no Exchange, no Window, no join in the plan."""
    plan = (
        sim.pq_encode(vectors, m=8, ksub=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("Exchange", "Window [", "Join"):
        assert node not in plan


def test_pq_topk_matches_numpy_adc_reference(vectors):
    """ADC ranks must equal an independent numpy recomputation of the
    same seed-codebook PQ (quantize, encode, LUT, sum, sort)."""
    import numpy as np

    rows = sorted(vectors.collect(), key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    q = np.where(mat >= 0, np.floor(mat * 1000 + 0.5), np.ceil(mat * 1000 - 0.5))
    m, d, ksub = 8, 8, 4
    cb = q[:ksub].reshape(ksub, m, d)  # ids 0..3 are rows 0..3
    subs = q.reshape(len(ids), m, d)
    # encode: argmin over codewords (ties -> lowest cid; exact ints)
    dists = ((subs[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)  # n,k,m
    codes = dists.argmin(axis=1)  # n,m  (argmin takes first == lowest cid)
    expected = {}
    for qi in (0, 1):
        # ADC distance of candidate n to query qi uses the QUERY's exact
        # subspace distances to each codeword, looked up at n's codes:
        lut = ((subs[qi][None, :, :] - cb) ** 2).sum(axis=2)  # k,m
        adc = np.array([sum(lut[codes[n, s], s] for s in range(m)) for n in range(len(ids))])
        order = sorted(
            [(adc[n], ids[n]) for n in range(len(ids)) if ids[n] != ids[qi]]
        )[:5]
        expected[ids[qi]] = [vid for _, vid in order]
    out = sim.pq_topk(
        vectors, vectors.filter(F.col("vec_id") < 2), k=5, m=8, ksub=4
    ).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == expected


def test_triangle_stats_counts_k4_plus_tail(spark):
    """K4 (4 triangles) plus a pendant edge: nodes=5, edges=7,
    triangles=4, wedges = sum d(d-1)/2 = 3+3+3+6+0 -> 15 with the
    pendant attached to node 3 (deg 4)."""
    from d2b_dataframework_spark.datapipe.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "src long, dst long")
    row = triangle_stats(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (5, 7, 4)
    assert row["n_wedges"] == 3 + 3 + 3 + 6 + 0
    assert row["global_clustering"] == round(12 / 15, 9)


def test_triangle_stats_dedups_and_ignores_direction_and_loops(spark):
    """Duplicate edges, reversed duplicates, and self-loops must not
    change the census: the triangle (0,1,2) counts once."""
    from d2b_dataframework_spark.datapipe.graph import triangle_stats

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 0), (2, 2)],
        "src long, dst long",
    )
    row = triangle_stats(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (3, 3, 1)
    assert row["global_clustering"] == 1.0


def test_random_projection_matches_numpy_and_is_projection_only(vectors):
    """Components equal an int64 numpy matmul with the same quantized
    planes; the plan is shuffle-free (pure projection)."""
    import numpy as np

    out = sim.random_projection(vectors, out_dim=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["vec_id"]: r for r in out.collect()}
    planes = np.array(sim.quantized_planes(dim=64, n_planes=4), dtype=np.int64)
    for r in vectors.collect():
        v = np.asarray(r["embedding"], dtype=np.float64) * 1000
        q = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)
        expect = planes @ q
        got = rows[r["vec_id"]]
        assert list(got["proj"]) == expect.tolist()
        assert got["proj_norm"] == round(float(np.sqrt((expect.astype(np.float64) ** 2).sum())), 6)


def test_soft_dedup_weights_sum_to_semantic_units(spark):
    """Weights within a cluster sum to 1.0; singletons weigh 1.0; total
    weight == number of semantic units (clusters + singletons)."""
    corpus = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    rows = dd.soft_dedup_weights(corpus, pairs).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 8
    assert by_id[0]["cluster_size"] == 3 and by_id[0]["weight"] == round(1 / 3, 6)
    assert by_id[5]["cluster_size"] == 2 and by_id[5]["weight"] == 0.5
    assert by_id[3]["cluster_size"] == 1 and by_id[3]["weight"] == 1.0
    clusters = {r["cluster_id"] for r in rows}
    total = sum(r["weight"] for r in rows)
    assert abs(total - len(clusters)) < 1e-4


def test_rrf_fuse_combines_and_reranks(spark):
    """A doc ranked by both sources outscores single-source docs at the
    same ranks; score equals the closed-form RRF sum; truncation works."""
    from d2b_dataframework_spark.datapipe.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3)],
        "query_id string, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [("q", 10, 2), ("q", 13, 1)], "query_id string, doc_id long, rank long"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    both = round(round(1 / 61, 12) + round(1 / 62, 12), 9)
    assert out[10]["rrf_score"] == both and out[10]["rank"] == 1
    assert out[13]["rrf_score"] == round(round(1 / 61, 12), 9)
    assert out[11]["rrf_score"] == round(round(1 / 62, 12), 9)
    # 13 (rank 1 in b -> 1/61) beats 11 (rank 2 in a -> 1/62)
    assert out[13]["rank"] == 2 and out[11]["rank"] == 3
    top2 = rrf_fuse([a, b], k=60, top_k=2).collect()
    assert {r["doc_id"] for r in top2} == {10, 13}


def test_parse_mp4_boxes_edge_cases():
    from d2b_dataframework_spark.datapipe.multimodal import parse_mp4_boxes

    def box(fourcc: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + fourcc + payload

    mvhd_v0 = box(
        b"mvhd",
        bytes([0, 0, 0, 0]) + bytes(8) + (600).to_bytes(4, "big")
        + (1234).to_bytes(4, "big") + bytes(80),
    )
    base = box(b"ftyp", b"mp42" + bytes(4)) + box(b"moov", mvhd_v0)
    got = parse_mp4_boxes(base)
    assert got == ("mp42", 1234 * 1000 // 600, 600, 2, "ftyp,moov")
    # 64-bit largesize mdat + size-0 (to EOF) trailer both walk cleanly
    large = (1).to_bytes(4, "big") + b"mdat" + (24).to_bytes(8, "big") + bytes(8)
    tail = (0).to_bytes(4, "big") + b"free" + bytes(4)
    got2 = parse_mp4_boxes(base + large + tail)
    assert got2[3] == 4 and got2[4] == "ftyp,moov,mdat,free"
    # corrupt (size < header) refuses instead of looping
    assert parse_mp4_boxes(base + (3).to_bytes(4, "big") + b"junk") is None
    assert parse_mp4_boxes(b"\x00\x00\x00\x08niltfty") is None
    assert parse_mp4_boxes(None) is None


def test_pq_training_improves_recall_and_stays_valid(spark):
    """2 Lloyd passes per subspace must not hurt (and on a clustered
    cloud should help) recall@5 vs seed-only codebooks; codes stay in
    range after training even when codewords lose all members."""
    import math

    rows = []
    for i in range(48):
        c = i % 4  # 4 tight clusters
        base = [math.sin(0.37 * (c + 1) * (d + 1)) for d in range(64)]
        rows.append((i, [b + 0.02 * math.sin(1.7 * i * (d + 2)) for d, b in enumerate(base)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(df, queries, k=5).collect()
    }

    def recall(train_iters):
        approx = sim.pq_topk(df, queries, k=5, m=8, ksub=8, train_iters=train_iters)
        hits = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(hits & exact) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0
    codes = sim.pq_encode(df, m=8, ksub=8, train_iters=2).collect()
    assert all(0 <= c < 8 for r in codes for c in r["codes"])


def test_ivfpq_full_probe_matches_pq(vectors):
    """With every list probed, IVF-PQ candidates == the whole corpus, so
    the ranking must equal plain pq_topk (same codebooks, same ADC)."""
    queries = vectors.filter(F.col("vec_id") < 2)
    full = sim.pq_topk(vectors, queries, k=5, m=8, ksub=4)
    ivf = sim.ivfpq_topk(vectors, queries, k=5, nlist=4, nprobe=4, m=8, ksub=4)
    f = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"]) for r in full.collect()}
    i = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"]) for r in ivf.collect()}
    assert f == i


def test_ivfpq_single_projection_corpus_side(vectors):
    """Codes + list routing must come from ONE corpus projection: no
    join between two corpus-scaled frames, only the broadcast probe
    join; the single Window is the final top-k."""
    queries = vectors.filter(F.col("vec_id") < 2)
    out = sim.ivfpq_topk(vectors, queries, k=3, nlist=4, nprobe=2, m=8, ksub=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window [") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_label_centroids_matches_numpy(spark):
    """Micro-unit centroids and integer inertia equal a numpy
    recomputation with the same quantize + half-up conventions."""
    import numpy as np

    from d2b_dataframework_spark.datapipe.clustering import label_centroids

    rows = [(i, i % 3, [0.1 * ((i + d) % 7) - 0.3 for d in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {r["label"]: r for r in label_centroids(df).collect()}
    mat = np.array([r[2] for r in rows])
    q = np.where(mat * 1000 >= 0, np.floor(mat * 1000 + 0.5), np.ceil(mat * 1000 - 0.5))
    labels = np.array([r[1] for r in rows])
    for lab in (0, 1, 2):
        sub = q[labels == lab]
        n = len(sub)
        s = sub.sum(axis=0)
        micro = np.floor(s * 1000.0 / n + 0.5).astype(int)
        assert got[lab]["n_members"] == n
        assert got[lab]["centroid_micro_csv"] == ",".join(str(v) for v in micro)
        inertia = np.floor((sub * sub).sum() - (s * s).sum() / n + 0.5)
        assert got[lab]["inertia_quant"] == int(inertia)


def test_hashed_embedding_deterministic_and_feeds_ann(spark):
    """Same text -> identical vector; vectors are exact integers of the
    right dimension; output plugs straight into brute_force_topk."""
    docs = spark.createDataFrame(
        [(1, "spark join window sort"), (2, "spark join window sort"),
         (3, "completely different words here now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["embedding"] for r in dt.hashed_embedding(docs, dim=16).collect()}
    assert out[1] == out[2] and out[1] != out[3]
    assert len(out[1]) == 16 and all(v == int(v) for v in out[1])
    assert sum(abs(v) for v in out[1]) == 4  # 4 tokens, each ±1 somewhere
    emb = dt.hashed_embedding(docs, dim=16)
    top = sim.brute_force_topk(emb, emb.filter(F.col("doc_id") == 1), k=1,
                               id_col="doc_id")
    assert top.collect()[0]["neighbor_id"] == 2  # the exact duplicate


def test_pq_vectorized_matches_declarative(vectors):
    """Arrow-batched PQ encode == the pure-Catalyst HOF path, seed-only
    AND trained (exact integer arithmetic guarantees it; this test
    enforces it), and the full top-k rankings agree."""
    for ti in (0, 2):
        fast = {r["vec_id"]: list(r["codes"])
                for r in sim.pq_encode(vectors, m=8, ksub=4, train_iters=ti,
                                       vectorized=True).collect()}
        slow = {r["vec_id"]: list(r["codes"])
                for r in sim.pq_encode(vectors, m=8, ksub=4, train_iters=ti,
                                       vectorized=False).collect()}
        assert fast == slow, f"train_iters={ti}"
    queries = vectors.filter(F.col("vec_id") < 2)
    f = [tuple(r) for r in sim.pq_topk(vectors, queries, k=5, m=8, ksub=4,
                                       vectorized=True).collect()]
    s = [tuple(r) for r in sim.pq_topk(vectors, queries, k=5, m=8, ksub=4,
                                       vectorized=False).collect()]
    assert sorted(f) == sorted(s)


def test_corpus_report_metrics(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "en", "s1"), (2, "a b c", "en", "s2"),
         (3, "x y", "es", "s1"), (4, "unique text here", "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["metric"]: r["value"] for r in dt.corpus_report(docs).collect()}
    assert got["n_docs"] == 4.0 and got["n_sources"] == 2.0
    assert got["n_tokens_total"] == 3 + 3 + 2 + 3
    assert got["mean_doc_tokens"] == round(11 / 4, 6)
    assert got["lang_share:en"] == 0.75 and got["lang_share:es"] == 0.25
    assert got["dup_doc_share"] == 0.5  # docs 1+2 share a fingerprint


def test_group_kfold_no_group_straddles_folds(spark):
    from d2b_dataframework_spark.datapipe.splits import group_kfold

    df = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(70)], "doc_id long, source string"
    )
    out = group_kfold(df, "source", k=3)
    per_group = out.groupBy("source").agg(F.count_distinct("fold").alias("nf")).collect()
    assert all(r["nf"] == 1 for r in per_group)
    assert out.select("fold").distinct().count() <= 3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="positive"):
        group_kfold(df, "source", k=0)


def test_centroid_outliers_flags_planted_outlier(spark):
    """A vector far from its label's tight cluster scores >> 1 and is
    flagged; cluster members score ~1 and are not."""
    import math

    rows = []
    for i in range(20):
        base = [math.sin(0.3 * (d + 1)) for d in range(8)]
        rows.append((i, 0, [b + 0.01 * ((i + d) % 5) for d, b in enumerate(base)]))
    rows.append((99, 0, [5.0] * 8))  # planted outlier
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    from d2b_dataframework_spark.datapipe.clustering import centroid_outliers

    flagged = {r["vec_id"]: r["score"] for r in centroid_outliers(df, score_threshold=4.0).collect()}
    assert set(flagged) == {99}
    assert flagged[99] > 10
