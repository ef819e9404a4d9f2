"""Round-10 guards: the static ``_carry`` lint (r9 verdict ask #7).

The runtime catch-all (tests/test_round9_ops.py::
test_release_leaves_no_cached_plans) proves no registry query leaks a
cached frame *today*; this module makes the leak class unwritable BY
CONSTRUCTION: an AST lint over plans/queries.py that fails the moment a
query chains ``.select()``/``.orderBy()``/... directly on a tracked
datapipe result (the handle becomes unreachable before it can ever be
passed to ``_carry``), or chains on a tracked variable and returns
without routing that variable through ``_carry``/``cache.track``.
"""

from __future__ import annotations

import ast
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "d2b_dataframework_spark")

# DataFrame methods that return a NEW object (dropping _d2b_persisted).
_CHAIN_METHODS = {
    "select", "selectExpr", "orderBy", "sort", "filter", "where",
    "withColumn", "withColumns", "withColumnRenamed", "withColumnsRenamed",
    "drop", "distinct", "dropDuplicates", "limit", "join", "crossJoin",
    "union", "unionAll", "unionByName", "groupBy", "agg", "repartition",
    "coalesce", "alias", "sample", "fillna", "na", "cache", "persist",
}


def _tracking_function_names() -> set[str]:
    """Top-level datapipe functions whose body calls ``track`` — their
    returned frame carries ``_d2b_persisted`` handles the caller must
    keep reachable."""
    names: set[str] = set()
    for path in glob.glob(os.path.join(PKG, "datapipe", "*.py")):
        tree = ast.parse(open(path).read())
        for node in tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for call in ast.walk(node):
                if not isinstance(call, ast.Call):
                    continue
                f = call.func
                if (isinstance(f, ast.Name) and f.id == "track") or (
                    isinstance(f, ast.Attribute) and f.attr == "track"
                ):
                    names.add(node.name)
                    break
    return names - {"track"}


def _is_tracked_call(node: ast.AST, tracked: set[str]) -> bool:
    """True for ``dd.simhash_near_dup_pairs(...)``-style calls into a
    tracking datapipe function."""
    if not isinstance(node, ast.Call):
        return False
    f = node.func
    name = f.id if isinstance(f, ast.Name) else (
        f.attr if isinstance(f, ast.Attribute) else None
    )
    return name in tracked


def test_tracking_function_inventory_is_nonempty():
    tracked = _tracking_function_names()
    # Spot anchors: these are known trackers; losing them from the set
    # would quietly disarm the lint below.
    for anchor in ("simhash_near_dup_pairs", "leakage_safe_split",
                   "semdedup_prune", "kmeans_assignments"):
        assert anchor in tracked, (anchor, sorted(tracked))
    assert len(tracked) >= 20


def test_no_chain_directly_on_tracked_datapipe_call():
    """``dd.f(...).orderBy(...)`` loses the persist handle before any
    variable can carry it — unconditionally a leak, never legal."""
    tracked = _tracking_function_names()
    src = open(os.path.join(PKG, "plans", "queries.py")).read()
    tree = ast.parse(src)
    bad: list[str] = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in _CHAIN_METHODS
            and _is_tracked_call(node.func.value, tracked)
        ):
            bad.append(
                f"line {node.lineno}: .{node.func.attr}() chained directly "
                f"on tracked call — assign it to a variable and route the "
                f"result through _carry(result, <var>)"
            )
    assert not bad, "\n".join(bad)


def test_chained_tracked_vars_are_carried():
    """A variable assigned from a tracked datapipe call may be chained
    on — but then the enclosing query function must pass that variable
    to ``_carry``/``cache.track`` (or return the variable itself /
    an explicit ``track`` of it) so release() can reach the handle."""
    tracked = _tracking_function_names()
    src = open(os.path.join(PKG, "plans", "queries.py")).read()
    tree = ast.parse(src)
    bad: list[str] = []
    for fn in tree.body:
        if not isinstance(fn, ast.FunctionDef) or not fn.name.startswith("q_"):
            continue
        tracked_vars = {
            t.id
            for node in ast.walk(fn)
            if isinstance(node, ast.Assign) and _is_tracked_call(node.value, tracked)
            for t in node.targets
            if isinstance(t, ast.Name)
        }
        if not tracked_vars:
            continue
        carried: set[str] = set()
        chained: dict[str, int] = {}
        returned_bare: set[str] = set()
        for node in ast.walk(fn):
            if isinstance(node, ast.Call):
                f = node.func
                fname = f.id if isinstance(f, ast.Name) else (
                    f.attr if isinstance(f, ast.Attribute) else None
                )
                if fname in ("_carry", "track"):
                    for arg in list(node.args) + [kw.value for kw in node.keywords]:
                        for leaf in ast.walk(arg):
                            if isinstance(leaf, ast.Name) and leaf.id in tracked_vars:
                                carried.add(leaf.id)
                elif (
                    isinstance(f, ast.Attribute)
                    and f.attr in _CHAIN_METHODS
                    and isinstance(f.value, ast.Name)
                    and f.value.id in tracked_vars
                ):
                    chained.setdefault(f.value.id, node.lineno)
            elif isinstance(node, ast.Return) and isinstance(node.value, ast.Name):
                if node.value.id in tracked_vars:
                    returned_bare.add(node.value.id)
        for var, lineno in chained.items():
            if var not in carried and var not in returned_bare:
                bad.append(
                    f"{fn.name} line {lineno}: tracked frame '{var}' is "
                    f"chained on but never routed through _carry/track — "
                    f"the persisted intermediate would leak past release()"
                )
    assert not bad, "\n".join(bad)


def test_bench_pin_covers_registry_except_current_staging():
    """Pin-completeness tripwire (r9 verdict ask #3): every registry
    query except those staged THIS round (``_STAGING[-1]`` — they get
    pinned by this round's close-out) must have a row in
    BENCH_BASELINE.json, and the pin must carry no stale names.  A
    feature commit landing after close_round.sh (the r8/r9 miss class)
    turns red here the moment the next round's staging tuple rotates.
    """
    import json

    from d2b_dataframework_spark.plans import queries as Q

    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as fh:
        pin = set(json.load(fh)["queries"])
    missing = set(Q.REGISTRY) - pin - set(Q._STAGING[-1])
    stale = pin - set(Q.REGISTRY)
    assert not missing, f"registry queries absent from BENCH_BASELINE.json: {sorted(missing)}"
    assert not stale, f"BENCH_BASELINE.json pins unknown queries: {sorted(stale)}"


# ---------------------------------------------------------------------------
# Round-10 operators: suite decontamination, cluster-aware budget mixture,
# planted-JFIF dimension parsing
# ---------------------------------------------------------------------------


def test_decontaminate_multi_planted(spark):
    """Doc 1's text is planted into benchmark b1 only; doc 3 shares
    nothing with either benchmark. The grid must flag exactly the
    planted cell and zero-fill the rest."""
    from d2b_dataframework_spark.datapipe.dedup import decontaminate_multi

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    benches = {
        "b1": spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        ),
        "b2": spark.createDataFrame(
            [(200, "seven eight nine ten eleven twelve")],
            "doc_id long, text string",
        ),
    }
    rows = {
        (r["doc_id"], r["benchmark"]): r
        for r in decontaminate_multi(train, benches, n=3).collect()
    }
    assert len(rows) == 6  # dense 3-doc x 2-benchmark grid
    assert rows[(1, "b1")]["contaminated"] is True
    assert rows[(1, "b1")]["contamination_ratio"] == 1.0
    assert rows[(1, "b2")]["contaminated"] is False
    assert rows[(1, "b2")]["n_contaminated"] == 0
    assert rows[(3, "b1")]["contaminated"] is False
    assert rows[(3, "b2")]["contaminated"] is False
    # n_grams constant per doc across benchmark rows
    assert rows[(2, "b1")]["n_grams"] == rows[(2, "b2")]["n_grams"]


def test_decontamination_rollup_any_row(spark):
    from d2b_dataframework_spark.datapipe.dedup import (
        decontaminate_multi,
        decontamination_rollup,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    benches = {
        "b1": spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        ),
        "b2": spark.createDataFrame(
            [(200, "one two three")], "doc_id long, text string"
        ),
    }
    per = decontaminate_multi(train, benches, n=3)
    roll = {r["benchmark"]: r for r in decontamination_rollup(per).collect()}
    assert set(roll) == {"b1", "b2", "__any__"}
    assert roll["b1"]["n_train_docs"] == 3
    assert roll["b1"]["n_hit_docs"] == 1  # doc 1
    assert roll["b2"]["n_hit_docs"] == 1  # doc 2 ("one two three" gram)
    # combined mask: docs 1 and 2 hit at least one benchmark
    assert roll["__any__"]["n_hit_docs"] == 2
    assert roll["__any__"]["n_train_docs"] == 3


def test_cluster_budget_mixture_one_rep_per_cluster(spark):
    """Twins (near-dup pairs) must never both survive: the budget walk
    sees one representative per cluster — the best-quality member —
    and the frontier math matches token_budget_sample over those reps."""
    from d2b_dataframework_spark.datapipe.splits import cluster_budget_mixture

    scored = spark.createDataFrame(
        [
            # cluster {1, 2}: 2 has better quality -> 2 represents
            (1, "en", 0.50, 100),
            (2, "en", 0.90, 100),
            # singleton 3
            (3, "en", 0.70, 100),
            # cluster {4, 5} in another cell
            (4, "de", 0.60, 150),
            (5, "de", 0.40, 150),
        ],
        "doc_id long, lang string, quality double, n_tokens long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = cluster_budget_mixture(scored, pairs, budget_tokens=250)
    rows = {r["doc_id"]: r for r in out.collect()}
    # en cell: reps are 2 (q=.9) and 3 (q=.7); both fit 250-token budget
    # de cell: rep is 4; fits
    assert set(rows) == {2, 3, 4}
    clusters = [r["cluster_id"] for r in rows.values()]
    assert len(clusters) == len(set(clusters)), "two members of one cluster kept"
    assert rows[2]["rank"] == 1 and rows[2]["cum_tokens"] == 100
    assert rows[3]["rank"] == 2 and rows[3]["cum_tokens"] == 200
    assert rows[4]["rank"] == 1 and rows[4]["cum_tokens"] == 150


def test_jpeg_parse_com_and_fill_bytes():
    """The SOFn walk must step over a variable-length COM segment and a
    run of legal 0xFF fill bytes, and bail (None) on truncation at SOS."""
    from d2b_dataframework_spark.datapipe.multimodal import (
        parse_image_dimensions,
    )

    def jfif(w, h, com_payload=b"xx", fill=2):
        return (
            b"\xff\xd8"
            + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
            + b"\xff\xfe" + (len(com_payload) + 2).to_bytes(2, "big") + com_payload
            + b"\xff" * fill
            + b"\xff\xc0\x00\x11\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big")
            + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        )

    assert parse_image_dimensions(jfif(640, 480)) == ("jpeg", 640, 480)
    assert parse_image_dimensions(jfif(9, 11, com_payload=b"", fill=0)) == (
        "jpeg", 9, 11,
    )
    assert parse_image_dimensions(jfif(65535, 1, com_payload=b"a" * 200, fill=7)) == (
        "jpeg", 65535, 1,
    )
    # SOS before any SOF: dimensions unrecoverable without entropy decode
    sos = b"\xff\xd8" + b"\xff\xda\x00\x08" + b"\x00" * 8
    assert parse_image_dimensions(sos) is None


def test_semantic_decontaminate_planted(spark):
    """Corpus vec 1 is identical to bench 100 (cos 1.0, flagged); vec 2
    is orthogonal to both bench vectors (cos 0, clean); vec 3 is a
    scaled copy of bench 200 (cosine is scale-invariant -> flagged)."""
    from d2b_dataframework_spark.datapipe.similarity import (
        decontaminate_semantic,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0]),
            (3, [0.0, 2.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r
        for r in decontaminate_semantic(corpus, bench, threshold=0.95).collect()
    }
    assert rows[1]["contaminated"] is True
    assert rows[1]["best_bench_id"] == 100
    assert rows[1]["best_cosine"] == 1.0
    assert rows[2]["contaminated"] is False
    assert rows[2]["best_cosine"] == 0.0
    # cosine tie at 0.0 for vec 2: argmax must pick the SMALLEST bench id
    assert rows[2]["best_bench_id"] == 100
    assert rows[3]["contaminated"] is True
    assert rows[3]["best_bench_id"] == 200


def test_tiff_parse_both_endians_and_types():
    from d2b_dataframework_spark.datapipe.multimodal import (
        parse_image_dimensions,
    )

    def le_tiff(w, h, typ=3):
        vw = w.to_bytes(2, "little") + b"\x00\x00" if typ == 3 else w.to_bytes(4, "little")
        vh = h.to_bytes(2, "little") + b"\x00\x00" if typ == 3 else h.to_bytes(4, "little")
        return (
            b"II*\x00" + (8).to_bytes(4, "little") + (2).to_bytes(2, "little")
            + (256).to_bytes(2, "little") + typ.to_bytes(2, "little")
            + (1).to_bytes(4, "little") + vw
            + (257).to_bytes(2, "little") + typ.to_bytes(2, "little")
            + (1).to_bytes(4, "little") + vh
            + b"\x00\x00\x00\x00"
        )

    def be_tiff(w, h, typ=4):
        vw = w.to_bytes(2, "big") + b"\x00\x00" if typ == 3 else w.to_bytes(4, "big")
        vh = h.to_bytes(2, "big") + b"\x00\x00" if typ == 3 else h.to_bytes(4, "big")
        return (
            b"MM\x00*" + (8).to_bytes(4, "big") + (2).to_bytes(2, "big")
            + (256).to_bytes(2, "big") + typ.to_bytes(2, "big")
            + (1).to_bytes(4, "big") + vw
            + (257).to_bytes(2, "big") + typ.to_bytes(2, "big")
            + (1).to_bytes(4, "big") + vh
            + b"\x00\x00\x00\x00"
        )

    assert parse_image_dimensions(le_tiff(640, 480)) == ("tiff", 640, 480)
    assert parse_image_dimensions(le_tiff(70000, 2, typ=4)) == ("tiff", 70000, 2)
    assert parse_image_dimensions(be_tiff(907, 607)) == ("tiff", 907, 607)
    assert parse_image_dimensions(be_tiff(9, 11, typ=3)) == ("tiff", 9, 11)
    # IFD offset beyond the buffer: unparseable, never a crash
    assert parse_image_dimensions(b"II*\x00" + (900).to_bytes(4, "little")) is None
    # IFD present but missing the ImageLength tag
    broken = (
        b"II*\x00" + (8).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (256).to_bytes(2, "little") + (3).to_bytes(2, "little")
        + (1).to_bytes(4, "little") + (640).to_bytes(2, "little") + b"\x00\x00"
        + b"\x00\x00\x00\x00"
    )
    assert parse_image_dimensions(broken) is None


def test_flac_streaminfo_parse():
    from d2b_dataframework_spark.datapipe.multimodal import (
        parse_flac_streaminfo,
    )

    def flac(sr, ch, bps, total, pad_first=False):
        packed = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
        si = (
            (4096).to_bytes(2, "big") * 2
            + b"\x00\x00\x00" * 2
            + packed.to_bytes(8, "big")
            + b"\x00" * 16
        )
        b = b"fLaC"
        if pad_first:
            b += b"\x01" + (4).to_bytes(3, "big") + b"\x00" * 4
        return b + b"\x80" + (34).to_bytes(3, "big") + si

    assert parse_flac_streaminfo(flac(44100, 2, 16, 1234567)) == (
        44100, 2, 16, 1234567,
    )
    # field extremes: 3-bit channels, 5-bit bps, 36-bit total
    assert parse_flac_streaminfo(flac(8000, 8, 31, (1 << 36) - 1, True)) == (
        8000, 8, 31, (1 << 36) - 1,
    )
    # last metadata block without STREAMINFO: unparseable
    assert parse_flac_streaminfo(b"fLaC\x81\x00\x00\x04AAAA") is None
    assert parse_flac_streaminfo(b"RIFF1234WAVE") is None


def test_decontaminate_multi_single_benchmark_matches_decontaminate(spark):
    """With exactly one benchmark, the suite grid must reduce to the
    single-set operator's answer (same gram machinery, same counts) —
    the two screens can never drift apart."""
    from d2b_dataframework_spark.datapipe.dedup import (
        decontaminate,
        decontaminate_multi,
    )

    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "alpha beta gamma unrelated tail words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "doc_id long, text string"
    )
    single = {
        r["doc_id"]: r for r in decontaminate(train, bench, n=3).collect()
    }
    multi = {
        r["doc_id"]: r
        for r in decontaminate_multi(train, {"only": bench}, n=3).collect()
    }
    assert set(single) == set(multi) == {1, 2, 3}
    for did in single:
        assert multi[did]["n_grams"] == single[did]["n_grams"]
        assert multi[did]["n_contaminated"] == single[did]["n_contaminated"]
        assert multi[did]["contaminated"] == single[did]["contaminated"]
        assert (
            multi[did]["contamination_ratio"]
            == single[did]["contamination_ratio"]
        )


def test_strip_html_contract(spark):
    """Each documented extraction step: script/style content vanishes,
    comments vanish, tags become spaces (no word-gluing), entities
    decode with &amp; last (the &amp;lt; double-escape stays literal),
    whitespace collapses."""
    from d2b_dataframework_spark.datapipe.web import html_text_stats

    pages = spark.createDataFrame(
        [
            (1, "<p>hello</p><p>world</p>"),
            (2, "<script>var x = 'hello';</script>visible<style>p{}</style>"),
            (3, "a &amp;lt; b &lt; c &#39;d&#39; <!-- gone -->"),
            (4, '<a href="/x">one</a> <A HREF="/y">two</A> word'),
            (5, "<div>\n\n  spaced \t out  </div>"),
        ],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in html_text_stats(pages).collect()}
    assert rows[1]["text"] == "hello world"  # tags never glue words
    assert rows[2]["text"] == "visible"  # element CONTENT removed
    assert rows[3]["text"] == "a &lt; b < c 'd'"  # decode order contract
    assert rows[4]["n_links"] == 2  # case-insensitive anchor count
    assert rows[4]["text"] == "one two word"
    assert rows[5]["text"] == "spaced out"
    assert rows[4]["link_density"] == round(2 / 3, 6)
