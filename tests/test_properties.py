"""Property-based tests (hypothesis): engine-portability invariants that
example tests can't sweep — arbitrary unicode ids/weights/sizes. These
guard the determinism contracts the oracle gate relies on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ids=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=30, unique=True),
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=5),
        min_size=2,
        max_size=4,
    ),
)
@settings(**SETTINGS)
def test_assign_split_total_and_stable(spark, ids, weights):
    """Every row lands in exactly one split, and assignment is invariant
    under repartitioning (pure function of the id)."""
    from d2b_dataframework_spark.datapipe.splits import assign_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in assign_split(df, weights=weights).collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_split(df.repartition(5), weights=weights).collect()}
    assert a == b
    assert set(a) == set(ids)
    assert set(a.values()) <= set(weights)


@given(
    texts=st.lists(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_minhash_vectorized_twin_on_arbitrary_unicode(spark, texts):
    """The Arrow twin must hash ARBITRARY unicode identically to the
    declarative path (the r1 caveat, generalized beyond examples)."""
    from d2b_dataframework_spark.datapipe import dedup as dd

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = ["doc_id"] + [f"mh_{i}" for i in range(dd.N_HASHES)]
    fast = sorted(
        tuple(r[c] for c in cols)
        for r in dd.minhash_signatures(df, vectorized=True).collect()
    )
    slow = sorted(
        tuple(r[c] for c in cols)
        for r in dd.minhash_signatures(df, vectorized=False).collect()
    )
    assert fast == slow


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=25),
    budget=st.integers(min_value=64, max_value=512),
)
@settings(**SETTINGS)
def test_pack_plan_never_splits_mid_doc_and_fills_in_order(spark, sizes, budget):
    from d2b_dataframework_spark.datapipe.packing import pack_plan

    rows = [(i, "s", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tokens long")
    out = sorted(
        pack_plan(df, budget=budget, partition_cols=["shard"]).collect(),
        key=lambda r: (r["pack_id"], r["offset_in_pack"]),
    )
    # concat-and-split: global stream offset is contiguous over doc order
    stream = 0
    for r in out:
        assert r["pack_id"] * budget + r["offset_in_pack"] == stream
        stream += sizes[r["doc_id"]]
    assert len(out) == len(sizes)


@given(
    vals=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=2,
        max_size=16,
    )
)
@settings(**SETTINGS)
def test_quantize_int8_roundtrip_error_bound(spark, vals):
    """|x - code*scale| <= scale/2 per element (half-up rounding), so
    recon_err <= dim * (scale/2)^2 + fp slack."""
    from d2b_dataframework_spark.datapipe.similarity import quantize_int8

    df = spark.createDataFrame([(1, vals)], "vec_id long, embedding array<double>")
    r = quantize_int8(df).collect()[0]
    codes = [int(c) for c in r["codes"].split(",")]
    assert all(-127 <= c <= 127 for c in codes)
    bound = len(vals) * (r["scale"] / 2.0) ** 2 if r["scale"] else 0.0
    assert r["recon_err"] <= bound * 1.001 + 1e-9


@given(
    n=st.integers(min_value=1, max_value=400),
    k=st.integers(min_value=1, max_value=12),
)
@settings(**SETTINGS)
def test_ntile_from_rank_matches_reference_arithmetic(spark, n, k):
    from pyspark.sql import functions as F

    from d2b_dataframework_spark.operators.ranking import ntile_from_rank

    got = {
        r["rn"]: r["ph"]
        for r in spark.range(1, n + 1)
        .select(F.col("id").alias("rn"))
        .select("rn", ntile_from_rank("rn", F.lit(n), k).alias("ph"))
        .collect()
    }

    def ref(rn: int) -> int:  # SQL NTILE definition
        base, rem = divmod(n, k)
        if base == 0:
            return rn
        cutoff = rem * (base + 1)
        if rn <= cutoff:
            return -(-rn // (base + 1))
        return rem + (-(-(rn - cutoff) // base))

    assert got == {rn: ref(rn) for rn in range(1, n + 1)}


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_zorder_value_is_invertible(spark, pts):
    from pyspark.sql import functions as F

    from d2b_dataframework_spark.operators.layout import zorder_value

    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y", zorder_value("x", "y", bits=10).alias("z")).collect()

    def decode(z: int) -> tuple[int, int]:
        x = y = 0
        for i in range(10):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        return x, y

    for r in rows:
        assert decode(r["z"]) == (r["x"], r["y"])


@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=999.999, allow_nan=False),
        min_size=5,
        max_size=60,
    ),
    qs=st.lists(st.sampled_from([0.1, 0.25, 0.5, 0.9, 0.99]), min_size=1, max_size=3, unique=True),
)
@settings(**SETTINGS)
def test_histogram_quantile_error_bounded_by_bin_width(spark, vals, qs):
    """For ANY input within range, every sketch quantile lands within
    one bin width of a true value's neighborhood, and sharded partials
    re-summed give identical estimates (merge exactness)."""
    import numpy as np

    from pyspark.sql import functions as F

    from d2b_dataframework_spark.operators import sketches as sk

    lo, hi, bins = 0.0, 1000.0, 100
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    whole = sk.histogram_partials(df, "v", lo, hi, bins)
    merged = sk.histogram_partials(df.filter(F.col("id") % 2 == 0), "v", lo, hi, bins).unionByName(
        sk.histogram_partials(df.filter(F.col("id") % 2 == 1), "v", lo, hi, bins)
    )
    est_w = {r["q"]: r["est"] for r in sk.histogram_quantiles(whole, lo, hi, bins, qs).collect()}
    est_m = {r["q"]: r["est"] for r in sk.histogram_quantiles(merged, lo, hi, bins, qs).collect()}
    assert est_w == est_m
    width = (hi - lo) / bins
    ordered = sorted(vals)
    for q in qs:
        # the guarantee is vs the STEP-CDF quantile (the ceil(qN)-th
        # order statistic): the estimate lands in that value's bin, so
        # it is within one bin width of it. Interpolated quantiles
        # (np.quantile's default) can sit mid-gap arbitrarily far from
        # any bin — hypothesis found exactly that case.
        import math

        exact = ordered[math.ceil(q * len(ordered)) - 1]
        assert abs(est_w[q] - exact) <= width + 1e-9, (q, est_w[q], exact)


@given(
    keys_a=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=80),
    keys_b=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=80),
)
@settings(**SETTINGS)
def test_cms_join_estimate_never_undercounts(spark, keys_a, keys_b):
    from collections import Counter

    from d2b_dataframework_spark.operators import sketches as sk

    a = spark.createDataFrame([(i, str(k)) for i, k in enumerate(keys_a)], "id long, k string")
    b = spark.createDataFrame([(i, str(k)) for i, k in enumerate(keys_b)], "id long, k string")
    ca, cb = Counter(keys_a), Counter(keys_b)
    exact = sum(ca[k] * cb[k] for k in ca)
    est = sk.cms_join_size_estimate(
        sk.cms_partials(a, "k", d=4, w=32), sk.cms_partials(b, "k", d=4, w=32)
    ).collect()[0]["est"]
    assert est >= exact


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)
        ),
        min_size=1,
        max_size=60,
    ),
)
@settings(**SETTINGS)
def test_skyline_matches_quadratic_reference(spark, pts):
    from d2b_dataframework_spark.operators.ranking import skyline_2d

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"] for r in skyline_2d(df, "x", "y").collect()}
    expect = {
        i
        for i, x, y in rows
        if not any(
            ox <= x and oy >= y and (ox < x or oy > y) for _, ox, oy in rows
        )
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Recurrence family (VERDICT r3 #7): random per-key sequences, engine ==
# independent pure-Python replay, step-exact IEEE. The oracle SQL for
# these queries replays the same algorithm, so these sweeps are the
# independent semantic check (plus they exercise grouping, ordering and
# the Arrow round-trip on arbitrary inputs).
# ---------------------------------------------------------------------------

_SEQ = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=64),
    min_size=1,
    max_size=25,
)
_GROUPS = st.dictionaries(
    st.integers(min_value=0, max_value=5), _SEQ, min_size=1, max_size=4
)


def _rows_shuffled(groups):
    """(key, i, v) rows in a scrambled interleaving — the operator must
    re-establish per-key order itself."""
    rows = [(k, i, v) for k, vs in groups.items() for i, v in enumerate(vs)]
    # deterministic scramble (no RNG in tests): sort by a hash-ish key
    rows.sort(key=lambda r: ((r[1] * 2654435761 + r[0] * 40503) % 97, r[0]))
    return rows


@given(groups=_GROUPS, floor=st.sampled_from([0.0, -10.0, 5.0]))
@settings(**SETTINGS)
def test_clamped_balance_matches_replay(spark, groups, floor):
    from d2b_dataframework_spark.operators.recurrence import clamped_running_balance

    df = spark.createDataFrame(
        _rows_shuffled(groups), "key long, i long, delta double"
    )
    got = {
        r["key"]: (r["balance"], r["n_clamped"])
        for r in clamped_running_balance(
            df, "key", ["i"], "delta", floor=floor
        ).collect()
    }
    for k, vs in groups.items():
        bal, clamps = float(floor), 0
        for d in vs:
            nxt = bal + float(d)
            if nxt < floor:
                clamps, bal = clamps + 1, floor
            else:
                bal = nxt
        assert got[k] == (bal, clamps), f"key {k}"


@given(
    groups=_GROUPS,
    target=st.sampled_from([0.0, 1.5]),
    slack=st.sampled_from([0.0, 0.5]),
    threshold=st.sampled_from([1.0, 10.0, 100.0]),
)
@settings(**SETTINGS)
def test_cusum_matches_replay(spark, groups, target, slack, threshold):
    from d2b_dataframework_spark.operators.recurrence import cusum_alerts

    df = spark.createDataFrame(
        _rows_shuffled(groups), "key long, i long, x double"
    )
    got = {
        r["key"]: (r["n_alerts"], r["final_stat"], r["peak_stat"])
        for r in cusum_alerts(
            df, "key", ["i"], "x", target=target, slack=slack, threshold=threshold
        ).collect()
    }
    drift = float(target) + float(slack)
    for k, vs in groups.items():
        s, peak, alerts = 0.0, 0.0, 0
        for x in vs:
            nxt = s + (float(x) - drift)
            s = nxt if nxt > 0.0 else 0.0
            peak = s if s > peak else peak
            if s > threshold:
                alerts, s = alerts + 1, 0.0
        assert got[k] == (alerts, s, peak), f"key {k}"


@given(groups=_GROUPS, ab=st.sampled_from([(0.5, 0.3), (0.2, 0.8), (1.0, 0.0)]))
@settings(**SETTINGS)
def test_holt_matches_replay(spark, groups, ab):
    from d2b_dataframework_spark.operators.recurrence import holt_smoothing

    alpha, beta = ab
    df = spark.createDataFrame(
        _rows_shuffled(groups), "key long, i long, v double"
    )
    got = {
        r["key"]: (r["level"], r["trend"], r["forecast_next"])
        for r in holt_smoothing(
            df, "key", ["i"], "v", alpha=alpha, beta=beta
        ).collect()
    }
    for k, vs in groups.items():
        level, trend = float(vs[0]), 0.0
        for v in vs[1:]:
            prev = level
            level = alpha * float(v) + (1.0 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1.0 - beta) * trend
        assert got[str(k)] == (level, trend, level + trend), f"key {k}"


@given(
    build=st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    probe=st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
)
@settings(**SETTINGS)
def test_bloom_prune_never_false_negative(spark, build, probe):
    """The pruned probe joined to the build side equals the unpruned
    join — bloom filters may over-keep, never drop a true match."""
    from d2b_dataframework_spark.operators.bloom import bloom_prune

    bdf = spark.createDataFrame([(k,) for k in build], "k long")
    pdf = spark.createDataFrame([(k,) for k in probe], "k long")
    kept = {
        r["k"]
        for r in bloom_prune(pdf, bdf, "k", n_bits=256, k=3).collect()
    }
    assert kept >= (probe & build)          # no false negatives
    assert kept <= probe                     # pruning only drops rows


@given(
    keys=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=60,
    ),
    phi_th=st.sampled_from(["0.1", "0.2", "0.25", "0.5"]),
    parts=st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_heavy_hitters_equals_group_by_twin(spark, keys, phi_th, parts):
    """The two-pass candidate-bounded heavy hitter result equals plain
    GROUP BY / HAVING ceil(phi*N) under ANY partition layout — the
    pigeonhole superset guarantee plus exact verify, swept over random
    key streams, thresholds, and partitionings."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    from d2b_dataframework_spark.operators.frequency import heavy_hitters

    phi = float(phi_th)
    df = spark.createDataFrame([(k,) for k in keys], "k string").repartition(parts)
    thr = math.ceil(Fraction(phi_th) * len(keys))
    twin = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .collect()
    }
    got = {(r["k"], r["cnt"]) for r in heavy_hitters(df, "k", phi).collect()}
    assert got == twin


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=40,
    ),
)
@settings(**SETTINGS)
def test_fd_violations_matches_pure_python_g3(spark, rows):
    """g3 accounting equals a brute-force per-group majority replay."""
    from collections import Counter, defaultdict

    from d2b_dataframework_spark.operators.quality import fd_violations

    df = spark.createDataFrame(rows, "k long, v string")
    r = fd_violations(df, ["k"], "v").collect()[0]

    groups = defaultdict(Counter)
    for k, v in rows:
        groups[k][v] += 1
    viol = sum(sum(c.values()) - max(c.values()) for c in groups.values())
    assert r["n_groups"] == len(groups)
    assert r["n_rows"] == len(rows)
    assert r["violations"] == viol
    assert r["violating_groups"] == sum(1 for c in groups.values() if len(c) > 1)
    assert r["g3_error"] == round(viol / len(rows), 6)


@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            st.sampled_from(["a", "b"]),
        ),
        min_size=2,
        max_size=30,
    ),
    thresholds=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=5,
        unique=True,
    ),
)
@settings(**SETTINGS)
def test_decision_stump_matches_pure_python_gini(spark, pts, thresholds):
    """Weighted Gini per candidate equals an independent float replay
    (same operand order: counts -> squares -> quotients -> weighted sum)."""
    from collections import Counter

    from d2b_dataframework_spark.datapipe.classify import decision_stump

    df = spark.createDataFrame([(float(x), y) for x, y in pts], "x double, y string")
    got = {r["threshold"]: (r["n_left"], r["n_right"], r["weighted_gini"])
           for r in decision_stump(df, "x", "y", [float(t) for t in thresholds]).collect()}

    for t in (float(t) for t in thresholds):
        left = Counter(y for x, y in pts if float(x) <= t)
        right = Counter(y for x, y in pts if float(x) > t)
        n_l, n_r = sum(left.values()), sum(right.values())
        n = n_l + n_r
        sql2 = sum(c * c for c in left.values())
        sqr2 = sum(c * c for c in right.values())
        g_l = 1.0 - sql2 / float(n_l * n_l) if n_l > 0 else 0.0
        g_r = 1.0 - sqr2 / float(n_r * n_r) if n_r > 0 else 0.0
        want = round((n_l / float(n)) * g_l + (n_r / float(n)) * g_r, 9)
        assert got[t][:2] == (n_l, n_r)
        assert abs(got[t][2] - want) < 1e-12


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.lists(st.sampled_from(["t1", "t2", "t3", "t4"]), min_size=1, max_size=6),
        ),
        min_size=2,
        max_size=12,
    ).filter(lambda d: len({lab for lab, _ in d}) == 2),
)
@settings(**SETTINGS)
def test_naive_bayes_matches_pure_python_replay(spark, docs):
    """Argmax class per test doc equals an independent add-1 multinomial
    NB replay (scores compared in plain float math; the engine's decimal
    accumulation only reorders sums of identical 9-dec terms)."""
    import math
    from collections import Counter

    from d2b_dataframework_spark.datapipe.classify import naive_bayes_predict

    train_rows = [(i, lab, tk) for i, (lab, tk) in enumerate(docs)]
    test_rows = [(100 + i, lab, tk) for i, (lab, tk) in enumerate(docs[: max(1, len(docs) // 2)])]
    train = spark.createDataFrame(train_rows, "doc_id long, label string, _tk array<string>")
    test = spark.createDataFrame(test_rows, "doc_id long, label string, _tk array<string>")
    got = {r["doc_id"]: r["predicted"] for r in naive_bayes_predict(train, test).collect()}

    ctc: dict[str, Counter] = {"A": Counter(), "B": Counter()}
    nd = Counter()
    for _, lab, tk in train_rows:
        nd[lab] += 1
        ctc[lab].update(tk)
    vocab = {t for c in ctc.values() for t in c}
    v = len(vocab)
    ndocs = sum(nd.values())
    for doc_id, _, tk in test_rows:
        scores = {}
        for c in ("A", "B"):
            t_c = sum(ctc[c].values())
            s = round(math.log(nd[c] / ndocs), 9)
            for t in tk:
                s += round(math.log((ctc[c][t] + 1) / (t_c + v)), 9)
            scores[c] = s
        # argmax with class-name tiebreak ascending
        want = min(scores, key=lambda c: (-scores[c], c))
        best, second = sorted(scores.values(), reverse=True)
        if best - second < 1e-6:
            continue  # too close to assert across accumulation orders
        assert got[doc_id] == want, (doc_id, scores)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.5, 0.7, 0.9, 1.0]),
)
@settings(**SETTINGS)
def test_prefix_filter_lossless_vs_bruteforce(spark, docs, threshold):
    """Prefix filtering's central claim — losslessness for J >= t — holds
    on arbitrary tiny corpora: output == brute-force exact Jaccard."""
    from itertools import combinations

    from d2b_dataframework_spark.datapipe.dedup import prefix_filter_pairs

    texts = {i: " ".join(tk) for i, tk in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]) for r in prefix_filter_pairs(df, threshold=threshold, n=1).collect()}

    def jac(a, b):
        sa, sb = set(texts[a].split()), set(texts[b].split())
        return len(sa & sb) / len(sa | sb)

    want = {(a, b) for a, b in combinations(sorted(texts), 2) if round(jac(a, b), 6) >= threshold}
    assert got == want


# -- graph family: random <=12-node graphs vs pure-Python replay ------------
# These oracles (kcore_filter / bfs_hops / label_propagation) replay the
# same unrolled algorithm in SQL, so — like the recurrence family — a
# property sweep against an INDEPENDENT in-memory replay is the only
# check that isn't the algorithm testing itself.

_GRAPH_EDGES = st.sets(
    st.tuples(st.integers(0, 11), st.integers(0, 11))
    .filter(lambda p: p[0] != p[1])
    .map(lambda p: (min(p), max(p))),
    min_size=1,
    max_size=22,
)
_GRAPH_SETTINGS = {**SETTINGS, "max_examples": 10}


def _adj(edges):
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


@given(edges=_GRAPH_EDGES, k=st.integers(1, 3), iters=st.integers(1, 3))
@settings(**_GRAPH_SETTINGS)
def test_kcore_matches_replay(spark, edges, k, iters):
    """Fixed-iteration peel == in-memory replay: alive' = {n : |adj(n) ∩
    alive| >= k}; output degrees measured in the FINAL alive subgraph,
    nodes with 0 surviving peers absent (no incidence rows survive)."""
    from d2b_dataframework_spark.datapipe.graph import kcore_filter

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r["node"]: r["degree"] for r in kcore_filter(df, k=k, iterations=iters).collect()}

    adj = _adj(edges)
    alive = set(adj)
    for _ in range(iters):
        alive = {n for n in alive if len(adj[n] & alive) >= k}
    want = {n: len(adj[n] & alive) for n in alive if adj[n] & alive}
    assert got == want


@given(edges=_GRAPH_EDGES, seeds=st.sets(st.integers(0, 13), min_size=1, max_size=4),
       hops=st.integers(1, 3))
@settings(**_GRAPH_SETTINGS)
def test_bfs_hops_matches_replay(spark, edges, seeds, hops):
    """Multi-source BFS == min-hop-from-any-seed replay, capped at
    max_hops; seeds outside the graph still appear at hop 0."""
    from d2b_dataframework_spark.datapipe.graph import bfs_hops

    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sorted(seeds)], "node long")
    got = {r["node"]: r["hop"] for r in bfs_hops(e, s, max_hops=hops).collect()}

    adj = _adj(edges)
    dist = {n: 0 for n in seeds}
    frontier = set(seeds)
    for h in range(1, hops + 1):
        frontier = {
            p for n in frontier for p in adj.get(n, ()) if p not in dist
        }
        for p in frontier:
            dist[p] = h
    assert got == dist


@given(edges=_GRAPH_EDGES, iters=st.integers(1, 3))
@settings(**_GRAPH_SETTINGS)
def test_label_propagation_matches_replay(spark, edges, iters):
    """Synchronous LPA == replay: every node relabels from the PREVIOUS
    iteration's labels to the most frequent neighbor label, ties to the
    smallest label."""
    from collections import Counter

    from d2b_dataframework_spark.datapipe.graph import label_propagation

    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(df, iterations=iters).collect()}

    adj = _adj(edges)
    labels = {n: n for n in adj}
    for _ in range(iters):
        labels = {
            n: min(Counter(labels[p] for p in adj[n]).items(),
                   key=lambda kv: (-kv[1], kv[0]))[0]
            for n in adj
        }
    assert got == labels


@given(
    groups=st.dictionaries(
        st.integers(min_value=0, max_value=5),
        st.lists(st.sampled_from([0.0, 0.0, 1.0, 2.5, 7.0]), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    ),
    alpha=st.sampled_from([0.1, 0.3, 0.5]),
)
@settings(**SETTINGS)
def test_croston_matches_replay(spark, groups, alpha):
    """Croston z/p state == in-memory replay for arbitrary zero-inflated
    series (the recurrence-family sweep, extended to the new member)."""
    from d2b_dataframework_spark.operators.recurrence import croston_forecast

    rows = [(k, i, v) for k, vs in groups.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "key long, i long, v double")
    got = {
        r["key"]: (r["n_periods"], r["n_demand_periods"], r["z"], r["p"], r["forecast"])
        for r in croston_forecast(df, "key", ["i"], "v", alpha=alpha).collect()
    }
    for k, vs in groups.items():
        z = p = None
        q, nd = 1, 0
        for x in vs:
            if x > 0.0:
                nd += 1
                if z is None:
                    z, p = x, float(q)
                else:
                    z = alpha * x + (1.0 - alpha) * z
                    p = alpha * q + (1.0 - alpha) * p
                q = 1
            else:
                q += 1
        fc = (z / p) if z is not None else 0.0
        assert got[k] == (len(vs), nd, z, p, fc), f"key {k}"


@given(
    groups=_GROUPS,
    abg=st.sampled_from([(0.5, 0.3, 0.3), (0.2, 0.1, 0.6), (0.8, 0.0, 0.2)]),
    period=st.sampled_from([2, 3, 7]),
)
@settings(**SETTINGS)
def test_holt_winters_matches_replay(spark, groups, abg, period):
    """Triple-exponential state == in-memory replay (the recurrence-
    family sweep extended to the seasonal member)."""
    from d2b_dataframework_spark.operators.recurrence import holt_winters

    alpha, beta, gamma = abg
    df = spark.createDataFrame(
        _rows_shuffled(groups), "key long, i long, v double"
    )
    got = {
        r["key"]: (r["level"], r["trend"], r["season_next"], r["forecast_next"])
        for r in holt_winters(
            df, "key", ["i"], "v", alpha=alpha, beta=beta, gamma=gamma,
            period=period,
        ).collect()
    }
    for k, vs in groups.items():
        level, trend = float(vs[0]), 0.0
        s = [0.0] * period
        for t in range(1, len(vs)):
            x, idx = float(vs[t]), t % period
            prev = level
            level = alpha * (x - s[idx]) + (1.0 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1.0 - beta) * trend
            s[idx] = gamma * (x - level) + (1.0 - gamma) * s[idx]
        nxt = s[len(vs) % period]
        assert got[str(k)] == (level, trend, nxt, level + trend + nxt), f"key {k}"


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=14),
        min_size=2,
        max_size=6,
    ),
    min_run=st.sampled_from([1, 2, 3]),
)
@settings(**SETTINGS)
def test_duplicate_spans_matches_python_reference(spark, docs, min_run):
    """Diagonal-run span detection equals an independent O(n²·L²)
    pure-Python sweep on arbitrary tiny corpora (uncapped): every
    maximal run of consecutive equal 3-grams between each doc pair,
    with exact start positions and lengths. A 4-letter alphabet makes
    repeated grams (multiple diagonals, within-doc repeats) common —
    the cases the island trick must not merge or split wrongly."""
    from d2b_dataframework_spark.datapipe.cache import release
    from d2b_dataframework_spark.datapipe.dedup import duplicate_spans

    texts = {i: " ".join(tk) for i, tk in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = duplicate_spans(df, min_run=min_run, n=3, max_df=None)
    got = {
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["run_grams"])
        for r in out.collect()
    }
    release(out)

    def grams(t):
        toks = t.split(" ")
        if len(toks) < 3:
            return [" ".join(toks)]
        return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]

    want = set()
    ids = sorted(texts)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ga, gb = grams(texts[a]), grams(texts[b])
            for diag in range(-(len(gb) - 1), len(ga)):
                run = 0
                for pb in range(len(gb)):
                    pa = pb + diag
                    if 0 <= pa < len(ga) and ga[pa] == gb[pb]:
                        run += 1
                    else:
                        if run >= min_run:
                            want.add((a, b, pa - run, pb - run, run))
                        run = 0
                if run >= min_run:
                    want.add((a, b, len(gb) + diag - run, len(gb) - run, run))
    assert got == want
