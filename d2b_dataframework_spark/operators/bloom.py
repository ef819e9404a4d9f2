"""Portable bloom-filter semi-join pruning — the shuffle-free
"does this key possibly exist on the other side?" pre-filter that keeps
a 100 TB probe scan from shuffling rows that cannot join.

Spark's own runtime row-group filtering covers simple cases; this
operator makes the structure EXPLICIT and portable: the filter is built
declaratively (k md5-prefix hash positions per key -> 32-bit words
bit_or-combined in one aggregation), ships as a tiny (n_bits/32)-row
frame that broadcasts anywhere, and probes with a broadcast join + bit
test — no Python, no driver-side bitmap, no engine-specific hash, so a
DuckDB oracle replays it bit-for-bit (same md5-prefix convention as
datapipe/splits.py:hash_bucket).

Guarantees: NO false negatives ever (a key on the build side always
passes). False positives pass the filter and cost only the downstream
join they would have reached anyway; size ``n_bits`` ≈ 10-15 bits/key
for ~1% FPR at k=3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, k: int, n_bits: int, salt: str) -> Column:
    """Array of the k bit positions for one key: md5-prefix hash with a
    per-hash salt prefix — 28-bit, portable to any engine with md5."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}{j}:"), key.cast("string"))),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(int(n_bits))
            for j in range(k)
        ]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter as (word: long, bits: long) rows — 32 bits per
    word so masks never touch the sign bit on any engine. One
    distinct + one explode + one bit_or aggregation; the output is
    ≤ ``n_bits/32`` rows (kilobytes), broadcastable forever after."""
    pos = (
        keys.select(F.col(key_col).cast("string").alias("_k"))
        .distinct()
        .select(F.explode(_positions(F.col("_k"), k, n_bits, salt)).alias("_pos"))
    )
    return (
        pos.select(
            (F.col("_pos") / 32).cast("long").alias("word"),
            F.expr("cast(shiftleft(1, cast(_pos % 32 as int)) as bigint)")
            .alias("_mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_might_contain(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Per-distinct-probe-key verdict: (key, might_contain). The bloom
    frame is broadcast (≤ n_bits/32 rows); each key tests its k bits via
    a left join on the word index — a missing word means those bits were
    never set (false). ``might_contain`` is true iff ALL k bits are set.
    """
    cand = (
        probe.select(F.col(key_col).cast("string").alias("_k"))
        .distinct()
        .select(
            "_k", F.explode(_positions(F.col("_k"), k, n_bits, salt)).alias("_pos")
        )
        .select(
            "_k",
            (F.col("_pos") / 32).cast("long").alias("word"),
            F.expr("cast(shiftleft(1, cast(_pos % 32 as int)) as bigint)")
            .alias("_mask"),
        )
    )
    hit = F.coalesce(
        (F.col("bits").bitwiseAND(F.col("_mask")) != 0), F.lit(False)
    )
    return (
        cand.join(F.broadcast(bloom), "word", "left")
        .select("_k", hit.alias("_hit"))
        .groupBy("_k")
        .agg(F.min("_hit").alias("might_contain"))
        .select(F.col("_k").alias(key_col), "might_contain")
    )


def bloom_prune(
    probe: DataFrame,
    build_keys: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    n_bits: int = 1 << 16,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Drop probe rows whose key cannot exist on the build side: build
    the filter from ``build_keys`` and keep only probe rows whose key
    might be present. The surviving key set is unbounded (near-total
    when most probe keys exist on the build side), so the pass-set join
    carries no broadcast hint — AQE picks broadcast at runtime iff the
    set turns out small. Rows dropped here never reach the real join's
    shuffle. No false negatives — the pruned result joined to the build
    side equals the unpruned join."""
    bloom = bloom_build(build_keys, build_key or probe_key, n_bits, k, salt)
    passing = bloom_might_contain(probe, bloom, probe_key, n_bits, k, salt)
    # the verdict keys are strings (hash input form) — semi-join on the
    # cast so the probe keeps its original key type; `passing` is one
    # row per distinct key, so semi ≡ the previous inner-join+drop
    keep = passing.filter("might_contain").select(
        F.col(probe_key).alias("_bloom_pass_key")
    )
    return probe.join(
        keep,
        F.col(probe_key).cast("string") == F.col("_bloom_pass_key"),
        "left_semi",
    )


def bloom_design_table(
    df: DataFrame,
    key_col: str,
    bits_per_key: tuple[int, ...] = (8, 12, 16, 20),
) -> DataFrame:
    """Bloom-filter capacity planning against the ACTUAL key
    cardinality: for each bits-per-key budget b, the filter size
    m = n·b, the optimal hash count k = round(b·ln 2), and the
    resulting false-positive rate (1 - e^(-k/b))^k — the sizing step
    before bloom_prune_join, the same planner shape as
    minhash_param_planner (which sizes LSH bands) and
    join_size_estimate (which sizes the join itself).

    Scale shape: one exact distinct-count aggregation over the key
    column, then a |bits_per_key|-row literal grid cross-joined against
    the single-row count — all the trigonometry happens on a handful of
    rows. Every constant (ln 2 included) is computed IN-ENGINE so the
    DuckDB oracle replays the identical doubles.
    """
    n = df.agg(F.count_distinct(F.col(key_col)).cast("long").alias("n_keys"))
    grid = None
    for b in bits_per_key:
        row = n.sparkSession.range(1).select(
            F.lit(int(b)).cast("long").alias("bits_per_key")
        )
        grid = row if grid is None else grid.unionAll(row)
    joined = grid.crossJoin(F.broadcast(n))
    b = F.col("bits_per_key").cast("double")
    k = F.greatest(
        F.lit(1).cast("long"),
        F.round(b * F.log(F.lit(2.0)), 0).cast("long"),
    )
    kd = k.cast("double")
    fpr = F.pow(F.lit(1.0) - F.exp(-kd / b), kd)
    return (
        joined.select(
            "bits_per_key",
            "n_keys",
            (F.col("bits_per_key") * F.col("n_keys")).cast("long").alias("m_bits"),
            k.alias("k_hashes"),
            (F.round(fpr, 6) + F.lit(0.0)).alias("fpr"),
        )
        .orderBy("bits_per_key")
    )
