"""Cross-engine-deterministic HyperLogLog NDV sketch.

``approx_count_distinct`` / DataSketches HLL (operators/sketches.py) are
the production tools for approximate NDV, but their estimates are
implementation-specific — no other engine reproduces them, so they can
never sit behind a value-matched oracle. This module implements classic
HyperLogLog (Flajolet et al. 2007) from *portable* primitives only —
md5-prefix hashing, integer division, binary-string bit length, exact
power-of-two register terms summed in fixed-point int64 — so the SAME
estimate is computable, bit-for-bit, by any engine with md5 (the DuckDB
mirror is :func:`hll_ndv_sql`). That makes approximate NDV testable
under the exact-value oracle gate rather than only under tolerance
assertions.

Determinism notes (why each step is order- and engine-independent):

- register update is ``max`` over integers — associative, commutative;
- the harmonic-mean denominator ``sum_j 2^-M_j`` is accumulated as
  ``sum_j 2^((61-p) - M_j)`` in int64 (every term exact, max sum 2^61 <
  int64 max) — integer addition cannot round, so partial-aggregation
  order is irrelevant;
- the final estimate is a fixed sequence of IEEE-double literal ops
  (one division, two multiplications, one round) mirrored verbatim in
  the SQL twin;
- the only transcendental is ``ln`` in the small-range linear-counting
  correction; a last-ulp ``ln`` divergence between libm implementations
  would need to land within ~1e-13 of a rounding boundary to change the
  integer output (documented, never observed in the test matrix).

Scale shape: explode to (col, bucket, rho) triples, partial-aggregated
map-side by (col, bucket) — the shuffle carries at most
``n_cols * m`` rows **per input partition** no matter the table size,
versus the exact-NDV explode+distinct whose shuffle is 5x the fact
table. This is the ANALYZE-stats path that survives 100 TB.

Reference parity: the reference recomputes COUNT(DISTINCT) from raw
rows wherever it needs cardinalities (pandas ``nunique`` over full
frames); this operator is the at-scale replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars of md5 = 60-bit uniform hash, the engine's portable hash
# convention (datapipe/splits.py md5-bucket uses the same kernel).
_HASH_BITS = 60


def _canon_str(c: Column, integral_collapse: bool) -> Column:
    """Engine-portable string image of a value for hashing. Doubles that
    hold integral values print differently across engines ("50.0" vs
    "50"); collapsing them to the integer string makes both sides hash
    identical bytes."""
    if integral_collapse:
        return F.when(
            c == F.round(c), c.cast("bigint").cast("string")
        ).otherwise(c.cast("string"))
    return c.cast("string")


def hll_ndv(
    df: DataFrame,
    cols: list[str],
    double_cols: set[str] | frozenset[str] = frozenset(),
    p: int = 10,
) -> DataFrame:
    """Approximate NDV per column via deterministic HLL with ``m = 2**p``
    registers (relative standard error ~1.04/sqrt(m); p=10 -> ~3.3%).

    Returns one row per column: ``(column, ndv_approx: bigint)``.
    ``double_cols`` names columns needing the integral-collapse string
    canonicalization (see :func:`_canon_str`).
    """
    m = 1 << p
    rho_max = _HASH_BITS - p + 1  # w == 0 -> all (60-p) suffix bits zero

    # Small-input parallelization guard: the md5 register stage is
    # CPU-bound, and a table small enough to scan in fewer splits than
    # there are cores would hash on a fraction of the machine (a 300MB
    # table is 3 parquet splits -> 3 of 32 threads). Repartitioning the
    # raw rows BEFORE the 5x explode spreads the hash work; at real
    # scale input splits >> cores, the guard never fires, and no
    # shuffle is added.
    sc = df.sparkSession.sparkContext
    df = df.select(*cols)  # prune before any repartition: narrow rows only
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    triples = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        _canon_str(F.col(c), c in double_cols).alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("cv")
    ).select("cv.c", "cv.v").filter(F.col("v").isNotNull())

    h = F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10).cast("long")
    staged = triples.select(
        "c",
        F.pmod(h, F.lit(m)).cast("int").alias("j"),
        h.alias("_h"),
    ).select(
        "c",
        "j",
        F.expr(f"_h DIV {m}").alias("w"),
    )
    # rho = leading zeros of w in its (60-p)-bit window, + 1.
    # bit_length(w) == length(bin(w)) exactly (no leading zeros printed);
    # w = 0 prints "0" (length 1) and means every suffix bit is zero.
    rho = F.when(F.col("w") == 0, F.lit(rho_max)).otherwise(
        F.lit(_HASH_BITS - p + 1) - F.length(F.bin(F.col("w")))
    )

    regs = (
        staged.select("c", "j", rho.alias("rho"))
        .groupBy("c", "j")
        .agg(F.max("rho").alias("mj"))
    )
    # Fixed-point register terms: 2^((61-p) - mj), exact in int64.
    scale = _HASH_BITS - p + 1  # 61 - p
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - mj)")
    per_col = regs.groupBy("c").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(term).alias("s_present"),
    )

    empty = F.lit(m).cast("long") - F.col("present")
    s_int = F.col("s_present") + empty * F.lit(1 << scale).cast("long")
    # alpha_m * m^2 * (2^scale / S)  — literal-for-literal mirrored in SQL
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    e_raw = (
        F.lit(alpha * float(m) * float(m))
        * (F.lit(float(1 << scale)) / s_int.cast("double"))
    )
    # Small-range correction: linear counting on empty registers.
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(e_raw)
    return per_col.select(
        F.col("c").alias("column"),
        F.round(e, 0).cast("long").alias("ndv_approx"),
    )


def hll_ndv_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Per-group approximate NDV — ``SELECT day, approx_distinct(user)``
    shaped, but with the deterministic registers so any engine verifies
    the exact output values. Returns group_cols + ``ndv_approx``.

    Scale shape: the register aggregation keys on (group, bucket) — the
    shuffle carries at most ``|groups| * m`` rows after map-side partial
    max, independent of the fact-table row count. The per-group sketch
    state is also the mergeable unit: persist the (group, j, mj) frame
    daily and re-aggregate for arbitrary date ranges (same pattern as
    operators/sketches.py HLL partials, minus the engine lock-in)."""
    return hll_estimate_from_registers(
        hll_registers_grouped(df, group_cols, value_col, p=p), group_cols, p=p
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 10,
) -> DataFrame:
    """Estimate per group from a deterministic-HLL register frame
    (group_cols + ``j`` + ``mj``) — the read side of the mergeable
    sketch store: registers persisted per day/shard merge with a plain
    ``max(mj)`` over any subset (associative, order-free), then this
    function turns the merged registers into counts. Exposed separately
    so rolling-window / arbitrary-range rollups can re-merge stored
    registers without touching raw data."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {scale} - mj)")
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(term).alias("s_present"),
    )
    empty = F.lit(m).cast("long") - F.col("present")
    s_int = F.col("s_present") + empty * F.lit(1 << scale).cast("long")
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    e_raw = (
        F.lit(alpha * float(m) * float(m))
        * (F.lit(float(1 << scale)) / s_int.cast("double"))
    )
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(e_raw)
    return per_group.select(
        *group_cols, F.round(e, 0).cast("long").alias("ndv_approx")
    )


def hll_registers_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """The register frame (group_cols, j, mj) itself — the persistable/
    mergeable unit behind :func:`hll_ndv_grouped` (which is exactly
    this + :func:`hll_estimate_from_registers`). This is the ONE place
    the register kernel lives for the grouped path — build-side changes
    cannot diverge from the rollup."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    rho_max = scale
    # small-input parallelization guard (see hll_ndv): spread the
    # CPU-bound md5 stage across cores when the input has fewer splits
    # than the machine; at real scale splits >> cores and this no-ops.
    sc = df.sparkSession.sparkContext
    df = df.select(*group_cols, value_col)  # prune before repartition
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    staged = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .select(
            *group_cols,
            F.pmod(F.col("_h"), F.lit(m)).cast("int").alias("j"),
            F.expr(f"_h DIV {m}").alias("w"),
        )
    )
    rho = F.when(F.col("w") == 0, F.lit(rho_max)).otherwise(
        F.lit(scale) - F.length(F.bin(F.col("w")))
    )
    return (
        staged.select(*group_cols, "j", rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("mj"))
    )


def hll_ndv_grouped_sql(
    table_expr: str,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> str:
    """DuckDB twin of :func:`hll_ndv_grouped`. ``table_expr`` is a table
    name or a parenthesized subquery exposing group_cols + value_col."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    rho_max = scale
    alpha_m2 = 0.7213 / (1.0 + 1.079 / float(m)) * float(m) * float(m)
    g = ", ".join(group_cols)
    return f"""
WITH hashed AS (
  SELECT {g}, ('0x' || substr(md5({value_col}::VARCHAR), 1, 15))::BIGINT AS h
  FROM {table_expr} WHERE {value_col} IS NOT NULL),
staged AS (
  SELECT {g}, h % {m} AS j, h // {m} AS w FROM hashed),
regs AS (
  SELECT {g}, j,
    max(CASE WHEN w = 0 THEN {rho_max}
             ELSE {scale} - length(bin(w)) END) AS mj
  FROM staged GROUP BY {g}, j),
per_group AS (
  SELECT {g}, count(*) AS present,
    SUM((1::BIGINT << ({scale} - mj)))::BIGINT AS s_present
  FROM regs GROUP BY {g}),
est AS (
  SELECT {g}, ({m}::BIGINT - present) AS empty,
    {alpha_m2!r} * ({float(1 << scale)!r} /
      (s_present + ({m}::BIGINT - present) * {1 << scale}::BIGINT)::DOUBLE)
      AS e_raw
  FROM per_group)
SELECT {g},
  CAST(round(CASE WHEN e_raw <= {2.5 * m!r} AND empty > 0
    THEN {float(m)!r} * ln({float(m)!r} / empty::DOUBLE)
    ELSE e_raw END, 0) AS BIGINT) AS ndv_approx
FROM est
"""


def hll_ndv_sql(
    table: str,
    cols: list[str],
    double_cols: set[str] | frozenset[str] = frozenset(),
    p: int = 10,
) -> str:
    """DuckDB SQL computing the identical estimate as :func:`hll_ndv` —
    same hash, same registers, same fixed-point sum, same literal
    arithmetic. Used as the oracle for the registry query."""
    m = 1 << p
    scale = _HASH_BITS - p + 1
    rho_max = scale
    alpha_m2 = 0.7213 / (1.0 + 1.079 / float(m)) * float(m) * float(m)

    def canon(c: str) -> str:
        if c in double_cols:
            return (
                f"CASE WHEN {c} = round({c}) THEN {c}::BIGINT::VARCHAR "
                f"ELSE {c}::VARCHAR END"
            )
        return f"{c}::VARCHAR"

    vals = "\nUNION ALL ".join(
        f"SELECT '{c}' AS c, {canon(c)} AS v FROM {table} WHERE {c} IS NOT NULL"
        for c in cols
    )
    return f"""
WITH vals AS ({vals}),
hashed AS (
  SELECT c, ('0x' || substr(md5(v), 1, 15))::BIGINT AS h FROM vals),
staged AS (
  SELECT c, h % {m} AS j, h // {m} AS w FROM hashed),
regs AS (
  SELECT c, j,
    max(CASE WHEN w = 0 THEN {rho_max}
             ELSE {scale} - length(bin(w)) END) AS mj
  FROM staged GROUP BY c, j),
per_col AS (
  SELECT c, count(*) AS present,
    SUM((1::BIGINT << ({scale} - mj)))::BIGINT AS s_present
  FROM regs GROUP BY c),
est AS (
  SELECT c, ({m}::BIGINT - present) AS empty,
    {alpha_m2!r} * ({float(1 << scale)!r} /
      (s_present + ({m}::BIGINT - present) * {1 << scale}::BIGINT)::DOUBLE)
      AS e_raw
  FROM per_col)
SELECT c AS "column",
  CAST(round(CASE WHEN e_raw <= {2.5 * m!r} AND empty > 0
    THEN {float(m)!r} * ln({float(m)!r} / empty::DOUBLE)
    ELSE e_raw END, 0) AS BIGINT) AS ndv_approx
FROM est
"""
