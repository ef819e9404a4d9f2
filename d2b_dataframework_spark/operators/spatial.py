"""Geospatial neighbor search with grid blocking.

The spatial analog of LSH banding: an all-pairs haversine join is
O(n²), so points are bucketed into fixed-size grid cells (cell edge ≥
search radius) and candidates come from an equi-join of each point's
cell against its 3×3 cell neighborhood — one shuffle on the cell key,
exact distance verified only inside the neighborhood. Same
candidate-then-verify discipline as datapipe/dedup.py; a degenerate
grid (all points in one cell) re-creates the quadratic join, so size
cells to the radius, not to the data.

Cell ids must be computed with INTEGER arithmetic by the caller —
float-derived floor() cells can disagree across engines at exact cell
boundaries (the oracle gate would flicker).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km; fixed parenthesization so an oracle
    writing the same formula reproduces the IEEE result."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * (F.sin(dlon) * F.sin(dlon))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_neighbor_pairs(
    pts: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    cell_x: Column,
    cell_y: Column,
    radius_km: float,
) -> DataFrame:
    """All point pairs within ``radius_km``, via 3×3 grid-cell blocking.
    Each pair surfaces exactly once (one cell-offset matches, and
    ``id_a < id_b`` orients it). Returns (id_a, id_b, distance_km)."""
    base = pts.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).alias("_lat"),
        F.col(lon_col).alias("_lon"),
        cell_x.cast("long").alias("_cx"),
        cell_y.cast("long").alias("_cy"),
    )
    a = base.select(
        F.col("_id").alias("id_a"),
        F.col("_lat").alias("_lat_a"),
        F.col("_lon").alias("_lon_a"),
        "_cx",
        "_cy",
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        F.col("_lat").alias("_lat_b"),
        F.col("_lon").alias("_lon_b"),
        F.explode(
            F.array(*[F.lit(d) for d in (-1, 0, 1)])
        ).alias("_dx"),
        "_cx",
        "_cy",
    ).select(
        "id_b",
        "_lat_b",
        "_lon_b",
        (F.col("_cx") + F.col("_dx")).alias("_cx"),
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("_dy"),
        "_cy",
    ).select(
        "id_b", "_lat_b", "_lon_b", "_cx", (F.col("_cy") + F.col("_dy")).alias("_cy")
    )
    dist = haversine_km(
        F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b")
    )
    return (
        a.join(b, ["_cx", "_cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance_km", F.round(dist, 6))
        .filter(F.col("distance_km") <= radius_km)
        .select("id_a", "id_b", "distance_km")
    )
