"""Geospatial-lite operators: grid cells + bucketed spatial joins.

No GIS library exists in the reference or this image; what a pipeline
needs from Spark is the JOIN SHAPE — all-pairs-within-radius without an
all-pairs stage. Same blocking pattern as the LSH dedup family:

1. quantize (lat, lon) to a grid whose cell edge >= the search radius,
2. candidates = pairs sharing a cell OR any of the 8 neighbor cells
   (equi join on cell id — each left row probes 9 cells),
3. verify the exact distance predicate within candidates only.

Every qualifying pair shares at least one probed cell (cell edge >=
radius guarantees it), so recall is exactly 1.0 — asserted against a
brute-force oracle. Cost: candidates are bounded by local point density
x 9 cells, never |df|².

Distances use the equirectangular approximation (sqrt of sum of scaled
squares — IEEE-deterministic, unlike haversine's trig which differs
across libms); fine for near-radius queries away from the poles, which
is the blocking use case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# degrees per km at the equator (1/111.32); the approximation's scale
KM_PER_DEG = 111.32


def geo_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Grid-cell id for a (lat, lon) in degrees: row-major index over a
    global grid with ``cell_deg``-degree edges. Pure codegen arithmetic."""
    row = F.floor((lat + 90.0) / cell_deg).cast("bigint")
    col = F.floor((lon + 180.0) / cell_deg).cast("bigint")
    n_cols = int(360.0 / cell_deg) + 1
    return row * n_cols + col


def equirect_km(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Equirectangular distance in km (sqrt-only, engine-deterministic)."""
    # cos of mean latitude via a 6th-order polynomial? No — radians cos is
    # libm. Use the flat-grid form scaled at the MEAN latitude of the two
    # points with the small-angle-safe cos approximation cos(x) ≈
    # 1 - x²/2 + x⁴/24 (Taylor, |err| < 3e-4 for |lat| <= 60°) so the
    # whole expression stays +,*,/,sqrt.
    mean_lat_rad = (lat_a + lat_b) / 2.0 * (3.141592653589793 / 180.0)
    cos_lat = 1.0 - (mean_lat_rad * mean_lat_rad) / 2.0 + (
        mean_lat_rad * mean_lat_rad * mean_lat_rad * mean_lat_rad
    ) / 24.0
    dy = (lat_b - lat_a) * KM_PER_DEG
    dx = (lon_b - lon_a) * cos_lat * KM_PER_DEG
    return F.sqrt(dx * dx + dy * dy)


def spatial_self_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    min_cos_lat: float = 0.5,
) -> DataFrame:
    """All (id_a < id_b) pairs within ``radius_km``, via grid blocking.

    Cell edge = radius in LONGITUDE degrees at the worst latitude the
    data reaches (``min_cos_lat`` = cos of max |lat|, default 0.5 =
    |lat| <= 60°): longitude degrees shrink by cos(lat), so sizing cells
    by the latitude scale alone lets a radius span two lon cells near
    the poles and silently lose pairs. With the corrected edge, any
    qualifying pair shares one of the 9 probed cells — recall exactly 1.
    The only wide ops are the explode (9 rows/left point) and the equi
    join on cell id; density-bounded, never quadratic.
    """
    cell_deg = radius_km / (KM_PER_DEG * min_cos_lat)
    n_cols = int(360.0 / cell_deg) + 1
    base_row = F.floor((F.col(lat_col) + 90.0) / cell_deg).cast("bigint")
    base_col = F.floor((F.col(lon_col) + 180.0) / cell_deg).cast("bigint")

    probe_cells = F.array(
        *[
            (base_row + dr) * n_cols + (base_col + dc)
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ]
    )
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(lat_col).alias("lat_a"),
        F.col(lon_col).alias("lon_a"),
        F.explode(probe_cells).alias("cell"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(lat_col).alias("lat_b"),
        F.col(lon_col).alias("lon_b"),
        geo_cell(F.col(lat_col), F.col(lon_col), cell_deg).alias("cell"),
    )
    d = equirect_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= radius_km)
        .select("id_a", "id_b", "dist_km")
        .distinct()  # a pair can share several probed cells
    )


def spatial_neighbor_counts(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    min_cos_lat: float = 0.5,
) -> DataFrame:
    """Per-point COUNT of neighbors within ``radius_km`` — the bounded-
    output mode of the spatial self-join: output is one row per point
    (|df| rows), never the quadratic pair set, so a 100 TB caller who
    only wants density never materializes pairs they would immediately
    re-aggregate (SCALE.md: 328M pair rows at 10M events). Pairs exist
    only transiently inside the density-bounded candidate join; the
    count aggregation is map-side combinable. Points with no neighbor
    report 0 (left join back onto the point set)."""
    pairs = spatial_self_pairs(
        df, id_col, lat_col, lon_col, radius_km, min_cos_lat
    )
    both = pairs.select(F.col("id_a").alias("id")).unionAll(
        pairs.select(F.col("id_b").alias("id"))
    )
    counts = both.groupBy("id").agg(F.count("*").alias("n_neighbors"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(counts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_neighbors", F.lit(0)).cast("bigint").alias("n_neighbors"),
        )
    )


def spatial_topk_neighbors(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    k: int = 5,
    min_cos_lat: float = 0.5,
) -> DataFrame:
    """Per-point K NEAREST neighbors within ``radius_km`` — the other
    bounded-output mode: ≤ k rows per point regardless of local density.
    The symmetric pair set is windowed per point (partition key = the
    point id, so partitions are its neighbor list, bounded by density ×
    radius) and rank ≤ k kept; ties break deterministically by
    (dist_km, neighbor). Output: (id, neighbor, dist_km, rank)."""
    pairs = spatial_self_pairs(
        df, id_col, lat_col, lon_col, radius_km, min_cos_lat
    )
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("neighbor"), "dist_km"
    ).unionAll(
        pairs.select(
            F.col("id_b").alias("id"), F.col("id_a").alias("neighbor"), "dist_km"
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("dist_km", "neighbor")
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "neighbor", "dist_km", F.col("rank").cast("int").alias("rank")
        )
    )
