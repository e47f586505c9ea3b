"""Geospatial trip analytics — the reference's core domain ([R]
SURVEY.md §0.3: taxi-trip records with pickup/dropoff coordinates).

The fixture tables carry no lat/lon, so coordinates are DERIVED
deterministically from integer keys (pure integer arithmetic — exact
in both engines), then the classic trip ops run on top:

- ``geo_haversine_trip_distance``: great-circle leg distance between
  consecutive events per user (haversine), summed per user.  Each leg
  is quantized to integer metres before summation so the only float
  work is the per-leg trig, verified hash-stable at all three SFs.
- ``geo_grid_cell_density``: snap coordinates to a 1-degree grid and
  aggregate per cell — the spatial-precision-reduction anonymization
  op ([R]) expressed as integer floor-division, fully exact.

Scale notes (100 TB): both ops are single-shuffle.  The trip-distance
op is one window sort per user (same constraint as sessionization:
a user's events fit a partition; salt mega-users if not).  Grid
density is a partial+final hash aggregate on the cell key — cells are
a fixed 360x170 domain, so the final agg is tiny regardless of input
size; the top-k is TakeOrderedAndProject (per-task heaps, no global
sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.registry import op

CAT = "2.13 geo trip analytics"

# Derived coordinates: centi-degree integers from keys (exact in both
# engines; all operands non-negative so % semantics agree).
#   lat_centi in [0, 17000)  -> lat = lat_centi/100 - 85   in [-85, 85)
#   lon_centi in [0, 36000)  -> lon = lon_centi/100 - 180  in [-180, 180)
_LAT_CENTI = "((user_id * 7919 + event_id * 13) % 17000)"
_LON_CENTI = "((user_id * 104729 + event_id * 31) % 36000)"


def _with_coords(ev: DataFrame) -> DataFrame:
    return ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
        (F.expr(_LAT_CENTI) / 100.0 - 85.0).alias("lat"),
        (F.expr(_LON_CENTI) / 100.0 - 180.0).alias("lon"),
    )


_HAVERSINE_M = (
    "2 * 6371000 * asin(sqrt("
    "  pow(sin(radians(lat - plat) / 2), 2)"
    "  + cos(radians(plat)) * cos(radians(lat))"
    "    * pow(sin(radians(lon - plon) / 2), 2)))"
)


@op(
    "geo_haversine_trip_distance",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {_LAT_CENTI} / 100.0 - 85.0  AS lat,
         {_LON_CENTI} / 100.0 - 180.0 AS lon
  FROM events
),
legs AS (
  SELECT user_id, lat, lon,
         lag(lat) OVER w AS plat,
         lag(lon) OVER w AS plon
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_legs,
       CAST(sum(CAST(round({_HAVERSINE_M}) AS BIGINT)) AS BIGINT) AS total_m
FROM legs
WHERE plat IS NOT NULL
GROUP BY user_id
""",
    category=CAT,
)
def geo_haversine_trip_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user total great-circle distance over consecutive event
    'legs'.  Haversine on derived coordinates; each leg rounded to
    integer metres BEFORE the sum so aggregation is exact-integer
    (SURVEY.md §5.3 rule 1 taken to its limit)."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pts = _with_coords(load(spark, sf_dir, "events"))
    legs = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    leg_m = F.round(F.expr(_HAVERSINE_M)).cast("bigint")
    return legs.groupBy("user_id").agg(
        bigint(F.count(F.lit(1))).alias("n_legs"),
        bigint(F.sum(leg_m)).alias("total_m"),
    )


@op(
    "geo_grid_cell_density",
    oracle=f"""
WITH cells AS (
  SELECT ({_LAT_CENTI} // 100) - 85  AS cell_lat,
         ({_LON_CENTI} // 100) - 180 AS cell_lon,
         CAST(round(value * 100) AS BIGINT) AS val_cents
  FROM events
)
SELECT cell_lat, cell_lon,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(val_cents) / 100.0, 2) AS total_value
FROM cells
GROUP BY cell_lat, cell_lon
ORDER BY n_events DESC, cell_lat, cell_lon
LIMIT 20
""",
    category=CAT,
)
def geo_grid_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial-precision-reduction anonymization + density: floor-snap
    derived coordinates to 1-degree cells (integer // — exact), count
    and sum cents per cell, top-20 cells with a total tie-break."""
    ev = load(spark, sf_dir, "events").select(
        (F.expr(f"{_LAT_CENTI} div 100") - 85).alias("cell_lat"),
        (F.expr(f"{_LON_CENTI} div 100") - 180).alias("cell_lon"),
        F.round(F.col("value") * 100).cast("bigint").alias("val_cents"),
    )
    return (
        ev.groupBy("cell_lat", "cell_lon")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_events"),
            F.round(F.sum("val_cents") / 100.0, 2).alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), "cell_lat", "cell_lon")
        .limit(20)
    )


@op(
    "geo_trip_od_matrix",
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {_LAT_CENTI} // 100 AS cell_lat,
         {_LON_CENTI} // 100 AS cell_lon
  FROM events
),
legs AS (
  SELECT user_id,
         lag(cell_lat) OVER w AS o_lat, lag(cell_lon) OVER w AS o_lon,
         cell_lat AS d_lat, cell_lon AS d_lon
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT CAST(o_lat AS BIGINT) AS o_lat, CAST(o_lon AS BIGINT) AS o_lon,
       CAST(d_lat AS BIGINT) AS d_lat, CAST(d_lon AS BIGINT) AS d_lon,
       CAST(count(*) AS BIGINT) AS n_trips
FROM legs WHERE o_lat IS NOT NULL
GROUP BY 1, 2, 3, 4
ORDER BY n_trips DESC, o_lat, o_lon, d_lat, d_lon
LIMIT 30
""",
    category=CAT,
)
def geo_trip_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination matrix: consecutive events per user form
    trips between 1-degree grid cells; the top-30 (origin, destination)
    cell pairs by trip count — the classic city-flow rollup a trip
    pipeline publishes.

    Exactness: cells are pure integer arithmetic; ranking is integer
    counts with full integer tie-breaks.  Scale: one window sort per
    user (shared with the haversine op's partitioning), then a
    partial+final aggregate on the bounded cell-pair domain;
    TakeOrderedAndProject for the top-k."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pts = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr(_LAT_CENTI + " div 100").alias("cell_lat"),
        F.expr(_LON_CENTI + " div 100").alias("cell_lon"),
    )
    legs = pts.select(
        "user_id",
        F.lag("cell_lat").over(w).alias("o_lat"),
        F.lag("cell_lon").over(w).alias("o_lon"),
        F.col("cell_lat").alias("d_lat"),
        F.col("cell_lon").alias("d_lon"),
    ).filter(F.col("o_lat").isNotNull())
    return (
        legs.groupBy(
            bigint(F.col("o_lat")).alias("o_lat"),
            bigint(F.col("o_lon")).alias("o_lon"),
            bigint(F.col("d_lat")).alias("d_lat"),
            bigint(F.col("d_lon")).alias("d_lon"),
        )
        .agg(bigint(F.count(F.lit(1))).alias("n_trips"))
        .orderBy(
            F.col("n_trips").desc(), "o_lat", "o_lon", "d_lat", "d_lon"
        )
        .limit(30)
    )
