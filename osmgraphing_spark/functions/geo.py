"""Geodesic helpers — the reference's haversine 'generating' op
(/root/reference/src/network/graph/building.rs:1150-1208): a derived edge
metric computed from joined endpoint coordinates, as pure column math
(radians/sin/cos/asin/sqrt — whole-stage codegen, no UDF)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_MEAN_RADIUS_KM = 6371.0


def haversine_km(lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column) -> Column:
    la, lb = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b - lat_a) / 2
    dlon = F.radians(lon_b - lon_a) / 2
    h = F.sin(dlat) ** 2 + F.cos(la) * F.cos(lb) * F.sin(dlon) ** 2
    return F.lit(2.0 * EARTH_MEAN_RADIUS_KM) * F.asin(F.sqrt(h))


def edge_lengths_km(
    edges: DataFrame, coords: DataFrame, id_col: str = "vid"
) -> DataFrame:
    """edges (src, dst) ⨝ coords (vid, lat, lon) twice → + length_km.
    The 'attach coordinates then derive metric' join shape (J1 + F2)."""
    a = coords.select(
        F.col(id_col).alias("src"), F.col("lat").alias("_lat_a"), F.col("lon").alias("_lon_a")
    )
    b = coords.select(
        F.col(id_col).alias("dst"), F.col("lat").alias("_lat_b"), F.col("lon").alias("_lon_b")
    )
    return (
        edges.join(a, "src")
        .join(b, "dst")
        .withColumn(
            "length_km",
            haversine_km(
                F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b")
            ),
        )
        .drop("_lat_a", "_lon_a", "_lat_b", "_lon_b")
    )
