"""Geospatial primitives (north-star extension): grid-blocked radius
joins over point data.

The reference has no spatial surface; this is the standard first rung of
one — the proximity self-join ("pairs of points within r km") that powers
store-coverage, fraud-colocation and dedup-by-location analyses, built
the way every distributed spatial engine blocks it: bucket points into a
fixed lon/lat grid whose cell edge >= the radius, join each point's cell
against the 3x3 neighborhood (any pair within r must fall in adjacent
cells), then verify the exact distance on candidates only — never the
all-pairs cross join.

Distance metric: local planar (equirectangular) approximation with the
km-per-degree factors as PLAN LITERALS — pure *, +, sqrt arithmetic, so
engines agree bit-for-bit (a haversine would drag sin/asin libm calls
into the comparison; at city scale the planar error is < 0.1% and the
at-scale upgrade is swapping the distance expression, not the plan).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KM_PER_DEG_LAT = 111.32


def km_per_deg_lon(ref_lat_deg: float) -> float:
    """Longitude km-per-degree at the reference latitude — computed ONCE
    driver-side and inlined as a literal on both engine and oracle sides
    (the convention-is-the-spec pattern)."""
    return KM_PER_DEG_LAT * math.cos(math.radians(ref_lat_deg))


def planar_dist_km(lat_a: Column, lon_a: Column, lat_b: Column,
                   lon_b: Column, ref_lat_deg: float) -> Column:
    kx = km_per_deg_lon(ref_lat_deg)
    dx = (lon_b - lon_a) * F.lit(kx)
    dy = (lat_b - lat_a) * F.lit(KM_PER_DEG_LAT)
    return F.sqrt(dx * dx + dy * dy)


def grid_radius_join(points: DataFrame, radius_km: float,
                     ref_lat_deg: float,
                     id_col: str = "id", lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """All pairs of points within ``radius_km``: (id_a, id_b, dist_km)
    with id_a < id_b.

    Cell edge = radius in degrees on the SLOWER axis (longitude at the
    reference latitude), so adjacent-cell coverage is guaranteed on both
    axes; side A explodes its 3x3 neighborhood, side B keeps its exact
    cell — the join is equi on (cx, cy) and candidate volume is bounded
    by local density x 9, independent of corpus size. At 100 TB the
    grid cell is also the natural partition key (co-locate by cell and
    the join is exchange-free); skewed mega-cells (city centers) split
    under AQE like any hot key.
    """
    cell_deg = radius_km / km_per_deg_lon(ref_lat_deg)
    cx = F.floor(F.col(lon_col) / F.lit(cell_deg)).cast("long")
    cy = F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long")
    p = points.select(F.col(id_col).alias("id"),
                      F.col(lat_col).alias("lat"),
                      F.col(lon_col).alias("lon"),
                      cx.alias("cx"), cy.alias("cy"))
    offsets = F.array(*[F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    a = (p.select("id", "lat", "lon",
                  F.explode(offsets).alias("o"),
                  F.col("cx"), F.col("cy"))
         .select(F.col("id").alias("id_a"), F.col("lat").alias("lat_a"),
                 F.col("lon").alias("lon_a"),
                 (F.col("cx") + F.col("o.ox")).alias("cx"),
                 (F.col("cy") + F.col("o.oy")).alias("cy")))
    b = p.select(F.col("id").alias("id_b"), F.col("lat").alias("lat_b"),
                 F.col("lon").alias("lon_b"), "cx", "cy")
    cand = a.join(b, ["cx", "cy"]).filter(F.col("id_a") < F.col("id_b"))
    dist = planar_dist_km(F.col("lat_a"), F.col("lon_a"),
                          F.col("lat_b"), F.col("lon_b"), ref_lat_deg)
    return (cand.withColumn("dist_km", dist)
            .filter(F.col("dist_km") <= F.lit(radius_km))
            .select("id_a", "id_b", "dist_km"))


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_column(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Standard geohash cell id (Niemeyer encoding: interleaved
    lon/lat bisection bits, base32 alphabet) — the spatial shuffle and
    rollup key: prefix truncation coarsens the grid, equal prefixes
    co-locate neighbors, so `groupBy(geohash)` or `repartition` by it
    is how a 100 TB point table clusters spatially.

    Implementation is pure integer arithmetic on the quantized cell
    indices (floor((lat+90)/180 * 2^lat_bits)), bit-interleaved with
    shift/mask terms generated per bit and mapped through the base32
    alphabet with substring — identical IEEE/bit ops on both engines,
    no libm, no UDF (geohash_sql below emits the same expression for
    the DuckDB twin).
    """
    lon_bits, lat_bits = _geohash_bits(precision)
    total = 5 * precision
    lat_i = F.floor((lat + F.lit(90.0)) / F.lit(180.0)
                    * F.lit(float(1 << lat_bits))).cast("bigint")
    lon_i = F.floor((lon + F.lit(180.0)) / F.lit(360.0)
                    * F.lit(float(1 << lon_bits))).cast("bigint")
    val = F.lit(0).cast("bigint")
    # bit b (0 = LSB of the interleaved value): even offsets from the
    # MSB are longitude bits. MSB index total-1 is lon bit lon_bits-1.
    for b in range(total):
        pos_from_msb = total - 1 - b
        src, src_bit = ((lon_i, lon_bits - 1 - pos_from_msb // 2)
                        if pos_from_msb % 2 == 0
                        else (lat_i, lat_bits - 1 - pos_from_msb // 2))
        bit = F.shiftright(src, src_bit).bitwiseAND(F.lit(1))
        val = val + F.shiftleft(bit.cast("bigint"), b)
    parts = []
    for i in range(precision):
        idx = (F.shiftright(val, 5 * (precision - 1 - i))
               .bitwiseAND(F.lit(31)).cast("int"))
        parts.append(F.substring(F.lit(GEOHASH_BASE32), idx + F.lit(1),
                                 F.lit(1)))
    return F.concat(*parts)


def _geohash_bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    return lon_bits, lat_bits


def geohash_sql(lat_sql: str, lon_sql: str, precision: int = 6) -> str:
    """The DuckDB-twin SQL expression for geohash_column — generated
    from the same bit layout so both engines compute the identical
    string (convention-is-the-spec, like the planar distance
    literals)."""
    lon_bits, lat_bits = _geohash_bits(precision)
    total = 5 * precision
    lat_i = (f"CAST(floor((({lat_sql}) + 90.0) / 180.0 "
             f"* {float(1 << lat_bits)!r}) AS BIGINT)")
    lon_i = (f"CAST(floor((({lon_sql}) + 180.0) / 360.0 "
             f"* {float(1 << lon_bits)!r}) AS BIGINT)")
    terms = []
    for b in range(total):
        pos_from_msb = total - 1 - b
        if pos_from_msb % 2 == 0:
            src, src_bit = lon_i, lon_bits - 1 - pos_from_msb // 2
        else:
            src, src_bit = lat_i, lat_bits - 1 - pos_from_msb // 2
        terms.append(f"((({src} >> {src_bit}) & 1) << {b})")
    val = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{GEOHASH_BASE32}', "
        f"CAST((({val} >> {5 * (precision - 1 - i)}) & 31) AS INT) + 1, 1)"
        for i in range(precision)]
    return " || ".join(chars)
