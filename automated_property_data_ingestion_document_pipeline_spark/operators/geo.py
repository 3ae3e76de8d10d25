"""Spatial join operators: grid-bucketed radius join, nearest-neighbor
match, and tile aggregation over planar point columns.

The reference's domain is parcel/property data keyed by county
(App.js:283 county lookups); a production property pipeline also joins
records by geographic proximity ("parcels within R meters of a flood
sensor", "nearest recorder office"). Spark has no spatial join, so the
scalable formulation is the classic grid-bucket decomposition:

- snap every point to an integer grid cell of side ``cell >= radius``;
- explode ONE side to its 3x3 cell neighborhood (9 rows — a constant
  fan-out, not a data-dependent one);
- equi-join on the cell id (hash-partitionable → a plain shuffled or
  broadcast hash join, never a cartesian/nested-loop);
- keep pairs whose EXACT squared distance is within ``radius**2``.

Every candidate pair truly within ``radius`` shares at least one 3x3
neighborhood when ``cell >= radius`` (each coordinate differs by less
than one cell width), so the decomposition has zero false negatives;
false positives are discarded by the exact predicate. At 100 TB the
join shuffles on cell ids whose population is bounded by local point
density — skyscraper cells (downtown-density skew) are handled by AQE
skew splitting because the join is a plain equi-join.

All coordinates are INTEGER planar units (e.g. meters in a state-plane
CRS — the reference's own CRS tables motivate projected coordinates).
Integer squared distance keeps every comparison exact: no trig, no
float rounding at the radius boundary, so a DuckDB oracle computing the
same predicate agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cell_of(x: Column, y: Column, cell: int) -> Column:
    """Pack a point's grid cell into one BIGINT: ``floor(x/cell) * 2^21
    + floor(y/cell)`` (floor division — correct for negatives too).
    2^21 cells per axis is enough for planet-scale meter grids at
    cell >= 100 m; a single long join key hashes/sorts cheaper than a
    (cx, cy) struct."""
    cx = F.floor(x / F.lit(cell))
    cy = F.floor(y / F.lit(cell))
    return (cx * F.lit(1 << 21) + cy).alias("cell_id")


def _with_neighbor_cells(df: DataFrame, x: str, y: str, cell: int) -> DataFrame:
    """Explode each row to its 3x3 neighborhood of cell ids (constant
    9x fan-out). Applied to the SMALLER side so the big side stays
    un-replicated."""
    cx = F.floor(F.col(x) / F.lit(cell))
    cy = F.floor(F.col(y) / F.lit(cell))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    return df.select(
        "*",
        F.explode(offsets).alias("_off"),
    ).select(
        "*",
        ((cx + F.col("_off.dx")) * F.lit(1 << 21) + (cy + F.col("_off.dy"))).alias("cell_id"),
    ).drop("_off")


def grid_radius_join(
    big: DataFrame,
    small: DataFrame,
    big_xy: tuple[str, str],
    small_xy: tuple[str, str],
    radius: int,
    broadcast_small: bool = True,
    widen_probe: bool = False,
) -> DataFrame:
    """All (big, small) pairs within ``radius`` (planar integer units).

    The small side is exploded to its 3x3 neighborhood and (by default)
    broadcast — the shape of "parcels x county recorder offices". Set
    ``broadcast_small=False`` for two large sides: the join becomes a
    shuffled hash join on ``cell_id`` — still never a cartesian.
    ``widen_probe=True`` fans a 1-split probe out to a task wave before
    the join — the dense-corpus fix (8.2 → 1.0 s at sf1.0, see the
    comment below), a measured LOSS on sparse inputs, hence opt-in.

    Output: all columns of both sides plus exact ``dist2`` (BIGINT
    squared distance). Column names must not collide across sides.
    """
    bx, by = big_xy
    sx, sy = small_xy
    # r14, measured both ways: under the broadcast build the probe side
    # inherits the SCAN's partitioning, so on a 1-split input the whole
    # candidate enumeration + dist2 filter runs in one task — 8.2 s
    # single-task at sf1.0, fixed to 1.0 s by fan_out_if_narrow on the
    # probe. But at sf0.1 the same fan-out REGRESSES the lane (0.88 →
    # 1.06 s interleaved: exchange + wave dispatch + the .rdd width
    # probe cost more than the candidate work), and no static signal
    # separates the two — the quadratic candidate CPU is invisible to
    # byte estimates. So the fan-out is an explicit knob
    # (``widen_probe``), following this repo's scale-caller pattern
    # (banding granularity, LSH plane count): probes of 1-split inputs
    # at >= sf1.0-class density should pass True.
    probe = big
    if widen_probe:
        from automated_property_data_ingestion_document_pipeline_spark.operators.fanout import (
            fan_out_if_narrow,
        )

        probe = fan_out_if_narrow(probe)
    probe = probe.withColumn("cell_id", cell_of(F.col(bx), F.col(by), radius))
    build = _with_neighbor_cells(small, sx, sy, radius)
    if broadcast_small:
        build = F.broadcast(build)
    dx = F.col(bx) - F.col(sx)
    dy = F.col(by) - F.col(sy)
    return (
        probe.join(build, "cell_id")
        .withColumn("dist2", (dx * dx + dy * dy).cast("bigint"))
        .filter(F.col("dist2") <= F.lit(radius) ** 2)
        .drop("cell_id")
    )


def nearest_within(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    big_xy: tuple[str, str],
    small_xy: tuple[str, str],
    radius: int,
) -> DataFrame:
    """Nearest ``small`` point per ``big`` row among those within
    ``radius``; big rows with no candidate in range are dropped (the
    caller left-joins back if misses must survive). Ties broken by
    ``small_key`` so the winner is deterministic. One window over the
    grid-join candidates — candidate count per big row is bounded by
    point density times pi*r^2, not corpus size."""
    cand = grid_radius_join(big, small, big_xy, small_xy, radius)
    w = Window.partitionBy(big_key).orderBy("dist2", small_key)
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def tile_aggregate(
    points: DataFrame, x: str, y: str, cell: int, aggs: list[Column]
) -> DataFrame:
    """Heatmap/tile rollup: snap points to ``cell``-sized tiles and
    aggregate per tile. Output carries the tile's integer coordinates
    (``tile_x``, ``tile_y``) so downstream renderers don't unpack the
    packed id. One shuffle on the tile key; partial aggregation does the
    heavy lifting map-side."""
    return (
        points.groupBy(
            F.floor(F.col(x) / F.lit(cell)).alias("tile_x"),
            F.floor(F.col(y) / F.lit(cell)).alias("tile_y"),
        )
        .agg(*aggs)
    )
