"""Data-layout tests: Z-order clustering actually narrows per-file
min/max ranges on BOTH dimensions (the property zone-map pruning needs),
compaction hits its file-count target, and schema evolution merges."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark.operators import layout


def _file_ranges(path: str, cols: tuple[str, str]):
    """Per-file (min, max) of each column, via parquet footer stats —
    the same metadata a scan planner prunes with."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_write_narrows_minmax_on_both_dims(spark, tmp_path):
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    layout.zorder_write(df, z_path, "x", "y", num_files=16, bits=6)
    # baseline: sorted by x only — x clusters, y spans the full domain
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lin_path)

    def spans(path, col):
        rs = _file_ranges(path, ("x", "y"))
        return [hi - lo for (lo, hi) in (r[col] for r in rs)]

    full = 63
    # z-order: BOTH dims clustered — average span a fraction of the domain
    z_x, z_y = spans(z_path, "x"), spans(z_path, "y")
    assert sum(z_x) / len(z_x) <= full / 2
    assert sum(z_y) / len(z_y) <= full / 2
    # linear sort: y unclustered — files span (nearly) the whole y domain
    l_y = spans(lin_path, "y")
    assert sum(l_y) / len(l_y) > full * 0.9


def test_zorder_prunes_files_for_point_filter(spark, tmp_path):
    """The payoff: a selective filter on either dimension must be
    satisfiable from a minority of files' footer ranges."""
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    path = str(tmp_path / "z2")
    layout.zorder_write(df, path, "x", "y", num_files=16, bits=6)
    ranges = _file_ranges(path, ("x", "y"))
    for col, val in (("x", 7), ("y", 55)):
        eligible = [r for r in ranges if r[col][0] <= val <= r[col][1]]
        assert len(eligible) <= len(ranges) / 2, (col, val, ranges)


def test_compact_write_hits_file_target(spark, tmp_path):
    df = spark.range(10_000).repartition(37)  # the small-files mess
    path = str(tmp_path / "compacted")
    layout.compact_write(df, path, target_files=4)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) == 4
    assert spark.read.parquet(path).count() == 10_000


def test_schema_evolution_merge_read(spark, tmp_path):
    """mergeSchema read across evolving batch schemas: old files gain
    NULLs for new columns, nothing is dropped — the append-only data
    lake contract."""
    p = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(p + "/b=1")
    spark.range(5, 10).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.parquet(p + "/b=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) >= {"id", "v1", "v2"}
    assert df.count() == 10
    assert df.filter(F.col("v2").isNull()).count() == 5


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """The 100 TB first lever: a filter on the partition column must
    become a PartitionFilters entry (planning-time directory pruning),
    not a post-scan Filter over all partitions."""
    from automated_property_data_ingestion_document_pipeline_spark import catalog

    p = str(tmp_path / "docs_by_source")
    catalog.load(spark, sf_dir, "documents").write.partitionBy("source").parquet(p)
    df = spark.read.parquet(p).filter(F.col("source") == "src3").select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan and "src3" in plan
    n_all = spark.read.parquet(p).count()
    assert 0 < df.count() < n_all


def test_zstd_parquet_roundtrip_smaller_and_identical(spark, sf_dir, tmp_path):
    """Codec is a writer option, not a schema property: zstd output must
    read back bit-identical and smaller than uncompressed."""
    import glob
    import os

    from automated_property_data_ingestion_document_pipeline_spark import catalog

    d = catalog.load(spark, sf_dir, "documents")
    pz = str(tmp_path / "zstd")
    pu = str(tmp_path / "uncompressed")
    d.coalesce(1).write.option("compression", "zstd").parquet(pz)
    d.coalesce(1).write.option("compression", "none").parquet(pu)
    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(os.path.join(p, "*.parquet")))
    assert size(pz) < size(pu) * 0.8
    a = {tuple(r) for r in spark.read.parquet(pz).collect()}
    b = {tuple(r) for r in d.collect()}
    assert a == b


def test_z_value_three_columns_clusters_all_dims(spark, tmp_path):
    """k-column Morton generalization: sorting by z over (x, y, w)
    clusters all three dimensions' footer ranges."""
    from automated_property_data_ingestion_document_pipeline_spark.operators.layout import z_value

    df = spark.range(16 * 16 * 16).select(
        (F.col("id") % 16).alias("x"),
        ((F.col("id") / 16).cast("long") % 16).alias("y"),
        (F.col("id") / 256).cast("long").alias("w"),
    )
    p = str(tmp_path / "z3")
    (
        df.withColumn("_z", z_value(F.col("x"), F.col("y"), F.col("w"), bits=4))
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.parquet(p)
    )
    ranges = _file_ranges(p, ("x", "y", "w"))
    for col in ("x", "y", "w"):
        spans = [hi - lo for (lo, hi) in (r[col] for r in ranges)]
        assert sum(spans) / len(spans) <= 15 * 0.75, (col, spans)


def test_vacuum_never_removes_published_or_incomplete(spark, tmp_path):
    """Safety rails: the _CURRENT target survives outside the window;
    incomplete dirs (no _SUCCESS) are untouched."""
    import os

    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark.streaming import sinks

    state = str(tmp_path / "state")
    os.makedirs(state)
    df = spark.range(5).select(
        F.col("id").alias("user_id"), (F.col("id") * 1.0).alias("value")
    )
    for b in range(4):
        sinks.upsert_aggregate_batch(df, state, b)
    # roll the manifest BACK to v0 (reader pinned to an old snapshot)
    with open(os.path.join(state, "_CURRENT.tmp"), "w") as f:
        f.write("v0\n")
    os.replace(os.path.join(state, "_CURRENT.tmp"), os.path.join(state, "_CURRENT"))
    # and plant an incomplete (crashed-writer) dir older than everything
    os.makedirs(os.path.join(state, "v9"))  # no _SUCCESS → not a snapshot

    removed = sinks.vacuum_state(state, keep_last=1)
    assert removed == [1, 2]  # v0 pinned by manifest, v3 in window
    assert os.path.exists(os.path.join(state, "v0", "_SUCCESS"))
    assert os.path.isdir(os.path.join(state, "v9"))
    # pinned reader still resolves
    assert sinks.read_state_version(spark, state).count() == 5
