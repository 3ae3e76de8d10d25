"""CDC / table-maintenance registrations (operators/cdc.py): MERGE
upsert, change-log application, and snapshot diff.

The reference's store is upsert-by-key over JSON files (app.py:46-58
read→overwrite→write); these keys re-express that contract as set-based
merges — the operators a lakehouse user runs daily (MERGE INTO, CDC
apply, table diff). Scenarios are derived deterministically from the
orders/customer tables with pure integer/modulo arithmetic so the
DuckDB oracle rebuilds byte-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import cdc
from automated_property_data_ingestion_document_pipeline_spark.plans._sql import money_sum_sql
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query


@query(
    "q_merge_upsert",
    oracle="""
    WITH t AS (
      SELECT o_orderkey AS order_key, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders WHERE o_orderkey % 3 <> 0
    ), s AS (
      SELECT o_orderkey AS order_key, 'U' AS status,
             o_totalprice + 10 AS price
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(t.order_key, s.order_key) AS order_key,
           COALESCE(s.status, t.status) AS status,
           COALESCE(s.price, t.price) AS price
    FROM t FULL OUTER JOIN s ON t.order_key = s.order_key
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as one full-outer equi-join: a target snapshot (2/3 of
    orders) merged with a source batch (every even order re-priced,
    status 'U'). Matched keys take source values, source-only keys
    insert, target-only keys pass through — app.py:46-58's dict
    overwrite, set-based. One shuffle on the key."""
    o = catalog.load(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    source = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.lit("U").alias("status"),
        (F.col("o_totalprice") + 10).alias("price"),
    )
    return cdc.merge_upsert(target, source, "order_key", ["status", "price"])


@query(
    "q_cdc_apply",
    oracle="""
    WITH ch AS (
      SELECT o_custkey AS c_custkey,
             CASE WHEN o_orderkey % 10 <= 1 THEN 'D'
                  WHEN o_orderkey % 10 <= 6 THEN 'U'
                  ELSE 'I' END AS op,
             o_totalprice AS bal, o_orderpriority AS seg,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
      FROM orders
    ), last AS (
      SELECT c_custkey, op, bal, seg FROM ch WHERE rk = 1
    ), b AS (
      SELECT c_custkey, c_acctbal AS bal, c_mktsegment AS seg FROM customer
    )
    SELECT COALESCE(b.c_custkey, l.c_custkey) AS c_custkey,
           COALESCE(l.bal, b.bal) AS bal,
           COALESCE(l.seg, b.seg) AS seg
    FROM b FULL OUTER JOIN last l ON b.c_custkey = l.c_custkey
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application: orders become a change log over the customer
    base (op derived from the order key, sequenced by order date then
    key — a total order, so replays are deterministic). The log first
    collapses to the newest op per key (ranking window), then ONE merge
    touches the base: final D deletes, I/U upserts. Log depth never
    multiplies base passes — the 100 TB contract."""
    base = catalog.load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    changes = catalog.load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_orderkey") % 10 <= 1, "D")
        .when(F.col("o_orderkey") % 10 <= 6, "U")
        .otherwise("I")
        .alias("op"),
        F.col("o_totalprice").alias("bal"),
        F.col("o_orderpriority").alias("seg"),
        "o_orderdate",
        "o_orderkey",
    )
    return cdc.apply_changes(
        base, changes, "c_custkey", ["o_orderdate", "o_orderkey"], "op", ["bal", "seg"]
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS order_key, o_orderstatus AS status,
             o_totalprice AS price
      FROM orders WHERE o_orderkey % 5 <> 0
    ), new AS (
      SELECT o_orderkey AS order_key, o_orderstatus AS status,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 4 <> 0
    )
    SELECT COALESCE(old.order_key, new.order_key) AS order_key,
           CASE WHEN old.order_key IS NULL THEN 'added'
                WHEN new.order_key IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM old FULL OUTER JOIN new ON old.order_key = new.order_key
    WHERE old.order_key IS NULL OR new.order_key IS NULL
       OR old.status <> new.status OR old.price <> new.price
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (table audit): two versions of the orders table
    compared key-by-key into added / removed / changed rows, unchanged
    rows dropped. One full-outer equi-join — the reconciliation query
    every migration and backfill ends with."""
    o = catalog.load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 5 != 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    new = o.filter(F.col("o_orderkey") % 4 != 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    on = old.select(
        F.col("order_key").alias("_ok"), F.col("status").alias("_os"), F.col("price").alias("_op")
    ).join(
        new.select(
            F.col("order_key").alias("_nk"),
            F.col("status").alias("_ns"),
            F.col("price").alias("_np"),
        ),
        F.col("_ok") == F.col("_nk"),
        "full_outer",
    )
    return on.filter(
        F.col("_ok").isNull()
        | F.col("_nk").isNull()
        | (F.col("_os") != F.col("_ns"))
        | (F.col("_op") != F.col("_np"))
    ).select(
        F.coalesce(F.col("_ok"), F.col("_nk")).alias("order_key"),
        F.when(F.col("_ok").isNull(), "added")
        .when(F.col("_nk").isNull(), "removed")
        .otherwise("changed")
        .alias("change_type"),
    )


@query(
    "q_incremental_agg",
    oracle=f"""
    SELECT o_custkey AS c_custkey,
           COUNT(*) AS n_orders,
           {money_sum_sql('o_totalprice')} AS total_spend
    FROM orders GROUP BY o_custkey
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-customer
    rollup arrives as two batch deltas (odd / even order keys — "day 1"
    and "day 2"), each pre-aggregated, then MERGED by summing partials —
    never re-scanning day 1's raw rows when day 2 lands. The oracle is
    the full recompute; agreement proves the delta-merge algebra
    (count/sum are commutative monoids) loses nothing. At 100 TB this
    is the difference between touching one day and touching the whole
    table on every refresh."""
    o = catalog.load(spark, sf_dir, "orders")

    def delta(batch: DataFrame) -> DataFrame:
        # partials accumulate in exact decimal (plans/_sql.py policy) so
        # the delta-merge is bit-identical to the full recompute no
        # matter how batches are ordered
        return batch.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.round("o_totalprice", 2).cast("decimal(18,2)")
            ).alias("spend"),
        )

    day1 = delta(o.filter(F.col("o_orderkey") % 2 == 1))
    day2 = delta(o.filter(F.col("o_orderkey") % 2 == 0))
    return (
        day1.unionAll(day2)
        .groupBy("c_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("spend").cast("double").alias("total_spend"),
        )
    )


@query(
    "q_bucketed_join",
    oracle=f"""
    SELECT o.o_custkey AS c_custkey, o.o_orderkey,
           c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 500
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free co-located join, end to end as a driver key: both
    tables are written ``bucketBy(8, custkey)`` + bucket-sorted (paying
    the shuffle ONCE at write time), then joined as a SortMergeJoin
    with ZERO Exchange on either side — the storage lever that
    amortizes the fact-side shuffle across every downstream join at
    100 TB. The no-Exchange property is pinned by
    tests/test_bucketing.py; this key verifies the VALUES round-trip
    the bucketed layout unchanged (plain-join oracle on the source
    parquet)."""
    from automated_property_data_ingestion_document_pipeline_spark.operators import bucketing

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    o = catalog.load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    c = catalog.load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    lt, rt = f"b_orders_{sf_tag}", f"b_customer_{sf_tag}"
    bucketing.write_bucketed(o, lt, "c_custkey")
    bucketing.write_bucketed(c, rt, "c_custkey")
    return bucketing.bucketed_join(spark, lt, rt, "c_custkey").filter(
        F.col("o_totalprice") > 500
    ).select("c_custkey", "o_orderkey", "c_mktsegment", "o_totalprice")


@query(
    "q_data_quality_report",
    oracle="""
    SELECT 'row_count' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS observed,
           COUNT(*) > 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'null_custkey', CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'negative_price', CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'dup_orderkey',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           COUNT(*) = COUNT(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'fk_orphans',
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL
    """,
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations as a relation (the Deequ/dbt-test
    contract): row-count floor, null-rate on the key, value-range on
    money, key uniqueness, and referential integrity to the customer
    dim — each a (check_name, observed, passed) row a scheduler can
    alert on. ONE pass over orders computes the four column checks as
    conditional aggregates; the FK check is a broadcast anti join.
    The whole report is a union of tiny aggregates — at 100 TB the
    scan cost is one read of the audited table, not one per check."""
    o = catalog.load(spark, sf_dir, "orders")
    c = catalog.load(spark, sf_dir, "customer")

    def row(name, observed, passed):
        return F.struct(
            F.lit(name).alias("check_name"),
            observed.cast("bigint").alias("observed"),
            passed.alias("passed"),
        )

    scans = o.agg(
        F.array(
            row("row_count", F.count("*"), F.count("*") > 0),
            row(
                "null_custkey",
                F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)),
                F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)) == 0,
            ),
            row(
                "negative_price",
                F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)),
                F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)) == 0,
            ),
            row(
                "dup_orderkey",
                F.count("*") - F.countDistinct("o_orderkey"),
                F.count("*") == F.countDistinct("o_orderkey"),
            ),
        ).alias("checks")
    ).select(F.explode("checks").alias("r")).select("r.*")
    orphans = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("fk_orphans").alias("check_name"),
            F.col("n").cast("bigint").alias("observed"),
            (F.col("n") == 0).alias("passed"),
        )
    )
    return scans.unionAll(orphans)


# -- incremental join-view maintenance ----------------------------------------


@query(
    "q_incremental_join",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_orderstatus
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a join: both sides arrive in two
    insert-only batches (split by key parity); the maintained view is
    the initial join PLUS the delta-rule terms ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB
    (operators/cdc.py delta_join). The oracle recomputes the join from
    scratch — equality proves the delta algebra loses/duplicates
    nothing, the contract that lets a 100 TB pipeline maintain join
    views at |Δ| cost instead of |A|×|B| recompute (q_incremental_agg's
    sibling for joins)."""
    o = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("custkey"),
        "o_orderstatus",
    )
    c = catalog.load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    a_old = o.filter(F.col("o_orderkey") % 2 == 0)
    a_delta = o.filter(F.col("o_orderkey") % 2 != 0)
    b_old = c.filter(F.col("custkey") % 2 == 0)
    b_delta = c.filter(F.col("custkey") % 2 != 0)
    base = a_old.join(b_old, "custkey")
    view = base.unionByName(cdc.delta_join(a_old, a_delta, b_old, b_delta, "custkey"))
    return view.select(
        "o_orderkey",
        F.col("custkey").alias("c_custkey"),
        "c_name",
        "o_orderstatus",
    )


@query(
    "q_scd2_merge",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_mktsegment,
               '1990-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to,
               TRUE AS is_current
        FROM customer
        WHERE c_custkey IS NOT NULL AND c_mktsegment IS NOT NULL
    ),
    changes AS (
        SELECT c_custkey, 'SEGMENT-' || CAST(c_custkey % 3 AS VARCHAR) AS new_seg
        FROM customer
        WHERE c_custkey IS NOT NULL AND c_mktsegment IS NOT NULL
          AND c_custkey % 7 = 0
    ),
    eff AS (  -- only real changes mutate history (idempotent no-op drop)
        SELECT b.c_custkey, b.c_mktsegment AS old_seg, c.new_seg
        FROM base b JOIN changes c ON b.c_custkey = c.c_custkey
        WHERE b.c_mktsegment <> c.new_seg
    )
    SELECT b.c_custkey, b.c_mktsegment, b.valid_from,
           CASE WHEN e.c_custkey IS NOT NULL THEN '1996-06-01' END AS valid_to,
           e.c_custkey IS NULL AS is_current
    FROM base b LEFT JOIN eff e ON b.c_custkey = e.c_custkey
    UNION ALL
    SELECT c_custkey, new_seg AS c_mktsegment, '1996-06-01' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
    FROM eff
    """,
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 MERGE: apply a change batch to a slowly-changing
    dimension — close the current version (valid_to = effective date,
    is_current=false) and append the new open version, with NO-OP
    changes (new value == current value) dropped so replaying the same
    batch is idempotent. One broadcast-able join against the change
    batch decides close-vs-keep; the appended versions are the same
    joined rows re-projected — two scans of the dim, zero extra
    shuffles beyond the join. The interval-derivation twin
    (q_scd2_intervals) builds history FROM events; this key MAINTAINS
    history under upserts — together they're the dimension-table
    lifecycle. Reference: the parcel-detail overwrite
    (propertyDataService upsert semantics) generalized to versioned
    history."""
    c = catalog.load(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isNotNull() & F.col("c_mktsegment").isNotNull()
    )
    base = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01").alias("valid_from"),
    )
    changes = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("k"),
        F.concat(F.lit("SEGMENT-"), (F.col("c_custkey") % 3).cast("string")).alias(
            "new_seg"
        ),
    )
    eff = (
        base.join(F.broadcast(changes), base["c_custkey"] == changes["k"])
        .filter(F.col("c_mktsegment") != F.col("new_seg"))
        .select("k", "new_seg")
    )
    closed_or_kept = base.join(
        F.broadcast(eff), base["c_custkey"] == eff["k"], "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        "valid_from",
        F.when(F.col("k").isNotNull(), F.lit("1996-06-01")).alias("valid_to"),
        F.col("k").isNull().alias("is_current"),
    )
    appended = eff.select(
        F.col("k").alias("c_custkey"),
        F.col("new_seg").alias("c_mktsegment"),
        F.lit("1996-06-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed_or_kept.unionByName(appended)


@query(
    "q_scd2_lookup",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
        WHERE c_custkey IS NOT NULL AND c_mktsegment IS NOT NULL
    ),
    eff AS (
        SELECT c_custkey, c_mktsegment AS old_seg,
               'SEGMENT-' || CAST(c_custkey % 3 AS VARCHAR) AS new_seg
        FROM base WHERE c_custkey % 7 = 0
          AND c_mktsegment <> 'SEGMENT-' || CAST(c_custkey % 3 AS VARCHAR)
    ),
    dim AS (
        SELECT b.c_custkey, b.c_mktsegment, b.valid_from,
               CASE WHEN e.c_custkey IS NOT NULL
                    THEN TIMESTAMP '1996-06-01 00:00:00' END AS valid_to
        FROM base b LEFT JOIN eff e ON b.c_custkey = e.c_custkey
        UNION ALL
        SELECT c_custkey, new_seg, TIMESTAMP '1996-06-01 00:00:00',
               CAST(NULL AS TIMESTAMP)
        FROM eff
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           d.c_mktsegment AS segment_asof
    FROM orders o
    JOIN dim d ON d.c_custkey = o.o_custkey
      AND d.valid_from <= o.o_orderdate
      AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    WHERE o.o_custkey IS NOT NULL AND o.o_orderdate IS NOT NULL
    """,
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The point of maintaining SCD2 history: each fact joins the
    dimension VERSION that was current AS OF the fact's own date
    (valid_from ≤ o_orderdate < valid_to, open version = NULL bound) —
    the q_scd2_merge history applied to the orders fact. One
    broadcast-able interval-predicate join: the dim carries ≤2 versions
    per key, so the equi-join on custkey plus the residual validity
    filter is the right plan (never a range cross join); at fact scale
    the dim side broadcasts exactly like every other lookup. Completes
    the SCD2 lifecycle: derive (q_scd2_intervals) → maintain
    (q_scd2_merge) → consume (this key)."""
    c = catalog.load(spark, sf_dir, "customer").filter(
        F.col("c_custkey").isNotNull() & F.col("c_mktsegment").isNotNull()
    )
    base = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
    )
    new_seg = F.concat(F.lit("SEGMENT-"), (F.col("c_custkey") % 3).cast("string"))
    eff = base.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_mktsegment") != new_seg)
    ).select(F.col("c_custkey").alias("k"), new_seg.alias("new_seg"))
    cut = F.lit("1996-06-01 00:00:00").cast("timestamp")
    closed_or_kept = base.join(
        F.broadcast(eff), base["c_custkey"] == eff["k"], "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        "valid_from",
        F.when(F.col("k").isNotNull(), cut).alias("valid_to"),
    )
    appended = eff.select(
        F.col("k").alias("c_custkey"),
        F.col("new_seg").alias("c_mktsegment"),
        cut.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    dim = closed_or_kept.unionByName(appended)
    o = catalog.load(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    j = o.join(
        F.broadcast(dim),
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("valid_from") <= F.col("o_orderdate"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))),
    )
    return j.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("c_mktsegment").alias("segment_asof"),
    )
