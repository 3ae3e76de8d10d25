"""Bucketed tables: pre-shuffled storage for co-located joins
(SURVEY §2.4 scale posture).

At 100 TB the dominant join cost is shuffling the fact side. Bucketing
pays that shuffle ONCE at write time: ``bucketBy(n, key)`` persists each
table hash-partitioned (and ``sortBy`` pre-sorted) on the join key, so a
join of two tables bucketed the same way compiles to a SortMergeJoin
with NO Exchange on either side — every executor merges its own bucket
pair. This is the storage-level analog of what `repartition` does per
query, amortized across every downstream join/aggregation on that key.

Works on Spark's built-in catalog (no Hive metastore needed); the
warehouse location is set at session build (session.py). Bucket count
rules of thumb: target bucket files of 100-500 MB at full scale, and
keep producer/consumer bucket counts equal (or integer multiples, which
AQE can exploit) so co-location holds.

Lifecycle of persisted per-corpus tables (r12, verdict ask #4): a
table set named ``*_{corpus_table_tag(dir)}`` accumulates per corpus
ever probed. Within a corpus, :func:`ensure_bucketed` keeps exactly one
generation — a content-fingerprint mismatch rebuilds IN PLACE (drop +
recreate under the same name). Across corpora, nothing here reclaims a
corpus that stops being used: run ``scripts/gc_warehouse.py`` (drops
hash-tagged ``b_nd_*`` sets whose tag matches no live corpus dir) on
whatever cadence corpora rotate; tests over tmp corpora call
:func:`drop_corpus_tables` in teardown. Concurrency contract:
single-writer per corpus. Two concurrent SAME-fingerprint builders are
last-writer-wins (both write identical bytes; the losing session's
catalog entry still reads the winner's files, so this is benign).
A STALE-corpus rebuild while another process reads the old generation
is NOT supported — same as any ingest pipeline without snapshot
isolation; sequence rebuilds behind the ingest cadence.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: "str | list[str]",
    num_buckets: int = 8,
    sort: bool = True,
    sort_keys: "list[str] | None" = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    managed table on ``key`` (a column name or a composite key list —
    e.g. the LSH band index ``(band, bh)``). ``sort_keys`` (r12) lets
    the sort order be a SUPERSET of the bucket key — e.g. bucket on
    doc_id but sort (doc_id, sh), so a merge join on EITHER (doc_id)
    or (doc_id, sh) reads the files with no Exchange and no Sort
    (Spark uses a bucketed table when the join keys contain all bucket
    columns, and the on-disk order when it prefixes the required
    order). Idempotent across sessions: the in-memory catalog forgets
    managed tables when a session ends but their warehouse directories
    persist, so any orphaned location is cleared before the write
    (LOCATION_ALREADY_EXISTS otherwise)."""
    keys = [key] if isinstance(key, str) else list(key)
    sks = list(sort_keys) if sort_keys else keys
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = _table_location(spark, table)
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, keys[0], *keys[1:]
    )
    if sort:
        w = w.sortBy(sks[0], *sks[1:])
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: "str | list[str]"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key(s). The
    ``MERGE`` hint pins SortMergeJoin (a broadcast would hide the
    co-location being demonstrated); with matching bucket specs the
    physical plan carries no Exchange."""
    keys = [key] if isinstance(key, str) else list(key)
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, keys)


_FP_PROP = "graft.fingerprint"


def _fp_one(h, label: str, path: str) -> None:
    st = os.stat(path)
    h.update(f"{label}:{st.st_size}:{st.st_mtime_ns}".encode())
    # cheap CONTENT sample (r12 ADVICE): a restore/copy that preserves
    # size and mtime of DIFFERENT bytes at the same path (cp -p,
    # rsync -t, archive extraction) must not silently adopt stale base
    # tables. First + last 4 KB catches parquet's footer metadata (row
    # counts, column stats) and the head of the first row group — any
    # realistic content change moves one of them. Still O(1) per file.
    try:
        with open(path, "rb") as f:
            h.update(f.read(4096))
            if st.st_size > 8192:
                f.seek(-4096, os.SEEK_END)
            h.update(f.read(4096))
    except OSError:
        pass  # stat-only identity beats failing the build


def corpus_fingerprint(*paths: str) -> str:
    """Cheap content identity for source data: sha256 over every
    file's (relative path, size, mtime) PLUS a first/last-4KB content
    sample (r12 ADVICE hardening — metadata-preserving copies of
    different content no longer alias). Identifies "same input as the
    last build" reading at most 8 KB per file — the staleness guard
    :func:`ensure_bucketed` uses to decide whether a persisted base
    table is still current for its corpus."""
    h = hashlib.sha256()
    for root in paths:
        if os.path.isfile(root):
            _fp_one(h, os.path.basename(root), root)
            continue
        # sorted() drains the walk up front, so ordering comes from the
        # outer sort on dirpath, not from mutating dirnames
        for dirpath, _dirnames, filenames in sorted(os.walk(root)):
            for name in sorted(filenames):
                p = os.path.join(dirpath, name)
                _fp_one(h, os.path.relpath(p, root), p)
    return h.hexdigest()


def corpus_table_tag(sf_dir: str) -> str:
    """A warehouse-table name suffix identifying a corpus DIRECTORY:
    its sanitized basename (human-readable — 'sf0_1') plus 8 hex chars
    of the absolute path's sha256. The hash is load-bearing (r12
    ADVICE): two corpora whose dirs share a basename — every pytest
    tmp_path fixture — must not thrash rebuilds of ONE table name, and
    a rebuild's rmtree must never yank files from under a concurrent
    reader of the other corpus."""
    import re

    ap = os.path.abspath(sf_dir).rstrip("/")
    # lowercase: the catalog lowercases table names, so a tag with an
    # uppercase basename would never round-trip through listTables()
    base = re.sub(r"[^A-Za-z0-9_]", "_", ap.rsplit("/", 1)[-1]).lower()
    return f"{base}_{hashlib.sha256(ap.encode()).hexdigest()[:8]}"


def table_fingerprint(spark: SparkSession, table: str) -> "str | None":
    """The fingerprint recorded on ``table`` at build time, or None
    when the table is absent/unstamped. The collect() is bounded: SHOW
    TBLPROPERTIES returns a handful of (key, value) rows. Existence is
    probed through the catalog API first — SHOW TBLPROPERTIES on a
    missing table would ERROR-log its AnalysisException before we could
    catch it."""
    try:
        if not spark.catalog.tableExists(table):
            return None
        rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    except Exception:
        return None
    for r in rows:
        if r["key"] == _FP_PROP:
            return r["value"]
    return None


def _table_location(spark: SparkSession, table: str) -> str:
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    return os.path.join(warehouse.removeprefix("file:"), table.lower())


def ensure_bucketed(
    spark: SparkSession,
    table: str,
    key: "str | list[str]",
    fingerprint: str,
    build: Callable[[], DataFrame],
    num_buckets: int = 8,
    sort: bool = True,
    sort_keys: "list[str] | None" = None,
) -> bool:
    """Build-once guard for a persisted bucketed table — the "band the
    base ONCE, probe it forever" amortization the 100 TB ingest shape
    depends on. Returns True when ``build()`` actually ran this call.

    The stamp compared is ``fingerprint`` plus the bucket spec (keys,
    bucket count, sort flag), folded in HERE so no caller can change
    the physical layout without forcing a rebuild. Three tiers:

    1. same session, stamp matches table properties → no-op;
    2. new session/process, but the LOCAL warehouse directory holds a
       complete non-empty build (``_SUCCESS`` + parquet parts) whose
       on-disk ``_graft_stamp`` matches → ADOPT it: re-register the
       existing files as a bucketed table (``CREATE TABLE … CLUSTERED
       BY … LOCATION``), zero data movement. This is what lets a
       driver run, a bench run, and a pytest session share one base
       build without a persistent metastore — and it removes the
       destroy-while-another-process-reads hazard from the common
       same-corpus path. NOTE an adopted table is EXTERNAL: a bare
       DROP TABLE keeps its files; use :func:`drop_bucketed` to purge.
       Remote warehouses (hdfs://, s3a://) skip this tier and keep
       per-session rebuilds;
    3. otherwise (re)build via ``build()``. A STALE-corpus rebuild
       still clears the old directory, so concurrent readers of a
       superseded corpus remain unsupported (single-writer cadence,
       as in any ingest pipeline without snapshot isolation).

    The builder should ``repartition(num_buckets, *keys)`` its output
    so each bucket lands as ONE file — Spark's scan only exposes the
    bucket-sort ordering (eliding the read-side Sort in a merge join)
    when files-per-bucket is exactly 1."""
    keys = [key] if isinstance(key, str) else list(key)
    sks = list(sort_keys) if sort_keys else keys
    stamp = f"{fingerprint}|keys={','.join(keys)}|nb={num_buckets}|sorted={sort}"
    if sks != keys:
        stamp += f"|sortkeys={','.join(sks)}"
    if "'" in stamp:
        # stripping the quote at store time would make the stored value
        # never equal the caller's, i.e. a silent rebuild-every-call
        raise ValueError("fingerprint must not contain single quotes")
    if table_fingerprint(spark, table) == stamp:
        return False

    import glob

    loc = _table_location(spark, table)
    stamp_path = os.path.join(loc, "_graft_stamp")
    if (
        not spark.catalog.tableExists(table)
        and os.path.exists(os.path.join(loc, "_SUCCESS"))
        # a committed-but-EMPTY build has _SUCCESS and a stamp but no
        # parquet parts — spark.read.parquet would fail schema
        # inference, so fall through to a rebuild instead
        and glob.glob(os.path.join(loc, "*.parquet"))
    ):
        try:
            disk_stamp = open(stamp_path).read()
        except OSError:
            disk_stamp = None
        if disk_stamp == stamp:
            schema = spark.read.parquet(loc).schema
            cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
            sort_sql = f"SORTED BY ({', '.join(sks)}) " if sort else ""
            spark.sql(
                f"CREATE TABLE {table} ({cols}) USING PARQUET "
                f"CLUSTERED BY ({', '.join(keys)}) {sort_sql}"
                f"INTO {num_buckets} BUCKETS LOCATION '{loc}'"
            )
            spark.sql(
                f"ALTER TABLE {table} SET TBLPROPERTIES ('{_FP_PROP}'='{stamp}')"
            )
            return False

    write_bucketed(
        build(), table, key, num_buckets=num_buckets, sort=sort, sort_keys=sks
    )
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ('{_FP_PROP}'='{stamp}')")
    # the stamp file (and the adoption tier that reads it) only exists
    # for LOCAL warehouse paths; a remote warehouse (hdfs://, s3a://)
    # simply keeps the per-session rebuild behavior — never fail a
    # successful build over the marker
    if os.path.isdir(loc):
        try:
            with open(stamp_path, "w") as f:
                f.write(stamp)
        except OSError:
            pass
    return True


def drop_corpus_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Drop (and purge) every persisted base table belonging to the
    corpus at ``sf_dir`` — tables whose name ends with that directory's
    :func:`corpus_table_tag`. The cleanup half of the r12 ADVICE
    finding: tmp-path test corpora must not leak a table set per run.
    Returns the dropped table names."""
    tag = corpus_table_tag(sf_dir).lower()
    dropped = []
    for t in spark.catalog.listTables():
        if t.name.endswith(tag):
            drop_bucketed(spark, t.name)
            dropped.append(t.name)
    # tier-2 adoption means a table can exist on disk with no catalog
    # entry (a previous session built it); purge those locations too
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wdir = warehouse.removeprefix("file:")
    if os.path.isdir(wdir):
        for name in os.listdir(wdir):
            if name.endswith(tag) and name not in dropped:
                shutil.rmtree(os.path.join(wdir, name), ignore_errors=True)
                dropped.append(name)
    return dropped


def drop_bucketed(spark: SparkSession, table: str) -> None:
    """Drop ``table`` AND purge its warehouse directory + _graft_stamp.
    Needed because an ADOPTED table (ensure_bucketed tier 2) is
    external — a bare DROP TABLE leaves its files and stamp behind,
    and a later session would silently re-adopt data the caller
    thought was gone."""
    loc = _table_location(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def shuffle_exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan (broadcast
    exchanges excluded) — the assertion surface for co-location tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )
