"""Bucketed-table co-located join (SURVEY §2.4 scale posture): the
write-once shuffle that makes every later join on the key exchange-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.operators import bucketing


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = catalog.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    bucketing.write_bucketed(orders, "t_orders_b", "o_orderkey", num_buckets=8)
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        num_buckets=8,
    )

    joined = bucketing.bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
    # co-located: no shuffle Exchange anywhere in the join plan
    assert bucketing.shuffle_exchanges_in_plan(joined) == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan

    # same join on raw (unbucketed) parquet shuffles both sides
    raw = (
        catalog.load(spark, sf_dir, "orders")
        .hint("merge")
        .join(
            catalog.load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    assert bucketing.shuffle_exchanges_in_plan(raw) >= 2

    # and the answers agree
    assert joined.count() == raw.count()


def test_bucketed_aggregation_reuses_bucketing(spark, sf_dir):
    """groupBy on the bucket key also skips the exchange — bucketing
    amortizes across every key-aligned operator, not just joins."""
    lineitem = catalog.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bucketing.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        num_buckets=8,
    )
    agg = (
        spark.table("t_lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert bucketing.shuffle_exchanges_in_plan(agg) == 0
    assert agg.count() > 0


def test_banded_base_bucket_probe_only_delta_shuffles(spark, sf_dir, tmp_path):
    """The q_neardup_incremental 100 TB deployment claim as CODE: band
    the base corpus ONCE into a table bucketed on the composite LSH key
    (band, bh); a daily delta probe then shuffles ONLY the delta — the
    base side reads its buckets with no Exchange. Pinned: the probe
    plan has exactly one hash Exchange (the delta), the base scan is a
    bucketed scan, and the candidate pairs equal the direct-join
    answer."""
    from pyspark.sql import functions as F

    from automated_property_data_ingestion_document_pipeline_spark.operators import bucketing
    from automated_property_data_ingestion_document_pipeline_spark.plans.queries_neardup import (
        _portable_bands,
        _portable_shingles,
    )

    docs = catalog.load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    is_delta = F.col("doc_id") % 10 == 7
    base_bands = _portable_bands(_portable_shingles(docs.filter(~is_delta)))
    delta_bands = _portable_bands(_portable_shingles(docs.filter(is_delta)))

    bucketing.write_bucketed(
        base_bands, "t_neardup_base_bands", ["band", "bh"], num_buckets=4
    )
    try:
        # materialize the delta's banding first (in production it
        # arrives already banded from the ingest job) so the probe plan
        # contains ONLY probe-side shuffles and the exchange count
        # isolates the claim under test
        delta_path = str(tmp_path / "delta_bands")
        delta_bands.withColumnRenamed("doc_id", "delta_id").write.mode(
            "overwrite"
        ).parquet(delta_path)
        probe = (
            spark.table("t_neardup_base_bands")
            .hint("merge")
            .join(
                spark.read.parquet(delta_path).repartition(4, "band", "bh"),
                ["band", "bh"],
            )
            .select(F.col("doc_id").alias("base_id"), "delta_id")
            .distinct()
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # the base side reads pre-bucketed files: its scan line reports
        # the bucket selection instead of needing an Exchange
        assert "Bucketed: true" in plan, plan[:2000]
        # the WHOLE plan carries exactly two shuffles — the DELTA
        # repartition feeding the join and the final distinct; a third
        # would mean the bucketed base side shuffled too (the
        # regression this test exists to catch — plan strings print
        # parent-first, so any prefix-split count would miss join-input
        # exchanges entirely)
        assert bucketing.shuffle_exchanges_in_plan(probe) == 2, plan[:2000]

        direct = (
            base_bands.hint("merge")
            .join(
                delta_bands.withColumnRenamed("doc_id", "delta_id"),
                ["band", "bh"],
            )
            .select(F.col("doc_id").alias("base_id"), "delta_id")
            .distinct()
        )
        got = {(r.base_id, r.delta_id) for r in probe.collect()}
        want = {(r.base_id, r.delta_id) for r in direct.collect()}
        assert got == want and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_neardup_base_bands")


def test_ensure_bucketed_build_once_guard(spark):
    """r11: ensure_bucketed builds when the table is absent or carries
    a different fingerprint, skips when the stamp matches, and rejects
    quote-bearing fingerprints outright (a stripped-at-store copy
    would never match and rebuild forever)."""
    import pytest

    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    t = "t_ensure_guard"
    try:
        assert bucketing.ensure_bucketed(spark, t, "id", "fp-one", build, num_buckets=2)
        assert bucketing.ensure_bucketed(spark, t, "id", "fp-one", build, num_buckets=2) is False
        assert calls == [1], "matching fingerprint must skip the build"
        # the stored stamp folds the physical bucket spec in at the
        # mechanism level, so no caller can change layout silently
        assert bucketing.table_fingerprint(spark, t) == (
            "fp-one|keys=id|nb=2|sorted=True"
        )
        # a bucket-spec change alone forces a rebuild
        assert bucketing.ensure_bucketed(spark, t, "id", "fp-one", build, num_buckets=4)
        assert calls == [1, 1]
        assert bucketing.ensure_bucketed(spark, t, "id", "fp-two", build, num_buckets=4)
        assert calls == [1, 1, 1]
        with pytest.raises(ValueError, match="single quotes"):
            bucketing.ensure_bucketed(spark, t, "id", "bad'fp", build, num_buckets=2)
        # cross-process adoption: a NEW session forgets the catalog
        # entry but keeps the warehouse files. Simulate by parking the
        # directory across a managed DROP (which would purge it) and
        # restoring it — catalog entry gone, files intact.
        import os as _os
        import shutil as _sh

        loc = bucketing._table_location(spark, t)
        _sh.move(loc, loc + ".keep")
        spark.sql(f"DROP TABLE {t}")
        _sh.move(loc + ".keep", loc)
        assert _os.path.exists(_os.path.join(loc, "_SUCCESS"))
        assert (
            bucketing.ensure_bucketed(spark, t, "id", "fp-two", build, num_buckets=4)
            is False
        ), "matching on-disk stamp must adopt, not rebuild"
        assert calls == [1, 1, 1]
        agg = spark.table(t).groupBy("id").count()
        assert bucketing.shuffle_exchanges_in_plan(agg) == 0
        assert spark.table(t).count() == 2
    finally:
        # the adopted table is EXTERNAL — a bare DROP TABLE would leak
        # the warehouse dir + stamp for the next session to re-adopt
        bucketing.drop_bucketed(spark, t)
    assert not __import__("os").path.isdir(bucketing._table_location(spark, t))


def test_corpus_tag_distinguishes_same_basename_dirs(tmp_path):
    """r12 ADVICE: two corpora whose directories share a basename (the
    shape every pytest tmp_path fixture produces) must map to DIFFERENT
    table names, or they thrash full rebuilds of one table and a
    rebuild's rmtree can yank files from under a reader of the other
    corpus."""
    a = tmp_path / "runA" / "corpus"
    b = tmp_path / "runB" / "corpus"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    ta = bucketing.corpus_table_tag(str(a))
    tb = bucketing.corpus_table_tag(str(b))
    assert ta != tb
    assert ta.startswith("corpus_") and tb.startswith("corpus_")
    # stable across calls and trailing-slash spelling
    assert bucketing.corpus_table_tag(str(a) + "/") == ta
    assert ta == ta.lower(), "catalog lowercases table names"


def test_corpus_fingerprint_samples_content(tmp_path):
    """r12 ADVICE: a copy that preserves size AND mtime of different
    bytes (cp -p, rsync -t, archive extraction) must not alias the
    fingerprint — the first/last-4KB content sample catches it."""
    import os

    p = tmp_path / "data.parquet"
    p.write_bytes(b"A" * 10000)
    st = os.stat(p)
    fp1 = bucketing.corpus_fingerprint(str(tmp_path))
    # same size, same mtime, different content — the change sits in the
    # sampled TAIL window, modeling a parquet footer rewrite (row
    # counts / column stats live there)
    p.write_bytes(b"A" * 8192 + b"C" * 1808)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    fp2 = bucketing.corpus_fingerprint(str(tmp_path))
    assert os.stat(p).st_mtime_ns == st.st_mtime_ns
    assert fp1 != fp2
    # identical stat + identical content -> identical fingerprint
    fp3 = bucketing.corpus_fingerprint(str(tmp_path))
    assert fp2 == fp3


def test_ensure_bucketed_sort_keys_superset(spark):
    """r12: sort_keys lets the on-disk order be a superset of the
    bucket key — the layout that serves BOTH a (doc_id) join and a
    (doc_id, sh) merge join from one table. The sort spec is folded
    into the stamp (a sort change rebuilds), and a self-join on the
    full sort prefix compiles with no Sort over the scan output."""
    calls = []

    def build():
        calls.append(1)
        df = spark.createDataFrame(
            [(i % 7, f"s{i}") for i in range(100)], "doc_id long, sh string"
        )
        return df.repartition(2, "doc_id")

    t = "t_sortkeys_superset"
    try:
        assert bucketing.ensure_bucketed(
            spark, t, "doc_id", "fp-a", build, num_buckets=2,
            sort_keys=["doc_id", "sh"],
        )
        assert bucketing.table_fingerprint(spark, t) == (
            "fp-a|keys=doc_id|nb=2|sorted=True|sortkeys=doc_id,sh"
        )
        # same everything -> skip; different sort_keys -> rebuild
        assert (
            bucketing.ensure_bucketed(
                spark, t, "doc_id", "fp-a", build, num_buckets=2,
                sort_keys=["doc_id", "sh"],
            )
            is False
        )
        assert bucketing.ensure_bucketed(
            spark, t, "doc_id", "fp-a", build, num_buckets=2
        )
        assert calls == [1, 1]
    finally:
        bucketing.drop_bucketed(spark, t)


def test_drop_corpus_tables_purges_tag_matches(spark, tmp_path):
    """drop_corpus_tables removes every table (and on-disk location)
    carrying the corpus' tag and leaves other corpora alone."""
    import os

    a = tmp_path / "ca"
    b = tmp_path / "cb"
    a.mkdir()
    b.mkdir()
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    ta = f"b_nd_test_{bucketing.corpus_table_tag(str(a))}"
    tb = f"b_nd_test_{bucketing.corpus_table_tag(str(b))}"
    bucketing.write_bucketed(df, ta, "id", num_buckets=2)
    bucketing.write_bucketed(df, tb, "id", num_buckets=2)
    dropped = bucketing.drop_corpus_tables(spark, str(a))
    assert dropped == [ta]
    assert not spark.catalog.tableExists(ta)
    assert not os.path.isdir(bucketing._table_location(spark, ta))
    assert spark.catalog.tableExists(tb)
    bucketing.drop_corpus_tables(spark, str(b))
    assert not spark.catalog.tableExists(tb)


def test_gc_warehouse_collect_rules(tmp_path):
    """scripts/gc_warehouse.py (r12, verdict ask #4): hash-tagged
    b_nd_* tables survive iff a live corpus owns their tag; legacy
    b_nd_base_* (the superseded r11 generation) always reclaim;
    anything outside the b_nd_ prefix is never touched."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import gc_warehouse

    live = tmp_path / "corpus_live"
    dead = tmp_path / "corpus_dead"
    live.mkdir()
    dead.mkdir()
    wh = tmp_path / "warehouse"
    wh.mkdir()
    live_tag = bucketing.corpus_table_tag(str(live))
    dead_tag = bucketing.corpus_table_tag(str(dead))
    names = [
        f"b_nd_shingles_{live_tag}",       # keep: live corpus
        f"b_nd_shingles_{dead_tag}",       # reclaim: no live corpus
        "b_nd_base_bands_sf0_01",          # reclaim: legacy generation
        "b_orders_sf0_1",                  # keep: not GC-managed
        "t_lineitem_b",                    # keep: not GC-managed
        # r13: token-stream tables and banding-study variant suffixes
        # are GC-managed per-corpus accumulators too
        f"b_tok_arrays_{live_tag}",        # keep: live corpus
        f"b_tok_arrays_{dead_tag}",        # reclaim: no live corpus
        f"b_nd_bands_{live_tag}_v2x8",     # keep: variant of live corpus
        f"b_nd_xx_bands_{dead_tag}_v48x16",  # reclaim: variant, dead
    ]
    for n in names:
        (wh / n).mkdir()
    reclaim, keep = gc_warehouse.collect(str(wh), [str(live)])
    assert sorted(reclaim) == sorted(
        [
            f"b_nd_shingles_{dead_tag}",
            "b_nd_base_bands_sf0_01",
            f"b_tok_arrays_{dead_tag}",
            f"b_nd_xx_bands_{dead_tag}_v48x16",
        ]
    )
    assert f"b_nd_shingles_{live_tag}" in keep
    assert f"b_tok_arrays_{live_tag}" in keep
    assert f"b_nd_bands_{live_tag}_v2x8" in keep
    assert "b_orders_sf0_1" in keep and "t_lineitem_b" in keep
    # main() with --dry-run deletes nothing; without, exactly reclaim
    rep = gc_warehouse.main(
        ["--warehouse", str(wh), "--live", str(live), "--dry-run"]
    )
    assert rep["reclaimed"] == sorted(reclaim) and (wh / reclaim[0]).exists()
    rep = gc_warehouse.main(["--warehouse", str(wh), "--live", str(live)])
    for n in rep["reclaimed"]:
        assert not (wh / n).exists()
    assert (wh / f"b_nd_shingles_{live_tag}").exists()


def test_stream_neardup_empty_delta_returns_typed_empty(spark, tmp_path):
    """r12 ADVICE: a corpus with NO qualifying delta docs (doc_id%10==7
    with non-null text) means every foreachBatch writes an empty frame
    — Spark emits no parquet part files — so the final read must not
    crash on schema inference; it returns an empty, correctly-typed
    result, matching the oracle's empty answer."""
    import duckdb

    from automated_property_data_ingestion_document_pipeline_spark.plans.queries_neardup import (
        q_stream_neardup,
    )

    corpus = tmp_path / "empty_delta_corpus"
    corpus.mkdir()
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
        "WHERE doc_id % 10 != 7) TO '"
        + str(corpus / "documents.parquet")
        + "' (FORMAT PARQUET)"
    )
    con.close()

    out = q_stream_neardup(spark, str(corpus))
    assert out.columns == ["doc_id", "n_cand", "n_dup", "max_jaccard"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
        "bigint",
        "double",
    ]
    assert out.count() == 0
