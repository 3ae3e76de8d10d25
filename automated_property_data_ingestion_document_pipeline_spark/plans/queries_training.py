"""Training-data pipeline registrations (SURVEY §1.1 #4 extension):
int8 embedding quantization, sequence packing, PII scrubbing, benchmark
decontamination, stratified sampling — each with a DuckDB oracle so the
driver checks values, not shapes.

Tokenization parity: both engines split on the EXPLICIT whitespace
class ``[ \\t\\n\\x0B\\f\\r]+`` (not ``\\s`` — Java's includes \\x0B, RE2's
does not; see functions/text.WS_SPLIT) and filter empties; shingles are
the same windows ``shingles_of`` builds (full-text single shingle when
n < k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automated_property_data_ingestion_document_pipeline_spark import catalog
from automated_property_data_ingestion_document_pipeline_spark.functions import text as T
from automated_property_data_ingestion_document_pipeline_spark.operators import training
from automated_property_data_ingestion_document_pipeline_spark.plans.registry import query
from automated_property_data_ingestion_document_pipeline_spark.functions.text import WS_SPLIT

# explicit class, not \s — RE2's \s omits \x0B; derived from the ONE
# canonical constant so Spark and the oracles cannot de-synchronize
_TOKS = "list_filter(regexp_split_to_array({{col}}, '{ws}'), t -> t <> '')".format(
    ws=WS_SPLIT
)


# -- int8 embedding quantization ----------------------------------------------


@query(
    "q_quantize_embeddings",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (SELECT vec_id, e,
                 127.0 / greatest(list_max(list_transform(e, x -> abs(x))), 1e-12) AS scale
          FROM v),
    q AS (SELECT vec_id, scale,
                 list_transform(e, x -> CAST(round(x * scale) AS INTEGER)) AS qvec
          FROM s)
    SELECT vec_id, scale,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum,
           CAST(list_min(qvec) AS INTEGER) AS q_min,
           CAST(list_max(qvec) AS INTEGER) AS q_max,
           qvec[1] AS q_first
    FROM q
    """,
)
def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (operators/training.py): Arrow-batched
    numpy kernel with explicit round-half-away (numpy's native round is
    banker's; Spark/DuckDB round away from zero — the formula aligns all
    three). Output digested to scalars (sum/min/max/first) because the
    driver's canonical form compares scalar cells, not nested arrays."""
    e = catalog.load(spark, sf_dir, "embeddings")
    q = training.quantize_embeddings(e)
    return q.select(
        "vec_id",
        "scale",
        F.aggregate("qvec", F.lit(0).cast("bigint"), lambda a, v: a + v).alias("q_sum"),
        F.array_min("qvec").alias("q_min"),
        F.array_max("qvec").alias("q_max"),
        F.element_at("qvec", 1).alias("q_first"),
    )


# -- sequence packing ----------------------------------------------------------


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_TOKS.format(col='text')}) AS BIGINT) AS n_tokens,
             doc_id % 8 AS shard
      FROM documents)
    SELECT doc_id, n_tokens,
           CAST(shard * 1000000 + floor(
             (SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
             / 2048) AS BIGINT) AS pack_id
    FROM d
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into ~2048-token shard-local bins
    (operators/training.py): per-shard running sum, docs assigned by
    start offset so bins overflow rather than split documents; shards
    give the parallelism a single global pack order would forfeit."""
    d = catalog.load(spark, sf_dir, "documents")
    return training.pack_sequences(d, bin_tokens=2048, num_shards=8)


# -- PII scrubbing -------------------------------------------------------------


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' Contact: user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 555-867-5309.'
                  ELSE text END AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{training.EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{training.PHONE_RE}')) AS BIGINT) AS n_phones,
           regexp_replace(regexp_replace(t, '{training.EMAIL_RE}', '<EMAIL>', 'g'),
                          '{training.PHONE_RE}', '<PHONE>', 'g') AS clean_text
    FROM aug
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking (operators/training.py): emails/phones → placeholder
    tokens with per-category counts. PII is injected deterministically
    into every 5th document on BOTH engines so the masking is actually
    exercised (the synthetic corpus carries none). RE2-compatible
    patterns; row-local codegen."""
    d = catalog.load(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"),
            F.lit(" Contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-867-5309."),
        ),
    ).otherwise(F.col("text"))
    aug = d.select("doc_id", injected.alias("t"))
    return aug.select(
        "doc_id",
        F.regexp_count("t", F.lit(training.EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("t", F.lit(training.PHONE_RE)).cast("bigint").alias("n_phones"),
        training.scrub_pii(F.col("t")).alias("clean_text"),
    )


# -- benchmark decontamination -------------------------------------------------


@query(
    "q_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS.format(col='text')} AS l FROM documents),
    sh AS (
      SELECT doc_id, unnest(CASE WHEN len(l) >= 5
               THEN list_distinct(list_transform(range(1, len(l) - 5 + 2),
                      i -> array_to_string(list_slice(l, i, i + 4), ' ')))
               ELSE [CASE WHEN l IS NULL THEN NULL
                          ELSE COALESCE(array_to_string(l, ' '), '') END] END) AS s
      FROM toks),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10),
    corp AS (SELECT doc_id, s FROM sh WHERE doc_id >= 10)
    SELECT corp.doc_id, CAST(COUNT(DISTINCT corp.s) AS BIGINT) AS n_shared_shingles
    FROM corp JOIN bench ON corp.s = bench.s
    GROUP BY corp.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination (operators/training.py): corpus docs
    sharing any 5-token shingle with the benchmark set (docs 0-9 stand
    in for an eval set), with shared-shingle counts. Benchmark shingles
    broadcast; corpus side is one explode + map-side join — linear in
    corpus tokens."""
    d = catalog.load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 10)
    corpus = d.filter(F.col("doc_id") >= 10)
    return training.contamination_flags(corpus, bench, shingle_k=5)


# -- §1.1 composite: the full corpus-curation dataflow -------------------------


def _corpus_pipeline_oracle() -> str:
    toks_lower = _TOKS.format(col="lower(text)")
    lang_scores = {
        lg: (
            f"CAST(len(list_filter({toks_lower}, x -> list_contains({T.STOPWORDS[lg]!r}, x))) AS DOUBLE)"
            f" / greatest(len({toks_lower}), 1)"
        )
        for lg in sorted(T.STOPWORDS)
    }
    score_defs = ", ".join(f"{expr} AS s_{lg}" for lg, expr in lang_scores.items())
    return f"""
    WITH m AS (
      SELECT doc_id, text,
             length(text) AS nc,
             greatest(len({_TOKS.format(col='text')}), 1) AS nt,
             CAST(len({_TOKS.format(col='text')}) AS BIGINT) AS n_tokens,
             CAST(length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS alpha_ratio,
             {score_defs}
      FROM documents),
    scored AS (
      SELECT doc_id, text, n_tokens,
             (CASE WHEN nc >= 64 AND nc <= 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN CAST(nc AS DOUBLE)/nt >= 2.0 AND CAST(nc AS DOUBLE)/nt <= 12.0
                     THEN 0.3 ELSE 0.0 END)
             + alpha_ratio * 0.3 AS quality,
             CASE WHEN greatest(s_de, s_en, s_es) <= 0 THEN 'und'
                  WHEN s_de >= s_en AND s_de >= s_es THEN 'de'
                  WHEN s_en >= s_es THEN 'en'
                  ELSE 'es' END AS lang_pred
      FROM m),
    kept AS (SELECT * FROM scored WHERE quality >= 0.5),
    deduped AS (
      SELECT * FROM kept
      QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1)
    SELECT doc_id, lang_pred, quality, n_tokens,
           CAST((doc_id % 8) * 1000000 + floor(
             (SUM(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
             / 2048) AS BIGINT) AS pack_id
    FROM deduped
    """


@query("q_corpus_pipeline", oracle=_corpus_pipeline_oracle())
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM corpus-curation dataflow as ONE pipeline (the training
    analog of q_engagement_pipeline): score quality → language-ID →
    quality gate → exact dedup (canonical min-id per content hash) →
    pack survivors into shard-local token bins.

    Plan shape: scoring/gating is a codegen'd scan+project (no
    shuffle); dedup is one shuffle on the 256-bit content hash; packing
    is one shuffle on the 8-way shard — three exchange stages total for
    the whole dataflow, each on a key that stays uniform at 100 TB."""
    from pyspark.sql import Window

    d = catalog.load(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id",
        "text",
        T.quality_score(F.col("text")).alias("quality"),
        T.lang_id_from_tokens(T.tokens(F.lower(F.col("text")))).alias("lang_pred"),
        T.token_count_ws(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    kept = toked.filter(F.col("quality") >= 0.5)
    w = Window.partitionBy(F.sha2("text", 256)).orderBy(F.col("doc_id").asc())
    deduped = (
        kept.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    shard = F.col("doc_id") % 8
    pw = (
        Window.partitionBy(shard)
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(pw) - F.col("n_tokens")
    pack = (shard * 1_000_000 + F.floor(start / 2048)).cast("bigint")
    return deduped.select("doc_id", "lang_pred", "quality", "n_tokens", pack.alias("pack_id"))


# -- stratified sampling -------------------------------------------------------


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample (operators/training.py): md5-of-id
    pseudo-random order inside each stratum, 20 docs kept per language —
    deterministic, engine-portable corpus mixture control."""
    d = catalog.load(spark, sf_dir, "documents").select("doc_id", "lang")
    return training.stratified_sample(d, strata_col="lang", id_col="doc_id", quota=20)


# -- deterministic weighted domain mixing -------------------------------------


@query(
    "q_domain_mix",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, lang, n_chars,
             CASE WHEN TRY_CAST(SUBSTRING(source, 4) AS INTEGER) % 2 = 0
                  THEN 'c0000000' ELSE '40000000' END AS threshold
      FROM documents)
    SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM r
    WHERE SUBSTRING(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8)
          < threshold
    """,
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain mixing via deterministic hash sampling — the
    pretraining-mixture op (sample each source to its target weight:
    even-numbered sources keep 75 %, odd keep 25 %). Selection is
    ``md5(doc_id:source) < rate-threshold`` on the first 8 hex chars:
    reproducible across engines, runs and partitionings (no RNG state),
    embarrassingly parallel (map-only — the 100 TB mixture is a scan,
    not a shuffle), and exactly-seeded per (doc, source) so re-running
    the pipeline can never double- or under-sample a document. Both
    engines produce bit-identical md5 hex, so the oracle checks the
    exact sampled set, not just the rate."""
    d = catalog.load(spark, sf_dir, "documents")
    num = F.substring("source", 4, 10).cast("int")
    threshold = F.when(num % 2 == 0, F.lit("c0000000")).otherwise(F.lit("40000000"))
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source")))
    return (
        d.withColumn("_th", threshold)
        .filter(F.substring(key, 1, 8) < F.col("_th"))
        .select("doc_id", "source", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))
    )


# -- sliding-window token chunking --------------------------------------------


@query(
    "q_chunk_overlap",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TOKS.format(col='text')} AS toks FROM documents),
    c AS (
      SELECT doc_id, toks,
             greatest(0, CAST(ceil((len(toks) - 32) / 24.0) AS INTEGER)) AS k
      FROM d),
    x AS (
      SELECT doc_id, toks, unnest(range(0, k + 1)) AS i FROM c)
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
           -- coalesce: DuckDB array_to_string is NULL for empty AND
           -- NULL lists; Spark concat_ws is '' for both
           COALESCE(array_to_string(toks[i*24+1 : i*24+32], ' '), '')
             AS chunk_text,
           CAST(len(toks[i*24+1 : i*24+32]) AS INTEGER) AS n_tokens
    FROM x
    """,
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window sequence chunking (context-window packing's
    sibling): 32-token chunks at stride 24 (8-token overlap so no
    span is ever split across a chunk boundary unseen). Chunk count
    derives from token count row-locally (sequence + explode — never a
    driver loop); the fan-out is ~n/24 rows per doc. Trailing chunks
    shorter than the window are kept (slice clamps on both engines)."""
    d = catalog.load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", WS_SPLIT), lambda t: t != "")
    base = d.select("doc_id", toks.alias("_toks")).withColumn(
        "_k",
        F.greatest(
            F.lit(0), F.ceil((F.size("_toks") - F.lit(32)) / F.lit(24.0)).cast("int")
        ),
    )
    chunk = base.select(
        "doc_id", "_toks", F.explode(F.sequence(F.lit(0), F.col("_k"))).alias("chunk_id")
    )
    sl = F.slice("_toks", F.col("chunk_id") * 24 + 1, 32)
    return chunk.select(
        "doc_id",
        "chunk_id",
        F.concat_ws(" ", sl).alias("chunk_text"),
        F.size(sl).alias("n_tokens"),
    )


# -- curation pipeline v2: mix -> LM-quality gate -> chunk --------------------


@query(
    "q_curation_pipeline2",
    oracle=f"""
    WITH mix AS (
      SELECT doc_id, source, text
      FROM documents
      WHERE SUBSTRING(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8)
            < CASE WHEN TRY_CAST(SUBSTRING(source, 4) AS INTEGER) % 2 = 0
                   THEN 'c0000000' ELSE '40000000' END),
    t AS (
      SELECT doc_id, unnest({_TOKS.format(col='text')}) AS tok FROM mix),
    c AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
    s AS (
      SELECT t.doc_id,
             CAST(SUM(length(bin(c.cnt)) - 1) AS BIGINT) AS log2_sum,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM t JOIN c USING (tok) GROUP BY t.doc_id),
    gate AS (
      SELECT doc_id FROM s
      WHERE CAST(log2_sum AS DOUBLE) / n_tokens >=
            (SELECT CAST(SUM(log2_sum) AS DOUBLE) / SUM(n_tokens) FROM s)),
    d2 AS (
      SELECT m.doc_id, m.source, {_TOKS.format(col='m.text')} AS toks
      FROM mix m JOIN gate g ON g.doc_id = m.doc_id),
    k2 AS (
      SELECT doc_id, source, toks,
             greatest(0, CAST(ceil((len(toks) - 32) / 24.0) AS INTEGER)) AS k
      FROM d2),
    x AS (
      SELECT doc_id, source, toks, unnest(range(0, k + 1)) AS i FROM k2)
    SELECT doc_id, source, CAST(i AS INTEGER) AS chunk_id,
           COALESCE(array_to_string(toks[i*24+1 : i*24+32], ' '), '')
             AS chunk_text,
           CAST(len(toks[i*24+1 : i*24+32]) AS INTEGER) AS chunk_tokens
    FROM x
    """,
)
def q_curation_pipeline2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 curation composite chaining the new training ops as ONE
    dataflow: deterministic domain mixing (md5 threshold, map-only) →
    unigram-LM quality gate (keep docs at or above the corpus-level
    log-frequency ratio — the gate threshold is a ratio of exact
    corpus-wide BIGINTs, so it is scale-invariant and bit-portable,
    unlike a hard-coded band) → 32/24 sliding-window chunking.

    Plan: sampling is a filter in the scan; the vocab count and per-doc
    score are the q_unigram_logfreq two-shuffle shape; the corpus ratio
    is a 1-row broadcast; chunking is a row-local fan-out. Four
    exchanges end-to-end, none keyed on anything that skews."""
    d = catalog.load(spark, sf_dir, "documents")
    num = F.substring("source", 4, 10).cast("int")
    threshold = F.when(num % 2 == 0, F.lit("c0000000")).otherwise(F.lit("40000000"))
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source")))
    mix = d.filter(F.substring(key, 1, 8) < threshold).select("doc_id", "source", "text")

    toks = F.filter(F.split("text", WS_SPLIT), lambda t: t != "")
    t = mix.select("doc_id", F.explode(toks).alias("tok"))
    # one-scan vocab count (window over tok), as in q_unigram_logfreq
    bucket = F.length(F.bin(F.count("*").over(Window.partitionBy("tok")))) - F.lit(1)
    s = (
        t.withColumn("_b", bucket)
        .groupBy("doc_id")
        .agg(
            F.sum("_b").alias("log2_sum"),
            F.count("*").alias("n_tokens"),
        )
    )
    ratio = s.agg(
        (F.sum("log2_sum").cast("double") / F.sum("n_tokens")).alias("_r")
    )
    gate = (
        s.crossJoin(F.broadcast(ratio))
        .filter(F.col("log2_sum").cast("double") / F.col("n_tokens") >= F.col("_r"))
        .select("doc_id")
    )
    # finding 94: `gate` is per-doc post-explode output (corpus-growing,
    # estimate unreliable past Generate) — never broadcast
    kept = mix.join(gate.hint("shuffle_hash"), "doc_id").select(
        "doc_id", "source", toks.alias("_toks")
    )
    base = kept.withColumn(
        "_k",
        F.greatest(
            F.lit(0), F.ceil((F.size("_toks") - F.lit(32)) / F.lit(24.0)).cast("int")
        ),
    )
    chunk = base.select(
        "doc_id", "source", "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_k"))).alias("chunk_id"),
    )
    sl = F.slice("_toks", F.col("chunk_id") * 24 + 1, 32)
    return chunk.select(
        "doc_id",
        "source",
        "chunk_id",
        F.concat_ws(" ", sl).alias("chunk_text"),
        F.size(sl).alias("chunk_tokens"),
    )


# -- deterministic dataset split ----------------------------------------------


@query(
    "q_dataset_split",
    oracle="""
    WITH s AS (
      SELECT doc_id, source, lang,
             SUBSTRING(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
      FROM documents),
    a AS (
      SELECT doc_id, source, lang,
             CASE WHEN h < 'e6666666' THEN 'train'
                  WHEN h < 'f3333333' THEN 'val'
                  ELSE 'test' END AS split
      FROM s)
    SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM a GROUP BY split, source
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split — the md5-threshold
    trick again (q_domain_mix): assignment is a pure function of
    doc_id, so it is stable across runs, partitionings and engines
    (never re-shuffles a doc between splits when the corpus grows —
    the property random splits lose). Thresholds are hex fractions of
    the 16^8 space (0.9 → 'e6666666', 0.95 → 'f3333333'). Output
    digests per-(split, source) counts; the oracle checks the exact
    assignment through them."""
    d = catalog.load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8)
    split = (
        F.when(h < "e6666666", "train").when(h < "f3333333", "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


# -- weighted (probability-proportional-to-size) sampling ----------------------


@query(
    "q_weighted_sample",
    oracle="""
    WITH mx AS (
      SELECT CAST(MAX(n_chars) AS BIGINT) AS max_chars FROM documents),
    s AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             SUBSTRING(md5('wsample:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS h,
             printf('%08x', CAST(d.n_chars * 2147483647 / mx.max_chars AS BIGINT))
               AS thresh
      FROM documents d, mx
      WHERE d.n_chars IS NOT NULL AND d.n_chars > 0)
    SELECT doc_id, lang, n_chars FROM s WHERE h < thresh
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (PPS / Poisson) sampling: each document is kept with
    probability proportional to its length — the standard
    upweight-long-documents draw in mixture construction. Deterministic
    and engine-portable: the uniform draw is the md5-hex prefix
    (q_dataset_split's trick), the acceptance threshold is the weight
    fraction rendered as an 8-hex string via printf('%08x', ...) — the
    comparison is pure string ordering, no float in sight; the
    fraction itself is exact (n_chars × 2^31-1 stays far below 2^53,
    so both engines' double division truncates identically). Map-only
    except the single-row MAX broadcast; acceptance is a pure function
    of (doc_id, n_chars) — stable under repartitioning and corpus
    growth, the property rand()-based sampling loses."""
    d = catalog.load(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull() & (F.col("n_chars") > 0)
    )
    mx = d.agg(F.max("n_chars").cast("bigint").alias("max_chars"))
    h = F.substring(F.md5(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string"))), 1, 8)
    thresh = F.format_string(
        "%08x",
        (F.col("n_chars") * F.lit(2147483647) / F.col("max_chars")).cast("bigint"),
    )
    return (
        d.join(F.broadcast(mx))
        .filter(h < thresh)
        .select("doc_id", "lang", "n_chars")
    )


# -- token-budget-capped sampling ---------------------------------------------


@query(
    "q_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({_TOKS.format(col='text')}) AS BIGINT) AS n_tokens
      FROM documents),
    r AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
    FROM r WHERE cum <= 2000
    """,
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-capped sampling: keep documents per source, in
    deterministic doc_id order, until the source's running token total
    exceeds the budget (how a mixture recipe caps each domain's
    contribution in TOKENS, not documents). One window pass per source
    partition; exact BIGINT running sums so the cut-off document is
    identical on both engines."""
    d = catalog.load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", WS_SPLIT), lambda t: t != "")
    t = d.select("doc_id", "source", F.size(toks).cast("bigint").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 2000)
        .select("doc_id", "source", "n_tokens", F.col("cum_tokens").cast("bigint"))
    )


# -- percentile-band outlier trimming -----------------------------------------


@query(
    "q_quality_band",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({_TOKS.format(col='text')}) AS BIGINT) AS n_tokens
      FROM documents),
    r AS (
      SELECT doc_id, source, n_tokens,
             cume_dist() OVER (PARTITION BY source
                               ORDER BY n_tokens NULLS FIRST, doc_id) AS pct
      FROM t)
    SELECT doc_id, source, n_tokens
    FROM r WHERE pct > 0.1 AND pct <= 0.9
    """,
)
def q_quality_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band outlier trimming (the Gopher-style length rule
    done exactly): per source, keep documents whose token count falls
    strictly inside the (p10, p90] band — dropping the truncated-
    fragment tail and the boilerplate-concatenation head. cume_dist
    over (n_tokens, doc_id) gives an EXACT, deterministic percentile
    (ratio of identical integers — no approx_percentile sketch, no
    engine-specific interpolation), at the cost of one sort per source
    partition; at 100 TB swap in approx_percentile thresholds and keep
    this form as its oracle-checkable twin (q_quantile_error's pattern
    measures that substitution's error)."""
    d = catalog.load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", WS_SPLIT), lambda t: t != "")
    t = d.select("doc_id", "source", F.size(toks).cast("bigint").alias("n_tokens"))
    w = Window.partitionBy("source").orderBy(F.col("n_tokens").asc(), F.col("doc_id").asc())
    return (
        t.withColumn("pct", F.cume_dist().over(w))
        .filter((F.col("pct") > 0.1) & (F.col("pct") <= 0.9))
        .select("doc_id", "source", "n_tokens")
    )
