"""Training-data pipeline corpus: the dataset-preparation operators a
large-scale LLM training run needs *around* dedup/similarity (llm.py) —
deterministic splits, stratified sampling, document chunking, PII
redaction, vocabulary building, epoch shuffling.

Everything is hash-deterministic (no RNG): a split or sample defined as
``portable_hash(key) % N < rate`` is reproducible across engines, runs,
and cluster sizes — which is exactly what a training pipeline needs
(re-running the pipeline must regenerate the *same* train set), and it
makes every query here DuckDB-oracle-checkable bit-for-bit.

Scale notes: all six are narrow map-side transforms or single-shuffle
aggregations. The hash-filter pattern (q71/q72) is THE scale answer to
sampling 100 TB: no coordination, no RNG state, prunes at the scan when
the key is a partition column. Chunking (q73) is a generate + posexplode
— row count multiplies but bytes don't (substring slices). Vocabulary
(q75) is the classic word-count shuffle with map-side partial aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import query, t
from .llm import duck_h31, spark_h31

# --------------------------------------------------------------------------
# q71 — deterministic train/val/test split: hash of the stable doc key
# mod 100 -> 80/10/10. The reference point for "did my pipeline's split
# drift between runs" is that it CANNOT: same key -> same split forever,
# independent of partitioning, cluster size, or row order.
# --------------------------------------------------------------------------


@query(
    "q71_train_split",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             CASE WHEN {duck_h31("CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
                  WHEN {duck_h31("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM assigned GROUP BY split ORDER BY split
    """,
    category="training",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    h = F.expr(spark_h31("CAST(doc_id AS STRING)")) % 100
    return (
        t(spark, sf, "documents")
        .withColumn(
            "split",
            F.when(h < 80, "train").when(h < 90, "val").otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# q72 — deterministic stratified sampling: per-language keep-rates (e.g.
# downsample dominant English, keep all of scarce languages) applied as a
# hash filter. Map-side only — the filter needs no shuffle, no RNG, and
# at 100 TB no coordination; the tiny rates table would be a broadcast.
# --------------------------------------------------------------------------

_RATES = {"en": 30, "de": 100, "es": 75, "fr": 100, "zh": 50}


@query(
    "q72_stratified_sample",
    oracle=f"""
    WITH kept AS (
      SELECT lang, n_chars FROM documents
      WHERE {duck_h31("'s72-' || CAST(doc_id AS VARCHAR)")} % 100 <
            CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 100 WHEN 'es' THEN 75
                      WHEN 'fr' THEN 100 WHEN 'zh' THEN 50 ELSE 0 END
    )
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM kept GROUP BY lang ORDER BY lang
    """,
    category="training",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    h = F.expr(spark_h31("concat('s72-', CAST(doc_id AS STRING))")) % 100
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _RATES.items()],
        F.lit(0),
    )
    return (
        t(spark, sf, "documents")
        .filter(h < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# q73 — document chunking: fixed-width character chunks (the token-window
# analogue) via sequence + posexplode. Bytes don't multiply — each chunk
# is a substring slice; only row count grows. At scale this is the stage
# that feeds the tokenizer, and it's embarrassingly parallel.
# --------------------------------------------------------------------------

_CHUNK = 256


@query(
    "q73_doc_chunking",
    oracle=f"""
    SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS chunk_id,
           md5(substring(text, CAST((u.i - 1) * {_CHUNK} + 1 AS BIGINT), {_CHUNK})) AS chunk_digest,
           CAST(length(substring(text, CAST((u.i - 1) * {_CHUNK} + 1 AS BIGINT), {_CHUNK})) AS BIGINT) AS chunk_len
    FROM documents,
         unnest(generate_series(1, CAST(ceil(length(text) / {_CHUNK}.0) AS BIGINT))) AS u(i)
    WHERE doc_id < 100
    ORDER BY doc_id, chunk_id
    """,
    category="training",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    n_chunks = F.ceil(F.length("text") / F.lit(_CHUNK)).cast("int")
    return (
        d.select(
            "doc_id",
            "text",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_i"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr(f"substring(text, chunk_id * {_CHUNK} + 1, {_CHUNK})").alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.md5("chunk").alias("chunk_digest"),
            F.length("chunk").cast("long").alias("chunk_len"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# --------------------------------------------------------------------------
# q74 — PII redaction: regex scrub (numbers/emails/SSN-shaped spans ->
# placeholder tokens) with per-doc replacement accounting. Pure map-side
# regexp_replace in whole-stage codegen — the JVM hot path, no Python.
# The regexes stay in the dialect subset shared by Java regex and RE2.
# --------------------------------------------------------------------------

_PII_PATTERNS = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]", "<SSN>"),
    ("[0-9]+", "<NUM>"),
]


@query(
    "q74_pii_redaction",
    oracle="""
    WITH red AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
               '[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]', '<SSN>', 'g'),
               '[0-9]+', '<NUM>', 'g') AS clean,
             text
      FROM documents
    )
    SELECT doc_id, md5(clean) AS clean_digest,
           CAST(length(text) - length(clean) AS BIGINT) AS delta_chars,
           CAST(length(clean) - length(replace(clean, '<NUM>', ''))
                AS BIGINT) / 5 AS n_num_redactions
    FROM red ORDER BY doc_id
    """,
    category="training",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    clean = F.col("text")
    for pat, repl in _PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return (
        t(spark, sf, "documents")
        .withColumn("clean", clean)
        .select(
            "doc_id",
            F.md5("clean").alias("clean_digest"),
            (F.length("text") - F.length("clean")).cast("long").alias("delta_chars"),
            (
                (F.length("clean") - F.length(F.replace(F.col("clean"), F.lit("<NUM>"), F.lit(""))))
                / F.lit(5)
            ).alias("n_num_redactions"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q75 — vocabulary building: top-k tokens by frequency. The word-count
# shuffle: explode is map-side, the groupBy does partial aggregation
# before the exchange, top-k is a TakeOrderedAndProject (no full sort).
# --------------------------------------------------------------------------

_VOCAB_K = 100


@query(
    "q75_vocab_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS freq FROM tok
    WHERE token <> ''
    GROUP BY token ORDER BY freq DESC, token LIMIT {_VOCAB_K}
    """,
    category="training",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "documents")
        .select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(_VOCAB_K)
    )


# --------------------------------------------------------------------------
# q76 — deterministic epoch shuffle: a reproducible global permutation of
# the dataset, ordered by hash of (seed, key). Changing the seed string
# reshuffles; the same seed replays the same order on any cluster.
# Positions come from operators/rank.py::global_positions — a parallel
# range-partitioned numbering, NOT row_number() over a global window
# (which would collapse every row into one task at scale).
# --------------------------------------------------------------------------


@query(
    "q76_epoch_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY {duck_h31("'epoch1-' || CAST(doc_id AS VARCHAR)")}, doc_id
           ) AS BIGINT) AS position
    FROM documents ORDER BY position
    """,
    category="training",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.rank import global_positions

    h = F.expr(spark_h31("concat('epoch1-', CAST(doc_id AS STRING))"))
    d = t(spark, sf, "documents").select("doc_id", h.alias("_h"))
    return (
        global_positions(d, ["_h", "doc_id"])
        .select("doc_id", "position")
        .orderBy("position")
    )


# --------------------------------------------------------------------------
# q79 — quality-filter funnel: the per-source survival report of a
# filter cascade (length -> token count -> stopword ratio -> exact-dup
# keeper). Every training pipeline publishes exactly this table to show
# where its data went. Single scan: each gate is a flag column and the
# funnel is conditional sums — the dedup gate is a window min over the
# content digest, so the whole report costs one shuffle plus the agg.
# --------------------------------------------------------------------------

_STOPWORDS79 = "('the','a','of','and','to','in','is','it','on','for')"


@query(
    "q79_filter_funnel",
    oracle=f"""
    WITH flags AS (
      SELECT source,
             n_chars BETWEEN 200 AND 20000 AS g_len,
             len(string_split(text, ' ')) >= 40 AS g_tok,
             CAST(len(list_filter(string_split(text, ' '),
                      tk -> tk IN {_STOPWORDS79})) AS DOUBLE)
               / len(string_split(text, ' ')) >= 0.05 AS g_stop,
             doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS g_keeper
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN g_len THEN 1 ELSE 0 END) AS BIGINT) AS after_len,
           CAST(SUM(CASE WHEN g_len AND g_tok THEN 1 ELSE 0 END) AS BIGINT) AS after_tok,
           CAST(SUM(CASE WHEN g_len AND g_tok AND g_stop THEN 1 ELSE 0 END) AS BIGINT) AS after_stop,
           CAST(SUM(CASE WHEN g_len AND g_tok AND g_stop AND g_keeper THEN 1 ELSE 0 END) AS BIGINT) AS after_dedup
    FROM flags GROUP BY source ORDER BY source
    """,
    category="training",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), tk -> tk IN {_STOPWORDS79})"))
    g_len = F.col("n_chars").between(200, 20000)
    g_tok = n_tok >= 40
    g_stop = (n_stop.cast("double") / n_tok) >= 0.05
    g_keeper = F.col("doc_id") == F.min("doc_id").over(
        W.partitionBy(F.md5("text"))
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).alias  # noqa: E731
    return (
        t(spark, sf, "documents")
        .select(
            "source",
            g_len.alias("g_len"),
            g_tok.alias("g_tok"),
            g_stop.alias("g_stop"),
            g_keeper.alias("g_keeper"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            cnt(F.col("g_len"))("after_len"),
            cnt(F.col("g_len") & F.col("g_tok"))("after_tok"),
            cnt(F.col("g_len") & F.col("g_tok") & F.col("g_stop"))("after_stop"),
            cnt(F.col("g_len") & F.col("g_tok") & F.col("g_stop") & F.col("g_keeper"))(
                "after_dedup"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q80 — boilerplate n-gram detection: 5-grams appearing in many distinct
# documents (headers, footers, license blurbs). The C4/RefinedWeb-style
# boilerplate pass. Shape: explode -> distinct (doc, gram) -> count
# distinct docs per gram -> threshold. The distinct is the one shuffle;
# doc frequency (not raw frequency) is what finds boilerplate, since a
# gram repeated 100x inside ONE doc is content, not boilerplate.
# --------------------------------------------------------------------------

# the synthetic corpus is random-word text, so repeated 5-grams are rare:
# threshold 3 yields a real result set here; production boilerplate
# passes run the same shape with a much higher bar (e.g. 1% of docs)
_BP_MIN_DOCS = 3


@query(
    "q80_boilerplate_ngrams",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 4),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g
      FROM w
    )
    SELECT g AS gram, COUNT(*) AS n_docs
    FROM grams GROUP BY g HAVING COUNT(*) >= {_BP_MIN_DOCS}
    ORDER BY n_docs DESC, gram
    """,
    category="training",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    # per-doc dedup happens INSIDE the array (array_distinct, map-side)
    # so doc frequency needs no (doc_id, gram) shuffle — the only
    # exchange is the gram count itself. At 10x data this is the
    # difference between 2 string shuffles and 1 (measured 36s -> ~12s).
    five = (
        "CASE WHEN size(w) >= 5 THEN array_distinct(transform(sequence(1, size(w) - 4), "
        "i -> concat_ws(' ', w[i-1], w[i], w[i+1], w[i+2], w[i+3]))) "
        "ELSE array() END"
    )
    grams = (
        t(spark, sf, "documents")
        .select(F.split("text", " ").alias("w"))
        .select(F.explode(F.expr(five)).alias("g"))
    )
    return (
        grams.groupBy(F.col("g").alias("gram"))
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= _BP_MIN_DOCS)
        .orderBy(F.desc("n_docs"), "gram")
    )


# --------------------------------------------------------------------------
# q81 — join-key skew diagnostic: heavy-hitter report for a join column
# (frequency + share of total). This is the report you run BEFORE a big
# join to decide between plain shuffle, broadcast, salting
# (operators/skew.py), or AQE skew-join. Exact top-k via count + window.
# --------------------------------------------------------------------------

_SKEW_TOP = 20


@query(
    "q81_skew_report",
    oracle=f"""
    WITH freq AS (
      SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys FROM freq)
    SELECT key, n, CAST(n AS DOUBLE) / total AS share,
           CAST(n AS DOUBLE) * n_keys / total AS skew_factor
    FROM freq, tot
    ORDER BY n DESC, key LIMIT {_SKEW_TOP}
    """,
    category="training",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    freq = (
        t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").alias("n"))
    )
    tot = freq.agg(
        F.sum("n").cast("long").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (F.col("n").cast("double") * F.col("n_keys") / F.col("total")).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.desc("n"), "key")
        .limit(_SKEW_TOP)
    )


# --------------------------------------------------------------------------
# q82 — benchmark decontamination: drop training docs that share any
# 4-gram with the held-out eval set (the GPT-3-style n-gram overlap
# rule; production uses 8-13-grams — on this small-vocabulary synthetic
# corpus 4 gives the same mixed kept/dropped shape). Scale shape: eval sets are tiny, so their distinct n-grams
# BROADCAST and contamination is a map-side semi-join probe — the
# training corpus never shuffles. Report kept/dropped per source.
# --------------------------------------------------------------------------

_EVAL_MAX_DOC = 25  # docs below this id act as the held-out benchmark


@query(
    "q82_decontamination",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(generate_series(1, len(w) - 3),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS g
      FROM w
    ),
    eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id < {_EVAL_MAX_DOC}),
    contaminated AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE doc_id >= {_EVAL_MAX_DOC} AND g IN (SELECT g FROM eval_grams)
    )
    SELECT d.source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    WHERE d.doc_id >= {_EVAL_MAX_DOC}
    GROUP BY d.source ORDER BY d.source
    """,
    category="training",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    four = (
        "CASE WHEN size(w) >= 4 THEN array_distinct(transform(sequence(1, size(w) - 3), "
        "i -> concat_ws(' ', w[i-1], w[i], w[i+1], w[i+2]))) "
        "ELSE array() END"
    )
    grams = (
        t(spark, sf, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .select("doc_id", "source", F.explode(F.expr(four)).alias("g"))
    )
    eval_grams = (
        grams.filter(F.col("doc_id") < _EVAL_MAX_DOC).select("g").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") >= _EVAL_MAX_DOC)
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    train = t(spark, sf, "documents").filter(F.col("doc_id") >= _EVAL_MAX_DOC)
    flagged = train.join(
        F.broadcast(contaminated.withColumn("_hit", F.lit(1))), "doc_id", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )
