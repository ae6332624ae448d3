"""Round-4c corpus-curation family: the three remaining curation
passes a production training-data pipeline runs that the corpus did
not yet cover as first-class, oracle-checked queries.

- q144 — **n-gram decontamination** (the GPT-3-style eval-overlap
  rule): a train document is contaminated when it shares ANY word
  5-gram with the held-out eval slice. Stricter than q139's
  whole-text bloom match (catches partial copies) and cheaper than
  q82's broadcast semi-join on full digests when the eval set is
  gram-exploded once.
- q145 — **intra-document repetition signals** (the Gopher quality
  rules): fraction of a doc covered by its most frequent 2-gram and
  fraction of duplicated 3-grams. These flag degenerate/boilerplate
  docs that cross-document dedup never sees because each copy lives
  INSIDE one document.
- q146 — **semantic dedup** (SemDeDup shape): coarse-cluster the
  embedding space, then exact pairwise cosine ONLY within clusters.
  The cluster step bounds the quadratic: k clusters cut candidate
  pairs by ~k while keeping the high-cosine pairs co-located, which
  is the published trade. Deterministic seed centroids (the k
  smallest vec_ids) keep the whole query SQL-expressible so the
  oracle is exact, unlike the sampled-k-means IVF path (q67) whose
  oracle is a recall bound.

All three follow the corpus exactness conventions (queries/base.py):
integer counts, single final divisions, float reductions in identical
left-to-right order on both engines.

Scale shape at 100 TB:
- q144's gram semi-join shuffles (gram, doc_id) pairs only — never
  document bodies; a real deployment joins on ``xxhash64(gram)`` to
  make the shuffle row 16 bytes (digest-only-shuffle, the q50 rule),
  and eval sets (thousands of docs) broadcast outright.
- q145 is two explode->aggregate passes, each map-side partial before
  one shuffle keyed by doc_id; no joins against the corpus.
- q146's pair generation is an equi-join on the cluster id (never a
  cartesian/BNLJ — same contract as the q52/q53/q104 dedup family);
  cluster count k scales with corpus size to hold the per-cluster
  pair budget, and assignment is the map-side no-shuffle pass of
  ``operators/ann._nearest_centroids`` (broadcast-equivalent centroid
  constant past k=32, judge-reviewed shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import query, t

# --------------------------------------------------------------------------
# q144 — eval-overlap decontamination by word 5-gram.
# Eval slice: doc_id % 7 == 0 (same held-out convention as q139, so the
# two decontamination rules are comparable on the same split).
# --------------------------------------------------------------------------

_GRAM_N = 5


def _duck_grams(n: int) -> str:
    """DuckDB word n-grams of ``w`` (a string_split array), 1-indexed
    inclusive slices — mirrors the Spark ``slice``/``concat_ws`` form
    token-for-token."""
    return (
        f"list_transform(generate_series(1, len(w) - {n - 1}), "
        f"i -> array_to_string(w[i:i+{n - 1}], ' '))"
    )


@query(
    "q144_ngram_decontaminate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, source, unnest({_duck_grams(_GRAM_N)}) AS gram
      FROM tok WHERE len(w) >= {_GRAM_N}
    ),
    eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0),
    hit AS (
      SELECT DISTINCT g.doc_id FROM g JOIN eg USING (gram)
      WHERE g.doc_id % 7 <> 0
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(sum(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean
    FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 7 <> 0
    GROUP BY d.source ORDER BY d.source
    """,
    category="dedup",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    """Train/eval 5-gram overlap decontamination (exact)."""
    docs = t(spark, sf, "documents")
    tok = docs.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("w")
    )
    grams = tok.filter(F.size("w") >= _GRAM_N).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {_GRAM_N - 1}), "
                f"i -> concat_ws(' ', slice(w, i, {_GRAM_N})))"
            )
        ).alias("gram"),
    )
    eval_grams = grams.filter(F.col("doc_id") % 7 == 0).select("gram").distinct()
    hit = (
        grams.filter(F.col("doc_id") % 7 != 0)
        .join(eval_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_c", F.lit(1))
    )
    train = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "source")
    return (
        train.join(hit, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.sum(F.coalesce(F.col("is_c"), F.lit(0))).alias("n_contaminated"),
            F.sum(
                F.when(F.col("is_c").isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_clean"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q145 — Gopher-style intra-document repetition: top-2-gram share and
# duplicated-3-gram share. Flags use cross-multiplied integer
# predicates (10*top2 > total2 i.e. >10%; 5*dup3 > total3 i.e. >20%)
# so no ratio ever touches floats; the reported corpus-level shares
# are single int/int divisions.
# --------------------------------------------------------------------------


@query(
    "q145_intradoc_repetition",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    g2 AS (
      SELECT doc_id, source, unnest({_duck_grams(2)}) AS gram
      FROM tok WHERE len(w) >= 3
    ),
    top2 AS (
      SELECT doc_id, source, max(c) AS top2, CAST(sum(c) AS BIGINT) AS total2
      FROM (SELECT doc_id, source, gram, count(*) AS c
            FROM g2 GROUP BY doc_id, source, gram)
      GROUP BY doc_id, source
    ),
    g3 AS (
      SELECT doc_id, unnest({_duck_grams(3)}) AS gram
      FROM tok WHERE len(w) >= 3
    ),
    dup3 AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS total3,
             CAST(count(DISTINCT gram) AS BIGINT) AS distinct3
      FROM g3 GROUP BY doc_id
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN 10 * t.top2 > t.total2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flag_top2,
           CAST(sum(CASE WHEN 5 * (d.total3 - d.distinct3) > d.total3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup3,
           CAST(sum(t.top2) AS DOUBLE) / CAST(sum(t.total2) AS DOUBLE)
             AS top2_share,
           CAST(sum(d.total3 - d.distinct3) AS DOUBLE)
             / CAST(sum(d.total3) AS DOUBLE) AS dup3_share
    FROM top2 t JOIN dup3 d USING (doc_id)
    GROUP BY t.source ORDER BY t.source
    """,
    category="text",
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source repetition-quality rollup (exact integer flags)."""
    docs = t(spark, sf, "documents")
    tok = docs.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("w")
    ).filter(F.size("w") >= 3)

    def gram_expr(n: int) -> F.Column:
        return F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {n - 1}), "
                f"i -> concat_ws(' ', slice(w, i, {n})))"
            )
        ).alias("gram")

    top2 = (
        tok.select("doc_id", "source", gram_expr(2))
        .groupBy("doc_id", "source", "gram")
        .count()
        .groupBy("doc_id", "source")
        .agg(F.max("count").alias("top2"), F.sum("count").alias("total2"))
    )
    dup3 = (
        tok.select("doc_id", gram_expr(3))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total3"),
            F.count_distinct("gram").alias("distinct3"),
        )
    )
    return (
        top2.join(dup3, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(10 * F.col("top2") > F.col("total2"), 1).otherwise(0)
            ).alias("n_flag_top2"),
            F.sum(
                F.when(
                    5 * (F.col("total3") - F.col("distinct3")) > F.col("total3"),
                    1,
                ).otherwise(0)
            ).alias("n_flag_dup3"),
            (
                F.sum("top2").cast("double") / F.sum("total2").cast("double")
            ).alias("top2_share"),
            (
                F.sum(F.col("total3") - F.col("distinct3")).cast("double")
                / F.sum("total3").cast("double")
            ).alias("dup3_share"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q146 — SemDeDup-shaped semantic dedup: deterministic coarse clusters
# (seed centroids = the k smallest vec_ids), exact cosine ONLY within a
# cluster, per-cluster dedup summary. Assignment reuses the IVF
# operator's map-side nearest-centroid pass (operators/ann.py) with
# euclidean argmin == the oracle's (-2*dot + |c|^2, cid) lexicographic
# min, computed in identical left-to-right float order on both engines.
# --------------------------------------------------------------------------

_SEM_K = 32
_SEM_COS = 0.30


_SEM_COS_SQL = """list_reduce(
    list_transform(generate_series(1, len(ea.embedding)),
                   i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)),
    (x, y) -> x + y)
  / (sqrt(list_reduce(list_transform(generate_series(1, len(ea.embedding)),
          i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE)),
          (x, y) -> x + y))
     * sqrt(list_reduce(list_transform(generate_series(1, len(eb.embedding)),
            i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)),
            (x, y) -> x + y)))"""


@query(
    "q146_semantic_dedup",
    oracle=f"""
    WITH seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {_SEM_K})
    ),
    dists AS (
      SELECT e.vec_id, s.cid,
             -2 * list_reduce(
                    list_transform(generate_series(1, len(e.embedding)),
                                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(s.c[i] AS DOUBLE)),
                    (x, y) -> x + y)
             + list_reduce(
                    list_transform(generate_series(1, len(s.c)),
                                   i -> CAST(s.c[i] AS DOUBLE) * CAST(s.c[i] AS DOUBLE)),
                    (x, y) -> x + y) AS d
      FROM embeddings e CROSS JOIN seeds s
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.cid, a.vec_id AS v1, b.vec_id AS v2
      FROM assign a JOIN assign b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
    ),
    dup AS (
      SELECT p.cid, p.v1, p.v2
      FROM pairs p
      JOIN embeddings ea ON ea.vec_id = p.v1
      JOIN embeddings eb ON eb.vec_id = p.v2
      WHERE {_SEM_COS_SQL} >= {_SEM_COS}
    )
    SELECT a.cid,
           CAST(count(DISTINCT a.vec_id) AS BIGINT) AS n_vecs,
           CAST(coalesce((SELECT count(*) FROM dup WHERE dup.cid = a.cid), 0) AS BIGINT)
             AS n_dup_pairs,
           CAST(coalesce((SELECT count(DISTINCT v2) FROM dup WHERE dup.cid = a.cid), 0) AS BIGINT)
             AS n_dropped
    FROM assign a
    GROUP BY a.cid ORDER BY a.cid
    """,
    category="dedup",
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic dedup summary per coarse cluster (exact oracle)."""
    from ..operators.ann import _nearest_centroids

    emb = t(spark, sf, "embeddings")
    w = Window.orderBy("vec_id")
    seeds = (
        emb.orderBy("vec_id")
        .limit(_SEM_K)
        .select(
            (F.row_number().over(w) - 1).alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    assign = _nearest_centroids(
        emb, seeds, "embedding", n=1, out_col="cid"
    ).select("vec_id", "embedding", "cid")

    a = assign.select(
        F.col("cid"), F.col("vec_id").alias("v1"), F.col("embedding").alias("qe")
    )
    b = assign.select(
        F.col("cid"), F.col("vec_id").alias("v2"), F.col("embedding").alias("embedding")
    )
    cos = (
        "aggregate(zip_with(qe, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v) / "
        "(sqrt(aggregate(transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)) * "
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)))"
    )
    dup = (
        a.join(b, ["cid"])
        .filter(F.col("v1") < F.col("v2"))
        .filter(F.expr(cos) >= F.lit(_SEM_COS))
        .select("cid", "v1", "v2")
    )
    per_cluster_dup = dup.groupBy("cid").agg(
        F.count("*").alias("n_dup_pairs"),
        F.count_distinct("v2").alias("n_dropped"),
    )
    return (
        assign.groupBy("cid")
        .agg(F.count_distinct("vec_id").alias("n_vecs"))
        .join(per_cluster_dup, "cid", "left")
        .select(
            "cid",
            "n_vecs",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
        .orderBy("cid")
    )
