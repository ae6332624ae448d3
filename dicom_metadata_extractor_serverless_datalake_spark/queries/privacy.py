"""Round-6 batch 5: privacy-risk analytics (q214-q215).

The measurement side of the lake's compliance story: the
de-identification export (`dicom/deid.py`, PS3.15-shaped — the
reference's domain is a DICOM metadata lake,
/root/reference/README.md) and the right-to-erasure purge remove
direct identifiers, but re-identification risk lives in the
QUASI-identifiers that survive. These two queries are the standard
audits a privacy office runs over an exported table:

- q214 is the k-anonymity audit: partition the table into equivalence
  classes over the quasi-identifier tuple (nation, market segment,
  account-balance band) and report the class-size histogram with
  at-risk accounting — every record in a class smaller than k = 5 is
  re-identifiable by linking those three attributes.
- q215 is the l-diversity audit (Machanavalli et al.): within each
  equivalence class, how many DISTINCT values of a sensitive
  attribute (the customer's order priority mix) appear — a class can
  be k-anonymous yet leak the sensitive value when everyone in it
  shares one (l = 1 is a homogeneity attack).

Both are pure count shapes. Corpus exactness conventions: the balance
band comes from the exact cents cast (half-away-from-zero in both
engines) so banding can't straddle engines; shares are floored micros.

100 TB shape: q214 is one QI-keyed count aggregate (map-side partial)
followed by a class-size-domain histogram — two keyed exchanges, the
second dimension-sized. q215 adds one equi-join from the fact
(orders) to the QI table before a (QI, sensitive)-keyed count — the
join key is the entity id, the standard fact-dimension shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import query, t

# account balance banded to 1000-currency-unit buckets via exact cents
_BAL_BAND = "CAST(CAST(c_acctbal AS DECIMAL(28,2)) * 100 AS BIGINT) div 100000"
_BAL_BAND_DUCK = "CAST(CAST(c_acctbal AS DECIMAL(28,2)) * 100 AS BIGINT) // 100000"
_K = 5


@query(
    "q214_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment, {_BAL_BAND_DUCK} AS bal_band,
             count(*) AS class_size
      FROM customer GROUP BY 1, 2, 3
    ),
    tot AS (SELECT CAST(sum(class_size) AS BIGINT) AS n FROM qi)
    SELECT class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_records,
           class_size < {_K} AS at_risk,
           CAST(floor(1000000.0 * (CAST(sum(class_size) AS DOUBLE)
                / CAST(n AS DOUBLE))) AS BIGINT) AS share_micros
    FROM qi CROSS JOIN tot
    GROUP BY class_size, at_risk, n
    ORDER BY class_size
    """,
    category="privacy",
    doc="k-anonymity class-size histogram over quasi-identifiers",
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    qi = (
        t(spark, sf, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.expr(_BAL_BAND).alias("bal_band"),
        )
        .agg(F.count("*").alias("class_size"))
    )
    tot = qi.agg(F.sum("class_size").alias("n"))
    return (
        qi.crossJoin(F.broadcast(tot))
        .groupBy("class_size", (F.col("class_size") < _K).alias("at_risk"), "n")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("class_size").alias("n_records"),
        )
        .select(
            "class_size",
            "n_classes",
            "n_records",
            "at_risk",
            F.expr(
                "CAST(floor(1000000.0 * (CAST(n_records AS DOUBLE)"
                " / CAST(n AS DOUBLE))) AS BIGINT)"
            ).alias("share_micros"),
        )
        .orderBy("class_size")
    )


@query(
    "q215_l_diversity",
    oracle=f"""
    WITH qi AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             {_BAL_BAND_DUCK} AS bal_band
      FROM customer
    ),
    joined AS (
      SELECT qi.c_nationkey, qi.c_mktsegment, qi.bal_band,
             o.o_orderpriority AS sens
      FROM qi JOIN orders o ON o.o_custkey = qi.c_custkey
    ),
    cls AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(count(DISTINCT sens) AS BIGINT) AS l,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM joined GROUP BY 1, 2, 3
    )
    SELECT l,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(n_rows) AS BIGINT) AS n_records,
           l = 1 AS homogeneous
    FROM cls GROUP BY l ORDER BY l
    """,
    category="privacy",
    doc="l-diversity histogram of a sensitive attribute within QI classes",
)
def q215(spark: SparkSession, sf: str) -> DataFrame:
    qi = t(spark, sf, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.expr(_BAL_BAND).alias("bal_band"),
    )
    joined = (
        t(spark, sf, "orders")
        .select(F.col("o_custkey").alias("c_custkey"), F.col("o_orderpriority").alias("sens"))
        .join(qi, "c_custkey")
    )
    cls = joined.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.countDistinct("sens").alias("l"), F.count("*").alias("n_rows")
    )
    return (
        cls.groupBy("l")
        .agg(F.count("*").alias("n_classes"), F.sum("n_rows").alias("n_records"))
        .select("l", "n_classes", "n_records", (F.col("l") == 1).alias("homogeneous"))
        .orderBy("l")
    )
