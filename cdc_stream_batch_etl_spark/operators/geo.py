"""Geo / category distributions and the bitwise region-mask filter.

Reference semantics:
- A19 per-state customer distribution  (stream_processor.py:147-152)
- A20 per-category product distribution (stream_processor.py:174-179)
- F7/C18 bitwise region mask: region → bit, process region iff bit set,
  count set bits (cdc_etl_orchestration.py:258-281, README.md:185-196)

Geo stand-in per FIXTURES §3: state↔nation (via c_nationkey), plus a region
rollup through the nation→region snowflake. Dimension joins are broadcast —
the fact side never shuffles for enrichment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import dsum
from ..registry import register

_GEO_DIST_ORACLE = """
SELECT n.n_name AS nation,
       count(*) AS customer_count,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""


@register("geo_distribution", oracle=_GEO_DIST_ORACLE)
def geo_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("customer_count"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


_CATEGORY_ORACLE = """
SELECT p_type AS category,
       count(*) AS product_count,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_retail,
       min(p_retailprice) AS min_price,
       max(p_retailprice) AS max_price
FROM part
GROUP BY 1
"""


@register("category_distribution", oracle=_CATEGORY_ORACLE)
def category_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy(F.col("p_type").alias("category")).agg(
        F.count("*").alias("product_count"),
        dsum("p_retailprice").alias("total_retail"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


_REGION_ROLLUP_ORACLE = """
SELECT r.r_name AS region,
       count(*) AS customer_count,
       count(DISTINCT n.n_nationkey) AS nation_count,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""


@register("region_rollup", oracle=_REGION_ROLLUP_ORACLE)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level snowflake rollup through broadcast dims (the reference's
    geo fan-out `.partial().expand()` over regions, cdc_etl_orchestration.py:
    348-350, collapsed into one grouped aggregate)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("customer_count"),
            F.countDistinct("n_nationkey").alias("nation_count"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# north(0)=0b00001, ... the reference maps 4 named regions to bits
# (cdc_etl_orchestration.py:258-262); here bit = r_regionkey. Default mask
# 0b01011 selects regions 0, 1, 3.
REGION_MASK = 0b01011

_BITWISE_ORACLE = f"""
SELECT n.n_nationkey, n.n_name, r.r_name AS region,
       (1 << r.r_regionkey) AS region_bit,
       CAST(bit_count({REGION_MASK}) AS INTEGER) AS mask_bits
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE ((1 << r.r_regionkey) & {REGION_MASK}) > 0
"""


@register("bitwise_region_filter", oracle=_BITWISE_ORACLE)
def bitwise_region_filter(spark: SparkSession, sf_dir: str, mask: int = REGION_MASK) -> DataFrame:
    """F7 + C18: region→bit mapping, OR-accumulated mask, bit-set filter and
    set-bit count (cdc_etl_orchestration.py:258-281)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    region_bit = F.expr("shiftleft(1, r_regionkey)").alias("region_bit")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "n_nationkey",
            "n_name",
            F.col("r_name").alias("region"),
            region_bit,
            F.bit_count(F.lit(mask)).alias("mask_bits"),
        )
        .filter((F.col("region_bit").bitwiseAND(F.lit(mask))) > 0)
    )


_SUPPLIER_ROLLUP_ORACLE = """
SELECT n.n_name,
       count(*) AS supplier_count,
       CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
       (max(struct_pack(a := s.s_acctbal, n := s.s_name))).n AS top_supplier
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
"""


@register("supplier_rollup", oracle=_SUPPLIER_ROLLUP_ORACLE)
def supplier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier rollup (J1-shape dim join + A13-shape counts +
    A22 deterministic argmax: max acctbal, name as tiebreak). Nation is a
    25-row broadcast; one hash-agg shuffle on n_name."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("supplier_count"),
            dsum("s_acctbal").alias("total_acctbal"),
            F.max(F.struct(F.col("s_acctbal").alias("a"), F.col("s_name").alias("n")))["n"]
            .alias("top_supplier"),
        )
    )
