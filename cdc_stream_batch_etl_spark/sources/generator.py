"""Seeded synthetic-workload generator mirroring the reference's Faker
generator value distributions (/root/reference/python/data_generator.py:
21-43, 71-102: 25% customers / 25% products / 50% orders with 1-5 items,
qty 1-3, unit price 10-200, price 5-999.99, stock 0-1000, 4 statuses,
6 categories) — S10 insert workload + J5 FK-sampling, implemented as pure
DataFrame expressions (rand(seed), no Faker/Python loop: the generator
itself must scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATEGORIES = ("Electronics", "Clothing", "Books", "Home & Garden", "Sports", "Toys")
STATUSES = ("pending", "processing", "shipped", "delivered")


def _pick(col, options: tuple[str, ...]):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (col * len(options)).cast("int") + 1)


def generate_customers(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    df = spark.range(1, n + 1).withColumnRenamed("id", "id")
    r = F.rand(seed)
    return df.select(
        "id",
        F.concat(F.lit("first_"), F.col("id")).alias("first_name"),
        F.concat(F.lit("last_"), F.col("id")).alias("last_name"),
        F.concat(F.lit("user"), F.col("id"), F.lit("@example.com")).alias("email"),
        F.substring(F.concat(F.lit("+1-555-"), (r * 1e10).cast("long")), 1, 20).alias("phone"),
        F.concat(F.lit("addr_"), F.col("id")).alias("address"),
        F.concat(F.lit("city_"), (F.rand(seed + 1) * 100).cast("int")).alias("city"),
        _pick(F.rand(seed + 2), ("CA", "NY", "TX", "WA", "FL")).alias("state"),
        F.lpad(((F.rand(seed + 3) * 99999).cast("int")).cast("string"), 5, "0").alias("zip_code"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.rand(seed + 4) * 86400 * 30).cast("long")
        ).alias("created_at"),
    ).withColumn("updated_at", F.col("created_at"))


def generate_products(spark: SparkSession, n: int, seed: int = 43) -> DataFrame:
    df = spark.range(1, n + 1)
    return df.select(
        "id",
        F.concat(F.lit("product_"), F.col("id")).alias("name"),
        F.concat(F.lit("description of product "), F.col("id")).alias("description"),
        F.round(F.lit(5.0) + F.rand(seed) * (999.99 - 5.0), 2).cast("decimal(10,2)").alias("price"),
        _pick(F.rand(seed + 1), CATEGORIES).alias("category"),
        (F.rand(seed + 2) * 1001).cast("int").alias("stock_quantity"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.rand(seed + 3) * 86400 * 30).cast("long")
        ).alias("created_at"),
    ).withColumn("updated_at", F.col("created_at"))


def generate_orders(
    spark: SparkSession, n: int, n_customers: int, n_products: int, seed: int = 44
) -> tuple[DataFrame, DataFrame]:
    """Orders + order_items with FK sampling (J5): customer_id/product_id
    uniform over existing ids, 1-5 items/order, qty 1-3, unit price
    10-200; total_amount = Σ qty×unit_price (data_generator.py:71-102)."""
    orders_base = spark.range(1, n + 1).select(
        F.col("id").alias("order_id"),
        (F.rand(seed) * n_customers).cast("long").alias("customer_id_0"),
        (F.rand(seed + 1) * 5).cast("int").alias("n_items_0"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.rand(seed + 2) * 86400 * 30).cast("long")
        ).alias("order_date"),
        _pick(F.rand(seed + 3), STATUSES).alias("status"),
    ).select(
        "order_id",
        (F.col("customer_id_0") + 1).alias("customer_id"),
        (F.col("n_items_0") + 1).alias("n_items"),
        "order_date",
        "status",
    )

    items = (
        orders_base.select(
            "order_id",
            "order_date",
            F.explode(F.sequence(F.lit(1), F.col("n_items"))).alias("line_no"),
        )
        .withColumn("product_id", (F.rand(seed + 4) * n_products).cast("long") + 1)
        .withColumn("quantity", (F.rand(seed + 5) * 3).cast("int") + 1)
        .withColumn(
            "unit_price",
            F.round(F.lit(10.0) + F.rand(seed + 6) * 190.0, 2).cast("decimal(10,2)"),
        )
        .select(
            (F.col("order_id") * 100 + F.col("line_no")).alias("id"),
            "order_id",
            "product_id",
            "quantity",
            "unit_price",
            F.col("order_date").alias("created_at"),
        )
    )

    totals = items.groupBy("order_id").agg(
        F.sum(F.col("quantity") * F.col("unit_price")).cast("decimal(10,2)").alias("total_amount")
    )
    orders = (
        orders_base.join(totals, "order_id")
        .select(
            F.col("order_id").alias("id"),
            "customer_id",
            "order_date",
            "total_amount",
            "status",
            F.concat(F.lit("ship_addr_"), F.col("order_id")).alias("shipping_address"),
            F.col("order_date").alias("created_at"),
            F.col("order_date").alias("updated_at"),
        )
    )
    return orders, items
