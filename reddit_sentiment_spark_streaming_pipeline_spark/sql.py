"""The SQL entry point (S7 made real).

The reference registered temp views (`createOrReplaceTempView`,
reddit_consumer.py:292,311) but never issued a single SQL query against
them. Here the views are first-class: every fixture table registers under
its name, and engine queries can be written as plain `spark.sql` text —
the same surface the DuckDB oracle uses, so SQL-mode queries share their
oracle string almost verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from reddit_sentiment_spark_streaming_pipeline_spark.registry import register
from reddit_sentiment_spark_streaming_pipeline_spark.sources import load_table
from reddit_sentiment_spark_streaming_pipeline_spark.sources.tables import TABLES


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# One SQL text, two engines: Spark executes it via spark.sql over the temp
# views; DuckDB executes it as the oracle over the same parquet.
_SQL_SURFACE_QUERY = """
    SELECT o.o_orderpriority                  AS priority,
           count(*)                           AS n_orders,
           round(avg(o.o_totalprice), 6)      AS avg_price,
           round(max(o.o_totalprice), 6)      AS max_price
    FROM orders o
    WHERE o.o_orderstatus <> 'F'
    GROUP BY o.o_orderpriority
    ORDER BY priority
"""


@register(
    "sql_surface_order_priorities",
    oracle=_SQL_SURFACE_QUERY,
    doc="S7 made real: the engine's spark.sql surface — the registered "
    "query IS the oracle string, executed over temp views by Spark and "
    "over parquet by DuckDB",
)
def sql_surface_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE_QUERY)
