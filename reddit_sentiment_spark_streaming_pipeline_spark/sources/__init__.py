from reddit_sentiment_spark_streaming_pipeline_spark.sources.tables import (
    from_pandas,
    from_rows,
    load_table,
    table_path,
)

__all__ = ["from_pandas", "from_rows", "load_table", "table_path"]
