from reddit_sentiment_spark_streaming_pipeline_spark.sources.tables import load_table, table_path

__all__ = ["load_table", "table_path"]
