from hemera_indexer_spark.streaming.controller import StreamController

__all__ = ["StreamController"]
