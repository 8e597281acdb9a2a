from itext2kg_spark.streaming.incremental import incremental_kg_stream

__all__ = ["incremental_kg_stream"]
