from whoosh_spark.oracle.engine import PyIndex

__all__ = ["PyIndex"]
