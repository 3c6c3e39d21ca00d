from whoosh_spark.analysis.analyzers import analyze_text, tokenize_raw
from whoosh_spark.analysis.udfs import analyze_udf

__all__ = ["analyze_text", "tokenize_raw", "analyze_udf"]
