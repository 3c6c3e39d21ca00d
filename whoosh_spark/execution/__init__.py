from whoosh_spark.execution.evaluate import Evaluator

__all__ = ["Evaluator"]
