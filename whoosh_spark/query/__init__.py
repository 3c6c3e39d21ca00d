from whoosh_spark.query.ast import (
    And,
    Constant,
    AndMaybe,
    AndNot,
    DisMax,
    Every,
    Filter,
    Fuzzy,
    Not,
    NullQuery,
    NumericRange,
    Or,
    Otherwise,
    Phrase,
    Prefix,
    Query,
    Require,
    Sequence,
    Term,
    TermRange,
    Wildcard,
)
from whoosh_spark.query.parser import parse_query

__all__ = [
    "And", "Constant", "Otherwise", "AndMaybe", "AndNot", "DisMax", "Every", "Filter", "Fuzzy", "Not",
    "NullQuery", "NumericRange", "Or", "Phrase", "Prefix", "Query", "Require",
    "Sequence", "Term", "TermRange", "Wildcard", "parse_query",
]
