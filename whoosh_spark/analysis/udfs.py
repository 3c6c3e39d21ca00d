"""Vectorized (Arrow-batched) analysis UDFs for the Spark build/query paths.

The hot path transfers whole Arrow batches between JVM and Python
(``pandas_udf``), loops documents inside the batch with the SAME CPython
function the oracle uses (``analysis.analyzers.analyze_text``), and returns
struct-of-arrays columns.  No per-row Spark↔Python roundtrip (input_hint:
"vectorized pandas/Arrow UDFs, no per-row Python").

Everything downstream of this UDF (explode, groupBy, joins, scoring) is pure
JVM / whole-stage-codegen DataFrame ops.
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whoosh_spark.analysis.analyzers import analyze_text
from whoosh_spark.config import BYTE_TO_LENGTH, LENGTH_BOUNDARIES

_ANALYZE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


@F.pandas_udf(_ANALYZE_SCHEMA)
def analyze_udf(texts: pd.Series) -> pd.DataFrame:
    """text → struct(tokens array<string>, positions array<int>).

    Positions keep stop-filter gaps (see analyzers.py).
    """
    toks: list[list[str]] = []
    poss: list[list[int]] = []
    for t in texts:
        tk, ps = analyze_text(t if isinstance(t, str) else "")
        toks.append(tk)
        poss.append(ps)
    return pd.DataFrame({"tokens": toks, "positions": poss})


# numpy views of the shared quantization table (config.py) for vectorized use.
_BOUNDS = np.asarray(LENGTH_BOUNDARIES, dtype=np.int64)
_B2L = np.asarray(BYTE_TO_LENGTH, dtype=np.int64)


@F.pandas_udf(T.IntegerType())
def quantize_len_udf(raw: pd.Series) -> pd.Series:
    """Raw token count → byte-quantized length (vectorized searchsorted)."""
    n = raw.fillna(0).to_numpy(dtype=np.int64)
    codes = np.searchsorted(_BOUNDS, n, side="right")
    return pd.Series(_B2L[codes].astype(np.int32))


def quantize_length_py(n: int) -> int:
    """Driver-side helper mirroring quantize_len_udf exactly."""
    return int(_B2L[bisect.bisect_right(LENGTH_BOUNDARIES, int(n))])
