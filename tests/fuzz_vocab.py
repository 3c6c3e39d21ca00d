"""Shared fuzz vocabulary for the rank-identity suites and the manual
campaign harness (single source of truth — keep the generators' term space
in ONE place so the suites can't drift apart).

The terms mirror the sf0.001 documents vocabulary (FIXTURES.md) plus terms
absent from the corpus and a stopword, so expansions (Prefix/Wildcard/
Fuzzy/TermRange), NullQuery propagation, and stop-gap phrase semantics all
get exercised.
"""

from __future__ import annotations

VOCAB = ["data", "query", "vector", "window", "hash", "join", "big",
         "table", "scan", "sort", "filter", "merge", "stream", "order",
         "line", "column", "key", "batch", "fast", "slow", "small",
         "zzz_missing", "qqq_absent", "the"]

# skewed toward 1.0 so most children stay batchable, with real boosts mixed in
BOOSTS = [0.5, 1.0, 1.0, 1.0, 2.0, 3.0]

PREFIXES = ["da", "qu", "ve", "zz", "s"]
WILDCARDS = ["d*a", "s??t", "*dow", "q*", "*a*"]
FUZZIES = ["dat", "vectr", "joim", "zzzz"]
