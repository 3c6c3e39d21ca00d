"""Engine-wide constants shared by the Spark engine, the pure-Python oracle,
and the DuckDB oracle-SQL generator.

Semantics follow the public Whoosh 2.7.x line (see SURVEY.md §2.2/§2.3/§2.6;
reference paths cited there, e.g. ``src/whoosh/analysis/filters.py::STOP_WORDS``
and ``src/whoosh/scoring.py::BM25F``). The reference checkout at
/root/reference was empty, so these constants ARE the contract: every
component (Spark build, query engine, pytest oracle, DuckDB SQL) derives from
this single module so they can never drift apart.
"""

from __future__ import annotations

import math
import os

# ---------------------------------------------------------------------------
# Analysis chain (StandardAnalyzer = RegexTokenizer | Lowercase | Stop)
# ---------------------------------------------------------------------------

# Whoosh default_pattern: src/whoosh/analysis/tokenizers.py (≈L35)
TOKEN_PATTERN = r"\w+(\.?\w+)*"
# RE2 (DuckDB) cannot express backrefs but this pattern is RE2-safe once the
# group is non-capturing; group 0 (the full match) is what we extract.
TOKEN_PATTERN_RE2 = r"\w+(?:\.?\w+)*"
# Unicode twin for the INDEX oracles: RE2/Java \w is ASCII-only, while the
# index analyzer runs CPython re.UNICODE — [\p{L}\p{N}_] reproduces
# CPython \w for the corpus character set (verified vs analyze_text on the
# generator's non-ASCII vocabulary).  Pipeline ops keep the ASCII pattern on
# BOTH sides (their Spark twin is Java regex, also ASCII) — self-consistent.
TOKEN_PATTERN_RE2_UNI = r"[\p{L}\p{N}_]+(?:\.?[\p{L}\p{N}_]+)*"

# src/whoosh/analysis/filters.py::STOP_WORDS (≈L40) — includes the infamous
# "tbd"; minsize=2 drops single-character tokens.
STOP_WORDS = frozenset(
    """a an and are as at be by can for from have if in is it may not of on
    or tbd that the this to us we when will with yet you your""".split()
)
MIN_WORD_SIZE = 2

# ---------------------------------------------------------------------------
# Scoring (BM25F defaults — src/whoosh/scoring.py::BM25F ≈L140)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75

# ---------------------------------------------------------------------------
# Posting blocks (src/whoosh/codec/whoosh3.py::W3PostingsWriter ≈L520)
# ---------------------------------------------------------------------------

BLOCK_SIZE = 128  # max postings per encoded block

# Block carve order within a (field, term, doc-bucket) group:
#   "impact" (default) — postings ordered by (tf desc, dl asc) before
#     carving, ids re-sorted per block for delta coding.  Block
#     (max_weight, min_len) bounds then decline monotonically across the
#     group and are TIGHT (each block is near-homogeneous in tf and dl),
#     so block-max WAND actually drops the low-impact tail of hot terms —
#     with doc-ordered carving the bounds are near-uniform and the
#     survivor predicate keeps ~everything (measured survivor_frac 1.00
#     for the hottest term at 10M docs).  Impact-ordered postings lists
#     are the published fix (Persin/Zobel/Sacks-Davis JASIS 1996 §4;
#     Anh&Moffat SIGIR 2006 impact-sorted indexes).
#   "docid" — classic doc-ordered carving; every block covers a narrow
#     contiguous id range, which tightens block-range pruning for
#     doc-point lookups (key_terms/more_like) at the cost of inert WAND
#     bounds.  Queries never depend on the layout for correctness: decode
#     is order-agnostic and all bounds stay valid upper bounds.
BLOCK_LAYOUT = os.environ.get("WHOOSH_BLOCK_LAYOUT", "impact")

# Phrase evaluation: when the rarest word's df is at most this cap AND
# meaningfully rarer than the hottest word (4x), its doc ids are collected
# (<= cap * 8 bytes) and broadcast INTO the Arrow block decoder, which
# drops non-candidate postings before they materialize as rows — only docs
# containing every word can match a phrase, so pruning by the rarest
# word's doc set is exact.  Saves the Python->JVM transfer and the groupBy
# exchange of the hot words' fat position arrays.  Above the cap (hot-hot
# phrases) pruning wouldn't remove much; the unpruned one-shuffle plan
# stands.
PHRASE_PRUNE_MAX_DF = 200_000
PHRASE_PRUNE_RATIO = 4  # rarest df must be <= hottest df / this

# The adjacent-pair candidate gate (k-word slop-1 phrases through the pair
# accelerator) gets its own payoff model.  Its benefit is skipping the
# FULL positional decode of k hot terms (the worst query shape); its cost
# is ONE pair-postings scan + id collect + broadcast, which round-5
# isolated measurements showed is NOT thin when the pair is frequent:
# scanning+collecting a 2.4-4.2M-row pair list cost 10-18 s cold and
# ~1-3 s page-hot (the round-4 soak's 10M "win" — 26.1 s -> 16.1 s — was a
# cache-ordering artifact: the pair blocks had just been written and were
# page-hot while the positional leg ran cold; three fresh re-measurements
# show the 24%-selective adversarial gate at parity-to-2x-SLOWER at
# 1M/10M and winning only in one warm 5M session).  A second-rarest-pair
# probe measured +16-47 s for zero candidate shrink and is gone.
# The gate therefore fires only where the win is unambiguous — a
# genuinely SELECTIVE pair (the nextword-index use case: a distinctive
# bigram inside a hot phrase), where the probe is sub-second and the
# decode collapses by orders of magnitude:
#   saved = sum_w max(0, df(w) - rarest_pair_df)    [posting rows avoided]
#   fire iff rarest_pair_df <= MAX_DF               [collect <= ~16 MB AND
#                                                    the probe scan stays
#                                                    small]
#        and rarest_pair_df <= MAX_CAND_FRAC * N    [candidates must be a
#                                                    sliver of the corpus;
#                                                    a 24%-wide set saves
#                                                    too little per probe]
#        and saved >= MIN_SAVED_ROWS                [covers the gate's
#                                                    fixed job overhead]
#        and saved >= MIN_SAVED_FRAC * sum_w df(w)  [material shrink]
# All env-tunable for other hardware/storage.
PAIR_GATE_MAX_DF = int(os.environ.get("WHOOSH_PAIR_GATE_MAX_DF", "2000000"))
PAIR_GATE_MAX_CAND_FRAC = float(os.environ.get(
    "WHOOSH_PAIR_GATE_MAX_CAND_FRAC", "0.05"))
PAIR_GATE_MIN_SAVED_ROWS = int(os.environ.get(
    "WHOOSH_PAIR_GATE_MIN_SAVED_ROWS", "5000000"))
PAIR_GATE_MIN_SAVED_FRAC = float(os.environ.get(
    "WHOOSH_PAIR_GATE_MIN_SAVED_FRAC", "0.3"))

# Deterministic doc-range bucketing: a posting-build group is
# (field, term, doc_id >> DOC_BUCKET_BITS).  Group size is bounded by the
# bucket width regardless of term hotness, which is our skew/salting strategy
# (north_rule: explicit hot-term handling), and block boundaries depend only
# on doc ids so the build is invariant under input partitioning
# (reference tests/test_mpwriter.py semantics).
#
# Width trade-off: small buckets fragment rare terms' postings into many
# underfull blocks (measured 473MB of block rows for 1M docs at 2^12 —
# metadata dominated); 2^16 keeps the hottest group ≤65536 postings (a few
# MB in a numpy kernel) while rare terms stay in one block.
DOC_BUCKET_BITS = 16  # 65536 docs per bucket

# Merge-shuffle sizing: partitions per DATA VOLUME, not per core count.
# A fixed `spark.sql.shuffle.partitions` makes per-partition sort/merge
# memory grow linearly with corpus size — external-sort spill then turns
# the merge superlinear (observed: per-doc merge cost x1.5 from 1M→10M
# docs at a pinned 40 partitions).  write_index therefore sizes the runs
# shuffle as max(conf, analyzed_bytes / MERGE_PARTITION_BYTES): at small
# corpora the core-derived conf wins (full parallelism), at large corpora
# partition count grows with data so each sort stays in memory.  On a real
# cluster executors scale with data too; this keeps the single-partition
# working set bounded either way.
MERGE_PARTITION_BYTES = 128 * 1024 * 1024

# ---------------------------------------------------------------------------
# Field-length byte quantization (src/whoosh/util/numeric.py::length_to_byte
# ≈L380).  Whoosh stores per-doc field lengths as a single byte on a log scale
# and BM25 consumes the de-quantized value.  We reproduce the *scheme*
# (log-scale byte code, max length 1486 pins byte 255) with a table
# precomputed here in pure Python so that Spark (numpy searchsorted), the
# Python oracle and DuckDB (embedded lookup) quantize identically with no
# cross-engine float-rounding hazard.
# ---------------------------------------------------------------------------

_LEN_MAX = 1486


def _length_to_byte_py(n: int) -> int:
    if n <= 0:
        return 0
    if n >= _LEN_MAX:
        return 255
    return max(1, min(255, int(round(255.0 * math.log(n) / math.log(_LEN_MAX)))))


def _byte_to_length_py(b: int) -> int:
    if b <= 0:
        return 0
    return int(round(_LEN_MAX ** (b / 255.0)))


# BYTE_TO_LENGTH[b] = de-quantized length for byte code b.
BYTE_TO_LENGTH: tuple[int, ...] = tuple(_byte_to_length_py(b) for b in range(256))

# LENGTH_BOUNDARIES[i] = smallest raw length whose byte code is >= i+1;
# quantize(n) = BYTE_TO_LENGTH[bisect_right(LENGTH_BOUNDARIES, n)].
_bytes_for_n = [_length_to_byte_py(n) for n in range(0, _LEN_MAX + 1)]
LENGTH_BOUNDARIES: tuple[int, ...] = tuple(
    next(n for n in range(1, _LEN_MAX + 1) if _bytes_for_n[n] >= b)
    for b in range(1, 256)
)
del _bytes_for_n


def length_to_byte(n: int) -> int:
    """Raw token count → byte code 0..255 (pure-Python reference)."""
    return _length_to_byte_py(int(n))


def quantize_length(n: int) -> int:
    """Raw token count → byte-quantized length as BM25 sees it."""
    return BYTE_TO_LENGTH[_length_to_byte_py(int(n))]


# ---------------------------------------------------------------------------
# Default field name for the single-text-field corpus tables.
# ---------------------------------------------------------------------------

TEXT_FIELD = "text"
