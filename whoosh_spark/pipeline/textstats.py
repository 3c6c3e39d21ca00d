"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All hot paths are JVM column expressions (regexp / array ops inside
whole-stage codegen); the winnowing fingerprint — inherently sequential per
doc — is an Arrow-batched pandas UDF with vectorized numpy rolling hashes.
Every SQL-expressible op has a DuckDB twin in oracle/sql.py built from the
same constants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from whoosh_spark.config import TOKEN_PATTERN_RE2

# BPE-ish word/number/punct splitter (GPT-2 style, simplified, RE2-safe —
# identical pattern string runs in Spark (Java regex) and DuckDB (RE2)).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

# tiny per-language stopword profiles for the n-gram/stopword-hit heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "as"),
    "fr": ("le", "la", "les", "de", "des", "et", "un", "une", "est", "que"),
    "es": ("el", "la", "los", "de", "y", "que", "un", "una", "es", "en"),
    "de": ("der", "die", "das", "und", "von", "zu", "mit", "ist", "den", "ein"),
    "it": ("il", "di", "che", "della", "per", "con", "sono", "non", "del", "gli"),
    "pt": ("os", "das", "não", "uma", "para", "com", "por", "mais", "como", "dos"),
    "nl": ("het", "een", "van", "ik", "dat", "op", "zijn", "niet", "aan", "ook"),
    "ru": ("и", "в", "не", "на", "что", "он", "как", "это", "по", "его"),
}

# word shape for the profile hit-rate: Latin (incl. Latin-1 letters) or
# Cyrillic runs — same literal class in Spark (Java regex) and DuckDB (RE2)
LANG_WORD_RE = "[a-zà-ÿа-яё]+"

# CJK script ranges (identical \x{...} syntax in Java regex and RE2):
# Hangul syllables → ko; Hiragana/Katakana → ja; Han alone → zh (Kanji-only
# Japanese is genuinely ambiguous without kana — Han defaults to zh)
HANGUL_RE = r"[\x{AC00}-\x{D7AF}]"
KANA_RE = r"[\x{3040}-\x{30FF}]"
HAN_RE = r"[\x{4E00}-\x{9FFF}]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws, n_word, n_bpeish): whitespace tokens, analyzer-regex
    words, BPE-ish pieces — all regexp counts in codegen."""
    t = F.col(text_col)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.split(F.trim(t), " ")).alias("n_ws"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_PATTERN_RE2), F.lit(0))).alias("n_word"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0))).alias("n_bpeish"),
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals + a deterministic composite score in [0, 1].

    Signals follow the usual web-text filters (Gopher/C4-style rules):
    length, mean word length, punctuation density, stopword ratio.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.regexp_extract_all(t, F.lit(TOKEN_PATTERN_RE2), F.lit(0))
    n_words = F.size(words)
    mean_wlen = F.when(n_words > 0,
                       F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
                       .cast("double") / n_words).otherwise(0.0)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    en_stops = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(en_stops, F.lower(w))))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double") / n_words).otherwise(0.0)
    score = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.1
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score): stopword-profile hit-rate heuristic
    + CJK script detection.  Pure column expressions; argmax via
    sort_array over (score, lang) structs (deterministic tie-break: the
    lexicographically LARGEST lang among equals — fixed rule both engines).

    Script precedence for CJK text: Hangul → ko, else Kana → ja, else
    Han → zh; Kanji-only Japanese therefore labels zh (ambiguous without
    kana — documented, mirrored in the oracle).
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(LANG_WORD_RE), F.lit(0))
    n_words = F.size(words)
    scores = []
    for lang, profile in sorted(LANG_PROFILES.items()):
        arr = F.array(*[F.lit(w) for w in profile])
        hits = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
        scores.append(
            F.struct(
                F.when(n_words > 0, F.round(hits.cast("double") / n_words, 6))
                .otherwise(0.0).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.sort_array(F.array(*scores), asc=False)[0]
    n_chars = F.length(F.col(text_col))

    def _ratio(pattern: str):
        n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)))
        return F.when(n_chars > 0, n.cast("double") / n_chars).otherwise(0.0)

    hangul, kana, han = _ratio(HANGUL_RE), _ratio(KANA_RE), _ratio(HAN_RE)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(hangul > 0.05, F.lit("ko"))
        .when(kana > 0.02, F.lit("ja"))
        .when(han > 0.05, F.lit("zh"))
        .otherwise(best["lang"]).alias("lang_pred"),
        F.when(hangul > 0.05, F.round(hangul, 6))
        .when(kana > 0.02, F.round(kana + han, 6))
        .when(han > 0.05, F.round(han, 6))
        .otherwise(best["score"]).alias("lang_score"),
    )


def content_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp): md5 over the normalized (lowercased, space-joined
    analyzer-regex) token stream — whitespace/case-insensitive exact dedup key."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN_RE2), F.lit(0))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat_ws(" ", words)).alias("fp"),
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling hash) — pandas UDF (sequential per doc)
# ---------------------------------------------------------------------------

_WINNOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fingerprints", T.ArrayType(T.LongType())),
    ]
)

import re as _re

# RE2's '\s' is exactly [\t\n\f\r ] — see winnow tokenization note below
_WS_RE2 = _re.compile(r"[\t\n\f\r ]+")

_B = np.uint64(1_000_003)        # polynomial base (< 2^20)
_M = np.uint64(1 << 31)          # modulus: kg < 2^31 ⇒ kg*B + h < 2^51, no
                                 # uint64 overflow, BIGINT-safe in any engine
_MASK31 = np.uint64((1 << 31) - 1)


def _tok_hash28(t: str) -> int:
    """28-bit token hash: first 7 hex chars of md5 — engine-portable
    (DuckDB: ``('0x' || substr(md5(t),1,7))::BIGINT``), PYTHONHASHSEED-free."""
    import hashlib

    return int(hashlib.md5(t.encode("utf-8")).hexdigest()[:7], 16)


def _winnow_batch(k: int, w: int):
    def fn(batches):
        for pdf in batches:
            out_ids, out_fps = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                # split on the RE2 '\s' class [\t\n\f\r ] exactly — Python
                # str.split() also breaks on Unicode whitespace (NBSP,
                # U+2028, …) and would diverge from the DuckDB oracle's
                # regexp_split_to_array(text, '\s+') on real web text
                toks = [t for t in
                        _WS_RE2.split((text or "").lower()) if t]
                h = np.array([_tok_hash28(t) for t in toks], dtype=np.uint64)
                if h.size < k:
                    out_ids.append(int(did)); out_fps.append([])
                    continue
                # k-gram rolling (polynomial) hash mod 2^31, Horner form —
                # every intermediate stays < 2^51 so the arithmetic is exact
                # and identical to the SQL oracle's BIGINT math
                n = h.size - k + 1
                kg = np.zeros(n, dtype=np.uint64)
                for j in range(k):
                    kg = (kg * _B + h[j:j + n]) & _MASK31
                # winnowing: min hash of each w-window of k-gram hashes
                if kg.size <= w:
                    fps = np.array([kg.min()])
                else:
                    win = np.lib.stride_tricks.sliding_window_view(kg, w)
                    fps = np.unique(win.min(axis=1))
                out_ids.append(int(did))
                out_fps.append([int(x) for x in fps])
            yield pd.DataFrame({"doc_id": out_ids, "fingerprints": out_fps})
    return fn


def winnow_fingerprints(docs: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text") -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): per-doc selected minima of
    rolling k-gram hashes — robust partial-overlap fingerprints.

    Deterministic across engines/sessions (md5-prefix token hash, exact
    mod-2^31 polynomial) — has a full value oracle in DuckDB."""
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col(text_col).alias("text"))
    return src.mapInPandas(_winnow_batch(k, w), schema=_WINNOW_SCHEMA)


# ---------------------------------------------------------------------------
# repetition features (Gopher-style dup-ngram signals)
# ---------------------------------------------------------------------------

def _dup_stats(arr):
    """(total, duplicated_total, max_count) over an array column, computed
    from the SORTED array with neighbor tests + a run-length fold — all
    whole-stage-codegen expressions, no explode/shuffle/join."""
    s = F.sort_array(arr)
    n = F.size(s)
    # element i belongs to a duplicated value iff it equals a neighbor
    dup = F.when(
        n >= 2,
        F.size(F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: ((i > 0) & (F.get(s, i) == F.get(s, i - 1)))
            | ((i < n - 1) & (F.get(s, i) == F.get(s, i + 1))))),
    ).otherwise(F.lit(0))
    # longest equal-run in the sorted array == max value count
    acc0 = F.struct(F.lit(None).cast("string").alias("p"),
                    F.lit(0).alias("c"), F.lit(0).alias("b"))

    def step(acc, x):
        c = F.when(acc["p"].eqNullSafe(x), acc["c"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("p"), c.alias("c"),
                        F.greatest(acc["b"], c).alias("b"))

    max_c = F.aggregate(s, acc0, step, lambda a: a["b"])
    return n, dup, max_c


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc repetition signals (Gopher rules: fraction of duplicated
    words / bigrams, share of the single most frequent bigram).

    Counting happens INSIDE each doc's token array (sort + neighbor scan +
    run-length fold): the whole operator is a single scan-side projection in
    whole-stage codegen — zero shuffles, zero joins — so at 100 TB it is a
    pure map pass over the corpus.  Output fractions are rounded to 6 dp
    (oracle twin: ``oracle/pipeline_sql.py::repetition_sql``).
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(TOKEN_PATTERN_RE2), F.lit(0))
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       words.alias("words"))
    nw = F.size("words")
    grams = F.when(
        nw >= 2,
        F.zip_with(F.slice("words", 1, nw - 1),
                   F.slice(F.col("words"), 2, nw - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>"))
    n_w, dup_w, _ = _dup_stats(F.col("words"))
    n_g, dup_g, max_g = _dup_stats(grams)
    frac = lambda num, den: F.round(
        F.when(den > 0, num.cast("double") / den).otherwise(0.0), 6)
    return base.select(
        "doc_id",
        n_w.cast("long").alias("n_words"),
        frac(dup_w, n_w).alias("dup_word_frac"),
        frac(max_g, n_g).alias("top_bigram_frac"),
        frac(dup_g, n_g).alias("dup_bigram_frac"))


def prep_corpus(docs: DataFrame, text_col: str = "text",
                lang: str = "en", min_quality: float = 0.5) -> DataFrame:
    """(doc_id, quality): the composed training-data prep gate — language
    filter + quality threshold + exact (fingerprint) dedup keeping the
    smallest doc_id.  One pass of scan-side feature columns plus a single
    fingerprint groupBy; the shape every corpus-prep job starts from."""
    q = quality_features(docs, text_col).select("doc_id", "quality")
    l = lang_id(docs, text_col).select("doc_id", "lang_pred")
    # gate FIRST, dedup second: if the survivor (min doc_id) of a
    # fingerprint cluster were picked before the lang/quality gates, a
    # cluster whose min-id member fails a gate would lose EVERY member —
    # including ones that pass.  Gated docs also shrink the dedup shuffle.
    gated = (q.join(l, "doc_id")
             .where((F.col("lang_pred") == lang)
                    & (F.col("quality") >= min_quality)))
    f = content_fingerprint(docs, text_col).join(
        gated.select("doc_id"), "doc_id", "left_semi")
    firsts = f.groupBy("fp").agg(F.min("doc_id").alias("_first"))
    keep = (f.join(firsts, "fp")
            .where(F.col("doc_id") == F.col("_first"))
            .select("doc_id"))
    return (gated.join(keep, "doc_id", "left_semi")
            .select("doc_id", "quality"))
