"""DuckDB oracle SQL for the training-data pipeline operators.

Each generator mirrors the corresponding whoosh_spark.pipeline dataflow with
identical tokenization rules, float64 operation shapes, and 6-dp rounding.
Hash-based ops (MinHash perms, SimHash, winnowing) use Spark's xxhash64,
which DuckDB lacks — their oracles are either the hash-free equivalent
(MinHash near-dups ≡ exact n-gram Jaccard pairs, since the LSH candidates
are exact-verified and recall at the operating point is 1−≈6e−8) or omitted
(rows-only driver check).
"""

from __future__ import annotations

from whoosh_spark.config import TOKEN_PATTERN_RE2
from whoosh_spark.pipeline.textstats import BPE_ISH_PATTERN, LANG_PROFILES


def exact_duplicates_sql() -> str:
    return """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM h GROUP BY h)
SELECT h.doc_id, g.canonical_id, g.group_size
FROM h JOIN g USING (h) WHERE g.group_size > 1
ORDER BY doc_id
"""


def _shingle_cte(n: int) -> str:
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS shingle
  FROM t, UNNEST(generate_series(1, len(toks) - {n - 1})) AS u(i)
),
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id)
"""


def ngram_jaccard_sql(n: int = 3, tau: float = 0.5) -> str:
    return f"""
WITH {_shingle_cte(n)},
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS i
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a, i.b,
       round(i.i::DOUBLE / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.a
JOIN sz sb ON sb.doc_id = i.b
WHERE i.i::DOUBLE / (sa.sz + sb.sz - i.i) >= {tau}
ORDER BY a, b
"""


# MinHash-LSH near-dups are exact-verified; the operating point (128 perms,
# 32x4 bands, tau >= 0.5) has candidate recall 1-(1-tau^4)^32 ≈ 1 — the SQL
# twin is therefore the brute-force Jaccard query itself.
minhash_near_dups_sql = ngram_jaccard_sql


def token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       len(string_split(trim(text), ' '))::INT AS n_ws,
       len(regexp_extract_all(text, '{TOKEN_PATTERN_RE2}'))::INT AS n_word,
       len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))::INT AS n_bpeish
FROM documents ORDER BY doc_id
"""


def quality_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
WITH w AS (
  SELECT doc_id, text,
         regexp_extract_all(text, '{TOKEN_PATTERN_RE2}') AS words,
         length(text) AS n_chars
  FROM documents
),
f AS (
  SELECT doc_id, n_chars, len(words) AS n_words,
         CASE WHEN len(words) > 0 THEN
           (SELECT sum(length(x)) FROM UNNEST(words) AS t(x))::DOUBLE / len(words)
         ELSE 0.0 END AS mean_wlen,
         CASE WHEN n_chars > 0 THEN
           len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE / n_chars
         ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(words) > 0 THEN
           len(list_filter(words, x -> lower(x) IN ({stops})))::DOUBLE / len(words)
         ELSE 0.0 END AS stop_ratio
  FROM w
)
SELECT doc_id, n_chars AS n_chars_m, n_words,
       round(mean_wlen, 6) AS mean_wlen,
       round(punct_ratio, 6) AS punct_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(least(n_words::DOUBLE / 100.0, 1.0) * 0.4
             + CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 10.0 THEN 0.3 ELSE 0.0 END
             + CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END
             + least(stop_ratio * 4.0, 1.0) * 0.1, 6) AS quality
FROM f ORDER BY doc_id
"""


def lang_id_sql() -> str:
    profile_rows = ", ".join(
        f"('{lang}', [{', '.join(repr(w) for w in words)}])"
        for lang, words in sorted(LANG_PROFILES.items())
    )
    return f"""
WITH w AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '[a-zà-ÿ]+') AS words
  FROM documents
),
profiles(lang, plist) AS (SELECT * FROM (VALUES {profile_rows}) v(lang, plist)),
scored AS (
  SELECT w.doc_id, p.lang,
         CASE WHEN len(w.words) > 0 THEN
           round(len(list_filter(w.words, x -> list_contains(p.plist, x)))::DOUBLE
                 / len(w.words), 6)
         ELSE 0.0 END AS score
  FROM w CROSS JOIN profiles p
),
best AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
  FROM scored
),
cjk AS (
  SELECT doc_id,
         CASE WHEN length(text) > 0 THEN
           len(regexp_extract_all(text, '[\\x{{4E00}}-\\x{{9FFF}}]'))::DOUBLE / length(text)
         ELSE 0.0 END AS cjk_ratio
  FROM w
)
SELECT b.doc_id,
       CASE WHEN c.cjk_ratio > 0.05 THEN 'zh' ELSE b.lang END AS lang_pred,
       CASE WHEN c.cjk_ratio > 0.05 THEN round(c.cjk_ratio, 6) ELSE b.score END AS lang_score
FROM best b JOIN cjk c USING (doc_id)
WHERE b.rn = 1 ORDER BY doc_id
"""


def content_fingerprint_sql() -> str:
    return f"""
SELECT doc_id,
       md5(array_to_string(regexp_extract_all(lower(text), '{TOKEN_PATTERN_RE2}'), ' ')) AS fp
FROM documents ORDER BY doc_id
"""


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """Self-contained twin of ``cosine_topk(emb, query_vector(emb, id), k)``:
    the query vector comes from the same table by id."""
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
qn AS (SELECT sqrt((SELECT sum(x::DOUBLE * x::DOUBLE)
                    FROM (SELECT unnest(qv) AS x FROM q))) AS qn),
e AS (
  SELECT vec_id,
         (SELECT sum(x::DOUBLE * y::DOUBLE)
          FROM (SELECT unnest(embedding) AS x, unnest((SELECT qv FROM q)) AS y)) AS dot,
         sqrt((SELECT sum(x::DOUBLE * x::DOUBLE)
               FROM (SELECT unnest(embedding) AS x))) AS nrm
  FROM embeddings
)
SELECT vec_id, round(dot / (nrm * (SELECT qn FROM qn)), 6) AS cos
FROM e ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


def embedding_near_dups_sql(tau: float = 0.95) -> str:
    """Brute-force twin of the LSH-bucketed near-dup join (bucket collision
    at cos ≥ tau is w.h.p. for the operating bit-width; exact-verified)."""
    return f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt((SELECT sum(x::DOUBLE * x::DOUBLE) FROM (SELECT unnest(embedding) AS x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS a, b.vec_id AS b,
       round((SELECT sum(x::DOUBLE * y::DOUBLE)
              FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
             / (a.nrm * b.nrm), 6) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE (SELECT sum(x::DOUBLE * y::DOUBLE)
       FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
      / (a.nrm * b.nrm) >= {tau}
ORDER BY a, b
"""
