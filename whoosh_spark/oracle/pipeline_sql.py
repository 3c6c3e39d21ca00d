"""DuckDB oracle SQL for the training-data pipeline operators.

Each generator mirrors the corresponding whoosh_spark.pipeline dataflow with
identical tokenization rules, float64 operation shapes, and 6-dp rounding.
MinHash keeps Spark's xxhash64 (engine-private) — its oracle is the exact
n-gram Jaccard twin, valid because LSH candidates are exact-verified and
recall at the operating point is 1−≈6e−8.  SimHash and winnowing use
md5-prefix hashes that BOTH engines compute identically, so their oracles
are exact brute-force twins; the RP-LSH ANN and fake-decode multimodal ops
re-derive the same seeded hyperplanes / sha256 arithmetic in SQL.
"""

from __future__ import annotations

from whoosh_spark.config import TOKEN_PATTERN_RE2
from whoosh_spark.pipeline.textstats import (BPE_ISH_PATTERN, HAN_RE,
                                              HANGUL_RE, KANA_RE,
                                              LANG_PROFILES, LANG_WORD_RE)


def exact_duplicates_sql() -> str:
    return """
WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
g AS (SELECT h, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM h GROUP BY h)
SELECT h.doc_id, g.canonical_id, g.group_size
FROM h JOIN g USING (h) WHERE g.group_size > 1
ORDER BY doc_id
"""


def _shingle_cte(n: int, max_df: int | None = None) -> str:
    cut = ""
    if max_df is not None:
        cut = f"""
sh_all AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS shingle
  FROM t, UNNEST(generate_series(1, len(toks) - {n - 1})) AS u(i)
),
hot AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) > {max_df}),
sh AS (SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)),"""
    else:
        cut = f"""
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS shingle
  FROM t, UNNEST(generate_series(1, len(toks) - {n - 1})) AS u(i)
),"""
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),{cut}
sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id)
"""


def ngram_jaccard_sql(n: int = 3, tau: float = 0.5,
                      max_df: int | None = 1000) -> str:
    """Twin of ``ngram_jaccard_pairs`` incl. the default-on hot-shingle cut."""
    return f"""
WITH {_shingle_cte(n, max_df)},
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
# twin is therefore the brute-force Jaccard query itself (NO df cut: the
# MinHash verify step measures Jaccard over the full shingle sets).
def minhash_near_dups_sql(n: int = 3, tau: float = 0.5) -> str:
    return ngram_jaccard_sql(n, tau, max_df=None)


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
    # \x{...} is identical RE2 syntax; interpolated values need no brace
    # doubling (only literal f-string text does)
    return f"""
WITH w AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '{LANG_WORD_RE}') AS words
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
           len(regexp_extract_all(text, '{HANGUL_RE}'))::DOUBLE / length(text)
         ELSE 0.0 END AS hangul_ratio,
         CASE WHEN length(text) > 0 THEN
           len(regexp_extract_all(text, '{KANA_RE}'))::DOUBLE / length(text)
         ELSE 0.0 END AS kana_ratio,
         CASE WHEN length(text) > 0 THEN
           len(regexp_extract_all(text, '{HAN_RE}'))::DOUBLE / length(text)
         ELSE 0.0 END AS han_ratio
  FROM w
)
SELECT b.doc_id,
       CASE WHEN c.hangul_ratio > 0.05 THEN 'ko'
            WHEN c.kana_ratio > 0.02 THEN 'ja'
            WHEN c.han_ratio > 0.05 THEN 'zh'
            ELSE b.lang END AS lang_pred,
       CASE WHEN c.hangul_ratio > 0.05 THEN round(c.hangul_ratio, 6)
            WHEN c.kana_ratio > 0.02 THEN round(c.kana_ratio + c.han_ratio, 6)
            WHEN c.han_ratio > 0.05 THEN round(c.han_ratio, 6)
            ELSE b.score END AS lang_score
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
qn AS (SELECT CASE WHEN s = 0 THEN 1.0 ELSE sqrt(s) END AS qn FROM
       (SELECT (SELECT sum(x::DOUBLE * x::DOUBLE)
                FROM (SELECT unnest(qv) AS x FROM q)) AS s)),
e AS (
  SELECT vec_id,
         (SELECT sum(x::DOUBLE * y::DOUBLE)
          FROM (SELECT unnest(embedding) AS x, unnest((SELECT qv FROM q)) AS y)) AS dot,
         greatest(sqrt((SELECT sum(x::DOUBLE * x::DOUBLE) FROM (SELECT unnest(embedding) AS x))), 1e-12) AS nrm
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
         greatest(sqrt((SELECT sum(x::DOUBLE * x::DOUBLE) FROM (SELECT unnest(embedding) AS x))), 1e-12) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS a, b.vec_id AS b,
       round((SELECT sum(x::DOUBLE * y::DOUBLE)
              FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
             / (a.nrm * b.nrm), 6) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round((SELECT sum(x::DOUBLE * y::DOUBLE)
       FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
      / (a.nrm * b.nrm), 6) >= {tau}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# round 2: full value oracles for the formerly rows-only ops.  All hashes are
# md5-prefix integers — ('0x' || substr(md5(x),1,n))::BIGINT in DuckDB equals
# Spark conv(substring(md5(x),1,n),16,10)::long bit-for-bit.
# ---------------------------------------------------------------------------



def md5_prefix_sql(expr: str, hexchars: int = 15) -> str:
    """DuckDB side of the cross-engine md5-prefix hash contract (Spark twin:
    ``pipeline.dedup.md5_prefix_long``) — keep every oracle's hash built
    here so the two sides can never drift copy-by-copy."""
    return f"('0x' || substr(md5({expr}), 1, {hexchars}))::BIGINT"


def simhash_near_dups_sql(max_hamming: int = 3) -> str:
    """Brute-force twin of ``simhash_near_dups`` (banding there has FULL
    recall at the radius — bands = max_hamming + 1 — so exact equality)."""
    return f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
hh AS (SELECT doc_id, {md5_prefix_sql('tok')} AS h, tf FROM tf),
votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> i) & 1 = 1 THEN tf ELSE -tf END) AS v
  FROM hh CROSS JOIN (SELECT unnest(range(0, 60)) AS i) bits
  GROUP BY doc_id, i
),
sh AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS s
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b, bit_count(xor(a.s, b.s))::INT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
ORDER BY a, b
"""


def winnow_sql(k: int = 5, w: int = 4) -> str:
    """Twin of ``winnow_fingerprints`` exploded to (doc_id, fp) rows.
    Same 28-bit md5-prefix token hash and exact mod-2^31 Horner polynomial."""
    horner = "th[i]"
    for j in range(1, k):
        horner = f"(({horner}) * 1000003 + th[i+{j}]) % 2147483648"
    return rf"""
WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '') AS toks FROM documents),
h AS (
  SELECT doc_id,
         list_transform(toks, s -> {md5_prefix_sql('s', 7)}) AS th
  FROM t WHERE len(toks) >= {k}
),
kg AS (
  SELECT doc_id,
         list_transform(range(1, len(th) - {k} + 2), i -> {horner}) AS kgs
  FROM h
),
fps AS (
  SELECT doc_id,
         CASE WHEN len(kgs) <= {w} THEN [list_min(kgs)]
              ELSE list_transform(range(1, len(kgs) - {w} + 2),
                                  j -> list_min(kgs[j:j+{w - 1}]))
         END AS fp_list
  FROM kg
)
SELECT DISTINCT doc_id, fp
FROM (SELECT doc_id, unnest(fp_list) AS fp FROM fps)
ORDER BY doc_id, fp
"""


_HTML_PAGE = "'<html><body>' || text || '</body></html>'"


def multimodal_meta_sql() -> str:
    """Twin of ``media_metadata`` over the documents-derived html binary
    (utf-8 of a deterministic wrapper string — reproducible in any engine)."""
    return f"""
WITH h AS (SELECT doc_id, {_HTML_PAGE} AS page FROM documents)
SELECT doc_id,
       octet_length(encode(page))::BIGINT AS n_bytes,
       sha256(page) AS sha,
       hex(encode(substr(page, 1, 4))) AS magic
FROM h ORDER BY doc_id
"""


def multimodal_decode_sql(feat_dim: int = 8) -> str:
    """Twin of ``decode_image(..., impl=fake_decode)``: the fake decoder is
    pure sha256 arithmetic — width/height from digest bytes 0-3, features
    from bytes 8.. (reported as exact 0-255 ints, f_i = round(feature*255))."""
    feats = ",\n       ".join(
        f"('0x' || substr(s, {17 + 2 * i}, 2))::INT AS f{i}"
        for i in range(feat_dim)
    )
    return f"""
WITH h AS (SELECT doc_id, sha256({_HTML_PAGE}) AS s FROM documents)
SELECT doc_id,
       (1 + ('0x' || substr(s, 1, 4))::BIGINT % 2048)::INT AS width,
       (1 + ('0x' || substr(s, 5, 4))::BIGINT % 2048)::INT AS height,
       3::INT AS channels,
       {feats}
FROM h ORDER BY doc_id
"""


def ann_topk_sql(query_vec_id: int = 0, k: int = 10, bits: int = 8,
                 seed: int = 42, dim: int = 64) -> str:
    """Twin of ``ann_topk`` (multi-probe RP-LSH): the seeded hyperplanes are
    re-generated here as SQL literals from the SAME Philox stream, the query
    signature + Hamming-1 probe set and per-row buckets are computed in SQL,
    then exact cosine top-k over the candidate set."""
    from whoosh_spark.pipeline.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits, seed)
    rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in planes[i])}])"
        for i in range(bits)
    )
    dot_q = (f"list_sum(list_transform(range(1, {dim} + 1), "
             f"i -> qv[i] * pv[i]))")
    dot_e = (f"list_sum(list_transform(range(1, {dim} + 1), "
             f"i -> e.embedding[i]::DOUBLE * p.pv[i]))")
    return f"""
WITH planes(pid, pv) AS (SELECT * FROM (VALUES {rows}) v(pid, pv)),
q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id = {query_vec_id}),
qsig AS (
  SELECT sum(CASE WHEN {dot_q} > 0 THEN (1::BIGINT << pid) ELSE 0 END)::BIGINT AS s
  FROM planes, q
),
probes AS (
  SELECT (SELECT s FROM qsig) AS p
  UNION ALL SELECT xor((SELECT s FROM qsig), (1::BIGINT << pid)) FROM planes
),
code AS (
  SELECT e.vec_id,
         sum(CASE WHEN {dot_e} > 0 THEN (1::BIGINT << p.pid) ELSE 0 END)::BIGINT AS bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
cand AS (
  SELECT e.vec_id, e.embedding FROM embeddings e
  JOIN code c USING (vec_id) WHERE c.bucket IN (SELECT p FROM probes)
),
qn AS (SELECT CASE WHEN s = 0 THEN 1.0 ELSE sqrt(s) END AS qn FROM (SELECT list_sum(list_transform(qv, x -> x * x)) AS s FROM q)),
scored AS (
  SELECT vec_id,
         list_sum(list_transform(range(1, {dim} + 1),
                                 i -> embedding[i]::DOUBLE * qv[i])) AS dot,
         greatest(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 1e-12) AS nrm
  FROM cand, q
)
SELECT vec_id, round(dot / (nrm * (SELECT qn FROM qn)), 6) AS cos
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


def ivf_topk_sql(query_vec_id: int = 0, k: int = 10, n_cells: int = 16,
                 n_probe: int = 4, seed: int = 42, dim: int = 64) -> str:
    """Twin of ``ivf_topk``: the seeded unit centroids re-derive here as SQL
    literals; per-row cell = nearest centroid (ORDER BY dot DESC, cid ASC
    LIMIT 1 ≡ the engine's first-max ``array_position`` tie-break), probes =
    the n_probe cells nearest the query, then exact cosine top-k."""
    from whoosh_spark.pipeline.similarity import _ivf_centroids

    cents = _ivf_centroids(dim, n_cells, seed)
    rows = ", ".join(
        f"({c}, [{', '.join(repr(float(x)) for x in cents[c])}])"
        for c in range(n_cells)
    )
    dot_q = (f"list_sum(list_transform(range(1, {dim} + 1), "
             f"i -> q.qv[i] * c.cv[i]))")
    dot_e = (f"list_sum(list_transform(range(1, {dim} + 1), "
             f"i -> e.embedding[i]::DOUBLE * c.cv[i]))")
    return f"""
WITH cents(cid, cv) AS (SELECT * FROM (VALUES {rows}) v(cid, cv)),
q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
      FROM embeddings WHERE vec_id = {query_vec_id}),
probes AS (
  SELECT c.cid FROM cents c, q ORDER BY {dot_q} DESC, c.cid ASC LIMIT {n_probe}
),
celldots AS (
  SELECT e.vec_id, c.cid, {dot_e} AS d FROM embeddings e CROSS JOIN cents c
),
cellof AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid ASC) AS rn
    FROM celldots) t
  WHERE rn = 1
),
cand AS (
  SELECT e.vec_id, e.embedding FROM embeddings e
  JOIN cellof USING (vec_id) WHERE cellof.cell IN (SELECT cid FROM probes)
),
qn AS (SELECT CASE WHEN s = 0 THEN 1.0 ELSE sqrt(s) END AS qn FROM (SELECT list_sum(list_transform(qv, x -> x * x)) AS s FROM q)),
scored AS (
  SELECT vec_id,
         list_sum(list_transform(range(1, {dim} + 1),
                                 i -> embedding[i]::DOUBLE * qv[i])) AS dot,
         greatest(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 1e-12) AS nrm
  FROM cand, q
)
SELECT vec_id, round(dot / (nrm * (SELECT qn FROM qn)), 6) AS cos
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# html → text extraction (pipeline/extract.py twin)
# ---------------------------------------------------------------------------

def html_extract_sql(prefix: str, suffix: str) -> str:
    """Exact twin of ``extract.extract_expr`` over html synthesized as
    ``prefix || text || suffix`` (the contract entry synthesizes the same
    bytes Spark-side — documents.parquet has no html column)."""
    from whoosh_spark.pipeline.extract import (
        DROP_PATTERNS, ENTITIES, TAG_PATTERN, WS_PATTERN)

    def q(s: str) -> str:
        return s.replace("'", "''")

    s = f"'{q(prefix)}' || text || '{q(suffix)}'"
    for pat in DROP_PATTERNS:
        s = f"regexp_replace({s}, '{q(pat)}', ' ', 'g')"
    s = f"regexp_replace({s}, '{q(TAG_PATTERN)}', ' ', 'g')"
    for ent, ch in ENTITIES:
        s = f"replace({s}, '{q(ent)}', '{q(ch)}')"
    s = f"trim(regexp_replace({s}, '{q(WS_PATTERN)}', ' ', 'g'))"
    return f"SELECT doc_id, {s} AS text FROM documents ORDER BY doc_id"


def repetition_sql() -> str:
    """Twin of ``textstats.repetition_features`` (same token rule, same
    6-dp rounding, zero-division → 0)."""
    return f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN_RE2}') AS words
  FROM documents
),
g AS (
  SELECT doc_id, words,
         CASE WHEN len(words) >= 2 THEN
           list_transform(range(1, len(words)),
                          i -> words[i] || ' ' || words[i + 1])
         ELSE [] END AS grams
  FROM w
),
wc AS (
  SELECT doc_id, sum(c) AS n_words,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_w
  FROM (SELECT doc_id, x, count(*) AS c
        FROM (SELECT doc_id, unnest(words) AS x FROM g) GROUP BY 1, 2)
  GROUP BY doc_id
),
gc AS (
  SELECT doc_id, sum(c) AS n_grams, max(c) AS max_g,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_g
  FROM (SELECT doc_id, x, count(*) AS c
        FROM (SELECT doc_id, unnest(grams) AS x FROM g) GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT g.doc_id,
       coalesce(wc.n_words, 0)::BIGINT AS n_words,
       round(CASE WHEN coalesce(wc.n_words, 0) > 0
                  THEN coalesce(wc.dup_w, 0)::DOUBLE / wc.n_words
                  ELSE 0.0 END, 6) AS dup_word_frac,
       round(CASE WHEN coalesce(gc.n_grams, 0) > 0
                  THEN coalesce(gc.max_g, 0)::DOUBLE / gc.n_grams
                  ELSE 0.0 END, 6) AS top_bigram_frac,
       round(CASE WHEN coalesce(gc.n_grams, 0) > 0
                  THEN coalesce(gc.dup_g, 0)::DOUBLE / gc.n_grams
                  ELSE 0.0 END, 6) AS dup_bigram_frac
FROM g LEFT JOIN wc ON wc.doc_id = g.doc_id
       LEFT JOIN gc ON gc.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def _canon_cte_sql(synth: str) -> str:
    """CTE pipeline canonicalizing urls synthesized by the SQL expression
    ``synth`` — twin of ``pipeline/urls.py::canonical_url_expr`` (same RE2
    patterns; replacement backrefs are ``\\1`` here vs Java's ``$1``)."""
    from whoosh_spark.pipeline.urls import (
        DEFAULT_PORT_HTTP, DEFAULT_PORT_HTTPS, FRAGMENT_PATTERN,
        SCHEME_HOST_PATTERN)

    return f"""
u0 AS (SELECT doc_id, {synth} AS u FROM documents),
u1 AS (SELECT doc_id, regexp_replace(u, '{FRAGMENT_PATTERN}', '') AS u FROM u0),
u2 AS (SELECT doc_id,
              CASE WHEN regexp_matches(u, '{SCHEME_HOST_PATTERN}')
                   THEN lower(regexp_extract(u, '{SCHEME_HOST_PATTERN}', 1)) ||
                        regexp_extract(u, '{SCHEME_HOST_PATTERN}', 2)
                   ELSE u END AS u
       FROM u1),
u3 AS (SELECT doc_id,
              regexp_replace(regexp_replace(u, '{DEFAULT_PORT_HTTP}', '\\1\\2'),
                             '{DEFAULT_PORT_HTTPS}', '\\1\\2') AS u
       FROM u2),
u4 AS (SELECT doc_id,
              CASE WHEN strpos(u, '?') > 0
                   THEN substr(u, 1, strpos(u, '?') - 1) ELSE u END AS base,
              array_to_string(list_sort(list_filter(string_split(
                CASE WHEN strpos(u, '?') > 0
                     THEN substr(u, strpos(u, '?') + 1) ELSE '' END, '&'),
                x -> x != '')), '&') AS sq
       FROM u3),
canon AS (SELECT doc_id,
                 CASE WHEN sq != '' THEN base || '?' || sq ELSE base END
                 AS url_canon
          FROM u4)"""


def url_canonical_sql(synth: str) -> str:
    """(doc_id, url_canon) over urls synthesized by the SQL expression
    ``synth`` (must byte-match the Spark-side synthesis)."""
    return (f"WITH {_canon_cte_sql(synth)} "
            f"SELECT doc_id, url_canon FROM canon ORDER BY doc_id")


def url_duplicates_sql(synth: str) -> str:
    return f"""
WITH {_canon_cte_sql(synth)},
grp AS (
  SELECT url_canon, min(doc_id) AS canonical_id,
         count(*)::BIGINT AS group_size
  FROM canon GROUP BY url_canon HAVING count(*) > 1
)
SELECT c.doc_id, g.canonical_id, g.group_size
FROM canon c JOIN grp g USING (url_canon)
ORDER BY c.doc_id
"""


def normalize_text_sql(synth: str = "text") -> str:
    """Twin of ``extract.normalize_text`` over text synthesized by ``synth``."""
    from whoosh_spark.pipeline.extract import CONTROL_PATTERN

    return (f"SELECT doc_id, nfc_normalize(regexp_replace({synth}, "
            f"'{CONTROL_PATTERN}', '', 'g')) AS text "
            f"FROM documents ORDER BY doc_id")


def components_sql(n: int = 3, tau: float = 0.5) -> str:
    """Twin of ``components.connected_components`` over the minhash
    near-dup pairs: min-reachable-id per node via a recursive CTE (exact
    transitive closure — fine at oracle scale; the engine side is the
    O(log n)-round large-star/small-star dataflow)."""
    pairs = ngram_jaccard_sql(n, tau, max_df=None)
    return f"""
WITH RECURSIVE p AS (SELECT a, b FROM ({pairs}) _pairs),
und AS (SELECT a AS x, b AS y FROM p UNION SELECT b, a FROM p),
walk(x, y) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM und) n0
  UNION
  SELECT w.x, u.y FROM walk w JOIN und u ON w.y = u.x
)
SELECT x::BIGINT AS doc_id, min(y)::BIGINT AS component
FROM walk GROUP BY x ORDER BY doc_id
"""


def redact_pii_sql(synth: str = "text") -> str:
    """Twin of ``scrub.redact_pii``: the same staged (email → ssn → phone →
    ipv4) count+replace chain built from the SAME pattern constants."""
    from whoosh_spark.pipeline.scrub import PII_STAGES

    cur = synth
    prev = "documents"
    sql = ""
    counts = []
    for i, (col, pat, tok) in enumerate(PII_STAGES):
        carried = ", ".join(counts)
        sql += f"""{"WITH" if i == 0 else ","} s{i} AS (
  SELECT doc_id{", " + carried if carried else ""},
         len(regexp_extract_all({cur}, '{pat}'))::INT AS {col},
         regexp_replace({cur}, '{pat}', '{tok}', 'g') AS _t
  FROM {prev}
)"""
        cur, prev = "_t", f"s{i}"
        counts.append(col)
    cols = ", ".join(c for c, _, _ in PII_STAGES)
    return sql + (f"\nSELECT doc_id, _t AS clean, {cols} "
                  f"FROM {prev} ORDER BY doc_id")


def line_dedup_sql(sep: str = " ", min_chars: int = 1) -> str:
    """Twin of ``dedup.line_dedup`` (first occurrence = min (doc_id, idx),
    expressed as one monotone combined key).  Emits md5(text) as ``fp`` —
    the entry projects the rebuilt text the same way."""
    return f"""
WITH src AS (SELECT doc_id, string_split(text, '{sep}') AS parts FROM documents),
lines AS (
  SELECT doc_id, unnest(range(len(parts)))::BIGINT AS idx,
         unnest(parts) AS line
  FROM src
),
firsts AS (
  SELECT md5(trim(line)) AS key,
         min(doc_id * 4294967296 + idx) AS fk
  FROM lines WHERE length(trim(line)) >= {min_chars} GROUP BY 1
),
kept AS (
  SELECT l.doc_id, l.idx, l.line FROM lines l
  LEFT JOIN firsts f ON f.key = md5(trim(l.line))
  WHERE length(trim(l.line)) < {min_chars}
     OR l.doc_id * 4294967296 + l.idx = f.fk
),
agg AS (
  SELECT doc_id, string_agg(line, '{sep}' ORDER BY idx) AS text,
         count(*)::BIGINT AS kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id, md5(coalesce(a.text, '')) AS fp, t.n_lines,
       (t.n_lines - coalesce(a.kept, 0))::BIGINT AS n_dropped
FROM tot t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id
"""


def duplicated_spans_sql(n: int = 20, min_count: int = 2) -> str:
    """Twin of ``dedup.duplicated_spans``: windowed-hash exact-substring
    dedup — duplicated n-token windows merged into maximal coverage spans
    per doc (gaps & islands, break when the next window starts > n past
    the previous)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
  SELECT doc_id, i - 1 AS i,
         md5(array_to_string(toks[i:i+{n - 1}], ' ')) AS h
  FROM t, UNNEST(generate_series(1, len(toks) - {n - 1})) AS u(i)
  WHERE len(toks) >= {n}
),
hot AS (SELECT h FROM w GROUP BY h HAVING count(*) >= {min_count}),
d AS (SELECT doc_id, i FROM w WHERE h IN (SELECT h FROM hot)),
b AS (
  SELECT doc_id, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= {n}
              THEN 0 ELSE 1 END AS brk
  FROM d
),
g AS (
  SELECT doc_id, i,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM b
)
SELECT doc_id,
       min(i)::BIGINT AS start_tok,
       (max(i) + {n})::BIGINT AS end_tok,
       (max(i) + {n} - min(i))::BIGINT AS span_tokens
FROM g GROUP BY doc_id, isl
ORDER BY doc_id, start_tok
"""


def host_stats_sql(synth: str) -> str:
    """Twin of ``urls.host_stats`` over urls synthesized by ``synth``."""
    from whoosh_spark.pipeline.urls import HOST_PATTERN

    return f"""
WITH {_canon_cte_sql(synth)}
SELECT regexp_extract(c.url_canon, '{HOST_PATTERN}', 1) AS host,
       count(*)::BIGINT AS n_docs,
       sum(length(d.text))::BIGINT AS n_chars
FROM canon c JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY host
"""


def prep_corpus_sql(lang: str = "en", min_quality: float = 0.5) -> str:
    """Composed twin: lang/quality gates FIRST, then fingerprint dedup
    among the survivors (mirrors prep_corpus's gate-then-dedup order)."""
    return f"""
WITH q AS (SELECT * FROM ({quality_sql()})),
l AS (SELECT * FROM ({lang_id_sql()})),
gated AS (
  SELECT q.doc_id, q.quality
  FROM q JOIN l USING (doc_id)
  WHERE l.lang_pred = '{lang}' AND q.quality >= {min_quality}
),
f AS (SELECT * FROM ({content_fingerprint_sql()})
      WHERE doc_id IN (SELECT doc_id FROM gated)),
keep AS (
  SELECT f.doc_id FROM f
  JOIN (SELECT fp, min(doc_id) AS first FROM f GROUP BY fp) g
    ON g.fp = f.fp AND g.first = f.doc_id
)
SELECT gated.doc_id, gated.quality
FROM gated JOIN keep USING (doc_id)
ORDER BY gated.doc_id
"""

def windowed_events_sql(window_s: int = 21600, delay: str = "1 day") -> str:
    """Twin of ``streaming.windows.stream_windowed_counts``: tumbling
    epoch-aligned windows (manual floor — origin-proof vs time_bucket),
    decimal value sums, restricted to watermark-finalized windows
    (w_end ≤ max event time − delay) exactly as append mode emits them.

    Stays in NAIVE timestamp arithmetic throughout: ``to_timestamp`` would
    route through DuckDB's session ``TimeZone`` (system default) and shift
    the window labels on any non-UTC host, while the Spark side is pinned
    to UTC — epoch + INTERVAL on the naive ``ts`` is engine-tz-proof."""
    return f"""
WITH e AS (
  SELECT ts, event_type, value,
         TIMESTAMP '1970-01-01 00:00:00'
           + CAST(floor(epoch(ts) / {window_s}) * {window_s} AS BIGINT)
             * INTERVAL 1 SECOND
           AS w0
  FROM events
),
agg AS (
  SELECT strftime(w0, '%Y-%m-%d %H:%M:%S') AS w_start,
         strftime(w0 + INTERVAL {window_s} SECOND,
                  '%Y-%m-%d %H:%M:%S') AS w_end,
         w0 + INTERVAL {window_s} SECOND AS w_end_ts,
         event_type,
         count(*)::BIGINT AS n_events,
         round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS sum_value
  FROM e GROUP BY w0, event_type
)
SELECT w_start, w_end, event_type, n_events, sum_value
FROM agg
WHERE w_end_ts <= (SELECT max(ts) FROM events) - INTERVAL {delay}
ORDER BY w_start, event_type
"""


def session_events_sql(gap_s: int = 7200, delay: str = "1 day") -> str:
    """Twin of ``streaming.windows.stream_session_counts``: gaps-and-islands
    sessionization per event_type.  A new session starts when the gap to the
    previous event is >= ``gap_s`` (Spark's session interval is
    [start, last+gap) — an event at exactly the previous end opens a new
    session); session end = last event + gap.  Restricted to
    watermark-finalized sessions (end ≤ max event time − delay) exactly as
    append mode emits them.  All arithmetic stays in naive timestamps.

    Both window sorts carry ``event_id`` as a tiebreaker: with bare
    ``ORDER BY ts`` the two sorts are independent, so tied timestamps at a
    session boundary could see ``brk`` computed under one tie order and the
    running sum under another (tied rows always share an island — the gap
    test is 0 < gap — but only if both sorts agree on the row order)."""
    return f"""
WITH o AS (
  SELECT event_type, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL {gap_s} SECOND
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
g AS (
  SELECT event_type, ts, value,
         sum(brk) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
agg AS (
  SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
         strftime(max(ts) + INTERVAL {gap_s} SECOND,
                  '%Y-%m-%d %H:%M:%S') AS s_end,
         max(ts) + INTERVAL {gap_s} SECOND AS s_end_ts,
         event_type,
         count(*)::BIGINT AS n_events,
         round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS sum_value
  FROM g GROUP BY event_type, sid
)
SELECT s_start, s_end, event_type, n_events, sum_value
FROM agg
WHERE s_end_ts <= (SELECT max(ts) FROM events) - INTERVAL {delay}
ORDER BY s_start, event_type
"""

def stratified_sample_sql(thresholds: dict[str, int],
                          salt: int = 42) -> str:
    """Twin of ``sampling.stratified_sample``: same md5-prefix keep-hash,
    same exact integer thresholds (build both sides from
    ``sampling.sample_thresholds`` so they can never drift)."""
    cases = " OR ".join(
        f"(stratum = '{s}' AND h < {t})"
        for s, t in sorted(thresholds.items())
    ) or "FALSE"
    return f"""
WITH h AS (
  SELECT doc_id, lang AS stratum,
         {md5_prefix_sql(f"doc_id::VARCHAR || ':{salt}'")}
           AS h
  FROM documents
)
SELECT doc_id, stratum, h AS keep_hash
FROM h WHERE {cases}
ORDER BY doc_id
"""


def pack_sequences_sql(budget: int = 512) -> str:
    """Twin of ``sampling.pack_sequences``: the single-node restatement is
    one global window cumsum (the Spark side computes the identical prefix
    sum via bucket partials + per-bucket windows)."""
    return f"""
WITH n AS (
  SELECT doc_id,
         coalesce(len(string_split(trim(text), ' ')), 0)::BIGINT AS n_tokens
  FROM documents WHERE doc_id IS NOT NULL
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM n
)
SELECT doc_id, n_tokens,
       ((cum - n_tokens) // {budget})::BIGINT AS bin_id
FROM c ORDER BY doc_id
"""

def contamination_sql(n: int = 3, probe_max_id: int = 4) -> str:
    """Twin of ``dedup.contamination`` with probes = documents whose id is
    ≤ ``probe_max_id`` (the contract's deterministic self-probe set)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
cs AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS shingle
  FROM t, UNNEST(generate_series(1, len(toks) - {n - 1})) AS u(i)
),
ps AS (SELECT DISTINCT shingle FROM cs WHERE doc_id <= {probe_max_id}),
hits AS (
  SELECT cs.doc_id, count(DISTINCT cs.shingle)::BIGINT AS n_hits
  FROM cs JOIN ps USING (shingle) GROUP BY cs.doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""
