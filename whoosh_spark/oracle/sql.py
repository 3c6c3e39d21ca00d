"""DuckDB oracle-SQL generator for the driver correctness gate.

Each SQL string reimplements the full pipeline — tokenize (RE2 regex),
lowercase, stop/minsize filter, tf/df aggregation, byte-quantized lengths
(embedded 256-bucket lookup from config — no cross-engine float rounding),
BM25 with the exact operation order of execution/score.py — over the shared
``documents`` parquet view, then the query-specific dataflow.

Scores are rounded to 6 dp in BOTH engines; the unrounded float64 pipelines
are operation-order-identical so rank and rounded values agree.
"""

from __future__ import annotations

from whoosh_spark.config import (
    BM25_B,
    BM25_K1,
    BYTE_TO_LENGTH,
    LENGTH_BOUNDARIES,
    STOP_WORDS,
    TOKEN_PATTERN_RE2_UNI,
)

_STOPS = ", ".join(f"'{w}'" for w in sorted(STOP_WORDS))


def _quant_values() -> str:
    """(lo, hi, qlen) rows covering every raw length, from the shared table."""
    bounds = list(LENGTH_BOUNDARIES)
    rows = []
    for code in range(256):
        lo = 0 if code == 0 else bounds[code - 1]
        hi = (bounds[code] - 1) if code < 255 else 9_223_372_036_854_775_807
        if lo <= hi:
            rows.append(f"({lo},{hi},{BYTE_TO_LENGTH[code]})")
    return ",".join(rows)


def _scoring_ctes(tok_ctes: str, extra: str = "",
                  docs: str = "documents") -> str:
    """Scoring CTE suffix shared by every analysis chain: given CTEs ending
    in ``tokf(doc_id, term, pos)``, derive dlq (quantized lengths), nn/ad
    (N, avgdl), tfs/dfs, sc (scored postings).  ``docs`` swaps the corpus
    source (e.g. a language-filtered sub-select) so sub-corpus indexes
    keep N/avgdl over THEIR doc set."""
    return f"""
WITH {tok_ctes},
dl AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS len_raw
  FROM {docs} d LEFT JOIN tokf t USING (doc_id) GROUP BY d.doc_id
),
quant(lo, hi, qlen) AS (SELECT * FROM (VALUES {_quant_values()}) v(lo, hi, qlen)),
dlq AS (
  SELECT dl.doc_id, dl.len_raw, q.qlen::DOUBLE AS dl
  FROM dl JOIN quant q ON dl.len_raw BETWEEN q.lo AND q.hi
),
nn AS (SELECT count(*)::DOUBLE AS n FROM {docs}),
ad AS (SELECT sum(len_raw)::DOUBLE / count(*) AS avgdl FROM dl),
tfs AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokf GROUP BY doc_id, term),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tfs GROUP BY term),
sc AS (
  SELECT t.doc_id, t.term,
         (ln((SELECT n FROM nn) / (d.df + 1)) + 1)
         * ((t.tf * ({BM25_K1} + 1.0))
            / (t.tf + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * q.dl / (SELECT avgdl FROM ad)))) AS score
  FROM tfs t JOIN dfs d USING (term) JOIN dlq q USING (doc_id)
){"," if extra else ""}{extra}
"""


# ONE raw-tokenizer building block (regexp findall + ordinal positions) so
# the standard and ngram chains can never drift apart in tokenization
def _raw_tok(word_col: str, docs: str = "documents") -> str:
    return f"""tok AS (
  SELECT doc_id, lower(toks[i]) AS {word_col}, i - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all(text, '{TOKEN_PATTERN_RE2_UNI}') AS toks FROM {docs}),
       UNNEST(generate_series(1, len(toks))) AS u(i)
)"""


_STANDARD_TOK = _raw_tok("term") + f""",
tokf AS (
  SELECT * FROM tok WHERE length(term) >= 2 AND term NOT IN ({_STOPS})
)"""

# NGRAMWORDS chain (fields.py::NGRAMWORDS ≈L1150): every lowercased word →
# its char 2..4-grams, all at the word's tokenizer ordinal; no stop/minsize
# word filter (generate_series is empty when the word is shorter than n)
_NGRAM_TOK = _raw_tok("word") + """,
tokf AS (
  SELECT doc_id, substring(word, j, n) AS term, pos
  FROM tok,
       UNNEST(generate_series(2, 4)) AS gn(n),
       UNNEST(generate_series(1, length(word) - n + 1)) AS gj(j)
)"""


def base_ctes(extra: str = "") -> str:
    """Shared CTE prefix: tokf (analyzed tokens w/ stop-gap positions) +
    the scoring suffix."""
    return _scoring_ctes(_STANDARD_TOK, extra)


def ngram_base_ctes(extra: str = "") -> str:
    """base_ctes over the NGRAMWORDS token stream (substring index)."""
    return _scoring_ctes(_NGRAM_TOK, extra)


def ngram_and_sql(grams: list[str], k: int = 10) -> str:
    """Substring search against an NGRAMWORDS index: the parser's
    query-time tee splits the query word into its grams → And of gram
    Terms (all must hit, score = sum; like and_sql, the multi-term sum
    relies on 6dp rounding absorbing FP order differences)."""
    if not grams:
        # engine parity: a sub-2-char query word parses to NullQuery
        return ngram_base_ctes() + topk(
            "SELECT doc_id, score FROM sc WHERE FALSE", k)
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc "
        f"WHERE term IN ({_terms_in(sorted(set(grams)))}) "
        f"GROUP BY doc_id HAVING count(*) = {len(set(grams))}"
    )
    return ngram_base_ctes() + topk(sel, k)


def _terms_in(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def _like_escape(s: str) -> str:
    """LIKE-literal: _ and % are wildcards in LIKE but ordinary chars in the
    engine's startswith — escape them (pair with ESCAPE '\\')."""
    return (s.replace("\\", "\\\\").replace("_", "\\_")
             .replace("%", "\\%"))


def topk(inner_select: str, k: int = 10) -> str:
    return (
        f"SELECT doc_id, round(score, 6) AS score FROM ({inner_select}) "
        f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
    )


def term_sql(term: str, k: int = 10) -> str:
    return base_ctes() + topk(f"SELECT doc_id, score FROM sc WHERE term = '{term}'", k)


def lang_term_sql(term: str, lang: str, k: int = 10,
                  sf_dirs: tuple[str, ...] = ("/root/testdata/sf0.001",
                                              "/root/testdata/sf0.01",
                                              "/root/testdata/sf0.1"),
                  corpus_lang: str | None = None) -> str:
    """Term query against a per-language sub-corpus index built with the
    ``lang_<code>`` chain (tokenize → stop(lang) → snowball stem): the
    stemmer is not SQL-expressible, so the oracle embeds a (word, stem)
    VALUES map computed by the SAME Python stemmer over the corpus's
    actual vocabulary (read once from the testdata parquets — the synthetic
    vocab is small and fixed), COALESCE-identity for anything else.
    ``term`` is the RAW query word; both engines stem it via the query-time
    analyzer tee."""
    import os

    import duckdb

    from whoosh_spark.analysis.snowball import LANG_STOPWORDS, STEMMERS

    stem = STEMMERS.get(lang)
    stops = LANG_STOPWORDS.get(lang, frozenset())
    vocab: set[str] = set()
    for d in sf_dirs:
        p = os.path.join(d, "documents.parquet")
        if os.path.exists(p):
            vocab |= {
                r[0] for r in duckdb.sql(
                    f"SELECT DISTINCT unnest(regexp_extract_all(lower(text),"
                    f" '{TOKEN_PATTERN_RE2_UNI}')) FROM read_parquet('{p}')"
                ).fetchall()
            }
    pairs = sorted((w, stem(w)) for w in vocab
                   if stem is not None and stem(w) != w)
    if pairs:
        vals = ",".join(f"('{w}','{s}')" for w, s in pairs)
        map_cte = (f"stem_map(word, stem) AS "
                   f"(SELECT * FROM (VALUES {vals}) v(word, stem)),")
        stem_expr = "COALESCE(m.stem, t.word)"
        map_join = "LEFT JOIN stem_map m ON t.word = m.word"
    else:
        map_cte, stem_expr, map_join = "", "t.word", ""
    stops_sql = ", ".join(f"'{w}'" for w in sorted(stops)) or "''"
    # languages without their own sub-corpus in the testdata index a host
    # sub-corpus (corpus_lang) through the lang_<code> chain — the chain
    # under test is the stemmer's, the rows are the host language's
    docs = (f"(SELECT * FROM documents "
            f"WHERE lang = '{corpus_lang or lang}')")
    tok_ctes = _raw_tok("word", docs=docs) + f""",
{map_cte}
tokf AS (
  SELECT t.doc_id, {stem_expr} AS term, t.pos
  FROM tok t {map_join}
  WHERE length(t.word) >= 2 AND t.word NOT IN ({stops_sql})
)"""
    qterm = stem(term.lower()) if stem is not None else term.lower()
    return _scoring_ctes(tok_ctes, docs=docs) + topk(
        f"SELECT doc_id, score FROM sc WHERE term = '{qterm}'", k)


def lang_routed_term_sql(term: str, query_lang: str, k: int = 10,
                         sf_dirs: tuple[str, ...] = (
                             "/root/testdata/sf0.001",
                             "/root/testdata/sf0.01",
                             "/root/testdata/sf0.1")) -> str:
    """Term query against a per-row language-ROUTED index over the whole
    multilingual corpus (``analyzer="lang_routed"``): every document is
    analyzed by its own ``lang_<code>`` chain (standard chain for unrouted
    codes), the query by ``lang_<query_lang>``.  The oracle restates the
    routing as lang-keyed stem/stop maps over the corpus vocabulary,
    computed by the SAME Python stemmers."""
    import os

    import duckdb

    from whoosh_spark.analysis.snowball import LANG_STOPWORDS, STEMMERS
    from whoosh_spark.build import routed_language_chains
    from whoosh_spark.config import STOP_WORDS

    routed = set(routed_language_chains())
    vocab: set[str] = set()
    corpus_langs: set[str] = set()
    for d in sf_dirs:
        p = os.path.join(d, "documents.parquet")
        if os.path.exists(p):
            vocab |= {
                r[0] for r in duckdb.sql(
                    f"SELECT DISTINCT unnest(regexp_extract_all(lower(text),"
                    f" '{TOKEN_PATTERN_RE2_UNI}')) FROM read_parquet('{p}')"
                ).fetchall()
            }
            corpus_langs |= {
                r[0] for r in duckdb.sql(
                    f"SELECT DISTINCT lang FROM read_parquet('{p}')"
                ).fetchall() if r[0] is not None
            }

    stem_rows: list[tuple[str, str, str]] = []
    stop_rows: list[tuple[str, str]] = []
    # '' is the NULL-lang bucket (tok COALESCEs lang to '') — the engine's
    # routed kernel treats a NULL lang as unrouted, i.e. the standard chain
    for lg in sorted(corpus_langs) + [""]:
        if lg in routed:
            stem = STEMMERS.get(lg)
            stops = LANG_STOPWORDS.get(lg, frozenset())
        else:
            stem, stops = None, STOP_WORDS
        if stem is not None:
            for w in sorted(vocab):
                s = stem(w)
                if s != w:
                    stem_rows.append((lg, w, s))
        stop_rows += [(lg, w) for w in sorted(stops)]

    stem_vals = ",".join(f"('{lg}','{w}','{s}')" for lg, w, s in stem_rows) \
        or "('','','')"
    stop_vals = ",".join(f"('{lg}','{w}')" for lg, w in stop_rows) \
        or "('','')"
    tok_ctes = f"""tok AS (
  SELECT doc_id, COALESCE(lang, '') AS lang, lower(toks[i]) AS word,
         i - 1 AS pos
  FROM (SELECT doc_id, lang, regexp_extract_all(text,
        '{TOKEN_PATTERN_RE2_UNI}') AS toks FROM documents),
       UNNEST(generate_series(1, len(toks))) AS u(i)
),
stem_map(slang, sword, stem) AS
  (SELECT * FROM (VALUES {stem_vals}) v(slang, sword, stem)),
stop_map(xlang, xword) AS
  (SELECT * FROM (VALUES {stop_vals}) v(xlang, xword)),
tokf AS (
  SELECT t.doc_id, COALESCE(m.stem, t.word) AS term, t.pos
  FROM tok t
  LEFT JOIN stem_map m ON m.slang = t.lang AND m.sword = t.word
  LEFT JOIN stop_map s ON s.xlang = t.lang AND s.xword = t.word
  WHERE length(t.word) >= 2 AND s.xword IS NULL
)"""
    qstem = STEMMERS.get(query_lang) if query_lang in routed else None
    qterm = qstem(term.lower()) if qstem is not None else term.lower()
    return _scoring_ctes(tok_ctes) + topk(
        f"SELECT doc_id, score FROM sc WHERE term = '{qterm}'", k)


def and_sql(terms: list[str], k: int = 10) -> str:
    """Inner join of children; sum in ascending-df order (engine join order).
    Two-term sums are FP-commutative so order only matters for 3+ terms."""
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc WHERE term IN ({_terms_in(terms)}) "
        f"GROUP BY doc_id HAVING count(*) = {len(set(terms))}"
    )
    return base_ctes() + topk(sel, k)


def search_many_sql(named_selects: list[tuple[str, str]], k: int = 10) -> str:
    """Batch-search oracle: per-query top-k over the SHARED scored-postings
    CTEs, one ranked window per query name (mirrors Searcher.search_many's
    partitioned window; tie-break score DESC, doc_id ASC)."""
    branches = " UNION ALL ".join(
        f"SELECT '{name}' AS qname, doc_id, score, "
        f"row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn "
        f"FROM ({sel})"
        for name, sel in named_selects
    )
    return base_ctes() + (
        f"SELECT qname, doc_id, round(score, 6) AS score "
        f"FROM ({branches}) WHERE rn <= {k}"
    )


def or_sql(terms: list[str], minmatch: int = 0, k: int = 10) -> str:
    having = f"HAVING count(*) >= {minmatch}" if minmatch > 1 else ""
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc WHERE term IN ({_terms_in(terms)}) "
        f"GROUP BY doc_id {having}"
    )
    return base_ctes() + topk(sel, k)


def or_of_and_sql(and_terms: list[str], or_term: str, k: int = 10) -> str:
    """Or(And(and_terms), Term(or_term)) — additive Or scoring: docs with
    ALL of ``and_terms`` contribute their sum, docs with ``or_term``
    contribute its score, either side qualifies a doc."""
    both = " AND ".join(
        f"doc_id IN (SELECT doc_id FROM sc WHERE term = '{t}')"
        for t in and_terms)
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc "
        f"WHERE (term IN ({_terms_in(and_terms)}) AND {both}) "
        f"OR term = '{or_term}' GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def andnot_sql(a: str, b: str, k: int = 10) -> str:
    sel = (
        f"SELECT doc_id, score FROM sc WHERE term = '{a}' AND doc_id NOT IN "
        f"(SELECT doc_id FROM sc WHERE term = '{b}')"
    )
    return base_ctes() + topk(sel, k)


def andmaybe_sql(a: str, b: str, k: int = 10) -> str:
    sel = f"""
      SELECT x.doc_id, x.score + coalesce(y.score, 0.0) AS score
      FROM (SELECT doc_id, score FROM sc WHERE term = '{a}') x
      LEFT JOIN (SELECT doc_id, score FROM sc WHERE term = '{b}') y USING (doc_id)
    """
    return base_ctes() + topk(sel, k)


def dismax_sql(terms: list[str], tiebreak: float, k: int = 10) -> str:
    sel = (
        f"SELECT doc_id, max(score) + {tiebreak} * (sum(score) - max(score)) AS score "
        f"FROM sc WHERE term IN ({_terms_in(terms)}) GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def phrase_sql(words: list[str], slop: int = 1, k: int = 10) -> str:
    """Consecutive-position join (gap in [1, slop] per step), scored as the
    sum of constituent term scores (engine Phrase semantics)."""
    joins = []
    for i in range(len(words)):
        joins.append(f"(SELECT doc_id, pos FROM tokf WHERE term = '{words[i]}') p{i}")
    cond = []
    for i in range(1, len(words)):
        cond.append(
            f"p{i}.doc_id = p0.doc_id AND p{i}.pos > p{i-1}.pos AND p{i}.pos <= p{i-1}.pos + {slop}"
        )
    match = (
        "pm AS (SELECT DISTINCT p0.doc_id FROM "
        + " , ".join(joins)
        + " WHERE "
        + " AND ".join(cond)
        + ")"
    )
    uniq = sorted(set(words))
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term IN ({_terms_in(uniq)}) GROUP BY s.doc_id"
    )
    return base_ctes(match) + topk(sel, k)


def prefix_sql(prefix: str, k: int = 10) -> str:
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc "
        f"WHERE term LIKE '{_like_escape(prefix)}%' ESCAPE '\\' "
        f"GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def term_range_sql(lo: str, hi: str, k: int = 10) -> str:
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc "
        f"WHERE term >= '{lo}' AND term <= '{hi}' GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def wildcard_sql(like_pattern: str, k: int = 10) -> str:
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc WHERE term LIKE '{like_pattern}' "
        f"GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def and_expansions_sql(prefix: str, like_pattern: str, k: int = 10) -> str:
    """And(Prefix, Wildcard): each child contributes the sum of ITS matching
    terms' BM25, so a term matched by BOTH expansions is counted once PER
    CHILD (upstream matcher-per-child semantics; only IDENTICAL
    pre-expansion children dedupe, in normalize()).  Conjunction = the doc
    matches >= 1 term from each side."""
    sel = f"""
      SELECT doc_id, sum(score * (a + b)) AS score FROM (
        SELECT doc_id, score,
               CASE WHEN term LIKE '{_like_escape(prefix)}%' ESCAPE '\\' THEN 1 ELSE 0 END AS a,
               CASE WHEN term LIKE '{like_pattern}' THEN 1 ELSE 0 END AS b
        FROM sc) m
      WHERE a + b > 0
      GROUP BY doc_id HAVING sum(a) >= 1 AND sum(b) >= 1"""
    return base_ctes() + topk(sel, k)


def fuzzy_sql(word: str, maxdist: int, prefixlength: int, k: int = 10) -> str:
    sel = f"""
      SELECT doc_id, sum(score) AS score FROM sc
      WHERE term IN (SELECT term FROM dfs
                     WHERE levenshtein(term, '{word}') <= {maxdist}
                       AND term LIKE '{_like_escape(word[:prefixlength])}%' ESCAPE '\\')
      GROUP BY doc_id
    """
    return base_ctes() + topk(sel, k)


def filtered_and_sql(terms: list[str], pred: str, k: int = 10) -> str:
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc WHERE term IN ({_terms_in(terms)}) "
        f"AND doc_id IN (SELECT doc_id FROM documents WHERE {pred}) "
        f"GROUP BY doc_id HAVING count(*) = {len(set(terms))}"
    )
    return base_ctes() + topk(sel, k)


def facet_count_sql(term: str, facet: str) -> str:
    return base_ctes() + f"""
      SELECT d.{facet} AS {facet}, count(*)::BIGINT AS n
      FROM sc JOIN documents d USING (doc_id)
      WHERE sc.term = '{term}' GROUP BY d.{facet}
    """


def docs_for_query_and_sql(terms: list[str]) -> str:
    """Unscored doc set of an And over term children — every id, no top-k."""
    return base_ctes() + f"""
      SELECT doc_id FROM sc WHERE term IN ({_terms_in(terms)})
      GROUP BY doc_id HAVING count(*) = {len(set(terms))}
    """


def facet_doclists_sql(term: str, facet: str) -> str:
    return base_ctes() + f"""
      SELECT d.{facet} AS {facet},
             string_agg(sc.doc_id::VARCHAR, ',' ORDER BY sc.doc_id) AS doc_ids,
             count(*)::BIGINT AS n
      FROM sc JOIN documents d USING (doc_id)
      WHERE sc.term = '{term}' GROUP BY d.{facet}
    """


def collapse_sql(term: str, key: str, k: int = 10) -> str:
    sel = f"""
      SELECT doc_id, score FROM (
        SELECT sc.doc_id, sc.score,
               row_number() OVER (PARTITION BY d.{key}
                                  ORDER BY sc.score DESC, sc.doc_id ASC) AS rn
        FROM sc JOIN documents d USING (doc_id) WHERE sc.term = '{term}') t
      WHERE rn <= 1
    """
    return base_ctes() + topk(sel, k)


def collapse_order_sql(term: str, key: str, order_col: str, k: int = 10,
                       keep: int = 1) -> str:
    """collapse= with collapse_order=: survivors per key are picked by the
    order column ascending (lower wins), then ranked by score."""
    sel = f"""
      SELECT doc_id, score FROM (
        SELECT sc.doc_id, sc.score,
               row_number() OVER (PARTITION BY d.{key}
                                  ORDER BY d.{order_col} ASC NULLS LAST,
                                           sc.doc_id ASC) AS rn
        FROM sc JOIN documents d USING (doc_id) WHERE sc.term = '{term}') t
      WHERE rn <= {keep}
    """
    return base_ctes() + topk(sel, k)


def best_per_facet_and_sql(terms: list[str], facet: str) -> str:
    """Best-scoring doc per facet bucket over an And match set — the DuckDB
    twin of the custom-Collector contract entry (a user-written terminal
    collector doing per-bucket argmax through the collectors.py API)."""
    sel = f"""
      SELECT {facet}, doc_id, score FROM (
        SELECT d.{facet} AS {facet}, m.doc_id, round(m.score, 6) AS score,
               row_number() OVER (PARTITION BY d.{facet}
                                  ORDER BY m.score DESC, m.doc_id ASC) AS rn
        FROM (SELECT doc_id, sum(score) AS score FROM sc
              WHERE term IN ({_terms_in(terms)})
              GROUP BY doc_id HAVING count(*) = {len(set(terms))}) m
        JOIN documents d USING (doc_id)) t
      WHERE rn = 1 ORDER BY {facet}
    """
    return base_ctes() + sel


def term_vector_sql(doc_id: int) -> str:
    """Forward-index term vector of one document: (term, tf, positions) with
    tokenizer-ordinal positions (stop gaps preserved) — the DuckDB twin of
    ``IndexReader.vector_df`` (same tokf token/positions CTE)."""
    return base_ctes() + f"""
      SELECT term, count(*)::BIGINT AS tf,
             string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
      FROM tokf WHERE doc_id = {doc_id}
      GROUP BY term ORDER BY term
    """


def sortedby_sql(term: str, col: str, k: int = 10) -> str:
    return base_ctes() + f"""
      SELECT sc.doc_id AS doc_id, d.{col} AS {col}
      FROM sc JOIN documents d USING (doc_id)
      WHERE sc.term = '{term}'
      ORDER BY d.{col} ASC, sc.doc_id ASC LIMIT {k}
    """


def sortedby_multi_sql(term: str, cols: list[str], k: int = 10) -> str:
    """Multi-level sort facet (``sorting.py::MultiFacet ≈L500``)."""
    collist = ", ".join(f"d.{c} AS {c}" for c in cols)
    order = ", ".join(f"d.{c} ASC" for c in cols)
    return base_ctes() + f"""
      SELECT sc.doc_id AS doc_id, {collist}
      FROM sc JOIN documents d USING (doc_id)
      WHERE sc.term = '{term}'
      ORDER BY {order}, sc.doc_id ASC LIMIT {k}
    """


def sortedby_score_facet_sql(term: str, col: str, k: int = 10) -> str:
    """ScoreFacet inside a multi-level sort (``sorting.py::ScoreFacet
    ≈L380``): stored column ASC, then score DESC (the facet keys on
    0-score), then doc_id ASC."""
    return base_ctes() + f"""
      SELECT x.doc_id AS doc_id, d.{col} AS {col}, x.score AS score
      FROM (SELECT doc_id, sum(score) AS score FROM sc
            WHERE term = '{term}' GROUP BY doc_id) x
      JOIN documents d USING (doc_id)
      ORDER BY d.{col} ASC, x.score DESC, x.doc_id ASC LIMIT {k}
    """


def term_stats_sql(top: int = 20) -> str:
    return base_ctes() + f"""
      SELECT t.term AS term, count(*)::BIGINT AS df, sum(t.tf)::BIGINT AS cf,
             max(t.tf)::DOUBLE AS max_weight
      FROM tfs t GROUP BY t.term
      ORDER BY cf DESC, term ASC LIMIT {top}
    """


def distinctive_terms_sql(top: int = 10) -> str:
    """IndexReader.most_distinctive_terms: cf·(ln(N/(df+1))+1), score DESC."""
    return base_ctes() + f"""
      SELECT (cf * (ln(n / (df + 1.0)) + 1.0))::DOUBLE AS score, term
      FROM (SELECT t.term AS term, count(*)::DOUBLE AS df,
                   sum(t.tf)::DOUBLE AS cf FROM tfs t GROUP BY t.term)
      CROSS JOIN (SELECT count(*)::DOUBLE AS n FROM dl)
      ORDER BY score DESC, term ASC LIMIT {top}
    """


def field_stats_sql() -> str:
    return base_ctes() + """
      SELECT count(*)::BIGINT AS doc_count, sum(len_raw)::BIGINT AS total_len,
             min(len_raw)::INT AS min_len, max(len_raw)::INT AS max_len
      FROM dl
    """


def doc_lengths_sql(limit: int = 100) -> str:
    return base_ctes() + f"""
      SELECT doc_id, len_raw::INT AS len_raw, dl::INT AS dl FROM dlq
      ORDER BY doc_id LIMIT {limit}
    """


def sequence_prefix_sql(first: str, prefix: str, slop: int = 1, k: int = 10) -> str:
    """Sequence([Term(first), Prefix(prefix)], slop): ordered proximity where
    slot 2 is the prefix expansion; scored as sum of all involved terms."""
    match = f"""pm AS (
  SELECT DISTINCT p0.doc_id
  FROM (SELECT doc_id, pos FROM tokf WHERE term = '{first}') p0
  JOIN (SELECT doc_id, pos FROM tokf WHERE term LIKE '{_like_escape(prefix)}%' ESCAPE '\\') p1
    ON p1.doc_id = p0.doc_id AND p1.pos > p0.pos AND p1.pos <= p0.pos + {slop}
)"""
    sel = f"""
SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id)
WHERE s.term = '{first}' OR s.term LIKE '{_like_escape(prefix)}%' ESCAPE '\\' GROUP BY s.doc_id
"""
    return base_ctes(match) + topk(sel, k)


def range_facet_sql(term: str, col: str, start: float, end: float, gap: float) -> str:
    """RangeFacet over a stored numeric column for matches of ``term``."""
    import math
    nbins = int(math.ceil((end - start) / gap))
    sel = f"""
SELECT CASE WHEN d.{col} < {start} THEN -1
            WHEN d.{col} >= {end} THEN {nbins}
            ELSE CAST(floor((d.{col} - {start}) / {gap}) AS INT) END AS bin,
       count(*)::BIGINT AS n
FROM (SELECT DISTINCT doc_id FROM sc WHERE term = '{term}') m
JOIN documents d USING (doc_id)
GROUP BY 1
"""
    return base_ctes() + sel


def query_facet_sql(base_term: str, named: dict[str, str]) -> str:
    """QueryFacet: each value is a term whose doc set defines the facet."""
    parts = [
        f"""SELECT '{name}' AS facet, count(*)::BIGINT AS n
FROM (SELECT DISTINCT doc_id FROM sc WHERE term = '{base_term}') b
WHERE b.doc_id IN (SELECT doc_id FROM sc WHERE term = '{t}')"""
        for name, t in sorted(named.items())
    ]
    return base_ctes() + " UNION ALL ".join(parts)


def numeric_range_sql(col: str, lo: float, hi: float, limit: int = 100) -> str:
    """Native-predicate NumericRange (tiered terms obsolete, SURVEY.md §2.4)."""
    return f"""
SELECT doc_id, 1.0::DOUBLE AS score FROM documents
WHERE {col} >= {lo} AND {col} <= {hi}
ORDER BY doc_id LIMIT {limit}
"""


def paging_sql(term: str, pagelen: int, page: int) -> str:
    """search_page(n, pagelen): OFFSET slice of the ranked list."""
    sel = f"SELECT doc_id, score FROM sc WHERE term = '{term}'"
    return base_ctes() + (
        f"SELECT doc_id, round(score, 6) AS score FROM ({sel}) "
        f"ORDER BY score DESC, doc_id ASC LIMIT {pagelen} OFFSET {(page - 1) * pagelen}"
    )


def spelling_sql(word: str, maxdist: int = 2, top: int = 3) -> str:
    return base_ctes() + f"""
      SELECT t.term AS term FROM
        (SELECT term, sum(tf)::BIGINT AS cf FROM tfs GROUP BY term) t
      WHERE levenshtein(t.term, '{word}') <= {maxdist} AND t.term LIKE '{_like_escape(word[:1])}%' ESCAPE '\\'
      ORDER BY t.cf DESC, t.term ASC LIMIT {top}
    """


def key_terms_sql(doc_ids: list[int], top: int = 5) -> str:
    ids = ", ".join(str(d) for d in doc_ids)
    return base_ctes() + f"""
      SELECT t.term AS term,
             round(sum(t.tf) * (ln((SELECT n FROM nn) / (d.df + 1)) + 1), 6) AS keyness
      FROM tfs t JOIN dfs d USING (term)
      WHERE t.doc_id IN ({ids})
      GROUP BY t.term, d.df
      ORDER BY keyness DESC, term ASC LIMIT {top}
    """


def key_terms_model_sql(doc_ids: list[int], top: int = 5,
                        model: str = "bo1") -> str:
    """DFR expansion-model key terms (``classify.py::Bo1Model ≈L120 /
    Bo2Model ≈L140 / KLModel ≈L160``) — wt = term weight in the doc set,
    cf = collection frequency, ct = total field length, tt = doc-set total
    length, all re-derived from the raw corpus."""
    ids = ", ".join(str(d) for d in doc_ids)
    stats = f"""
      cfs AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tfs GROUP BY term),
      ct AS (SELECT sum(len_raw)::DOUBLE AS v FROM dl),
      tt AS (SELECT sum(len_raw)::DOUBLE AS v FROM dl WHERE doc_id IN ({ids})),
      wts AS (SELECT term, sum(tf)::DOUBLE AS wt FROM tfs
              WHERE doc_id IN ({ids}) GROUP BY term)
    """
    if model == "bo1":
        expr = ("w.wt * log2((1 + c.cf / (SELECT n FROM nn)) / (c.cf / (SELECT n FROM nn)))"
                " + log2(1 + c.cf / (SELECT n FROM nn))")
    elif model == "bo2":
        expr = ("w.wt * log2((1 + w.wt * (SELECT v FROM tt) / (SELECT v FROM ct))"
                " / (w.wt * (SELECT v FROM tt) / (SELECT v FROM ct)))"
                " + log2(1 + w.wt * (SELECT v FROM tt) / (SELECT v FROM ct))")
    elif model == "kl":
        expr = ("CASE WHEN w.wt / (SELECT v FROM tt) >= c.cf / (SELECT v FROM ct)"
                " THEN (w.wt / (SELECT v FROM tt))"
                " * log2((w.wt / (SELECT v FROM tt)) / (c.cf / (SELECT v FROM ct)))"
                " ELSE 0.0 END")
    else:
        raise ValueError(model)
    return base_ctes(stats) + f"""
      SELECT w.term AS term, round({expr}, 6) AS keyness
      FROM wts w JOIN cfs c USING (term)
      ORDER BY keyness DESC, term ASC LIMIT {top}
    """


# ---------------------------------------------------------------------------
# Multi-field (Schema/BM25F) oracles — one analysis pipeline per field over
# its source column, then cross-field score algebra (round 2).
# ---------------------------------------------------------------------------


def _field_pipeline(name: str, col: str) -> str:
    """Per-field CTE chain suffixed _<name>: tokenize ``col`` → stop filter →
    quantized lengths → per-field avgdl → BM25 scored postings sc_<name>."""
    return f"""
tok_{name} AS (
  SELECT doc_id, lower(toks[i]) AS term, i - 1 AS pos
  FROM (SELECT doc_id, regexp_extract_all({col}, '{TOKEN_PATTERN_RE2_UNI}') AS toks FROM documents),
       UNNEST(generate_series(1, len(toks))) AS u(i)
),
tokf_{name} AS (
  SELECT * FROM tok_{name} WHERE length(term) >= 2 AND term NOT IN ({_STOPS})
),
dl_{name} AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS len_raw
  FROM documents d LEFT JOIN tokf_{name} t USING (doc_id) GROUP BY d.doc_id
),
dlq_{name} AS (
  SELECT dl.doc_id, dl.len_raw, q.qlen::DOUBLE AS dl
  FROM dl_{name} dl JOIN quant q ON dl.len_raw BETWEEN q.lo AND q.hi
),
ad_{name} AS (SELECT sum(len_raw)::DOUBLE / count(*) AS avgdl FROM dl_{name}),
tfs_{name} AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokf_{name} GROUP BY doc_id, term),
dfs_{name} AS (SELECT term, count(*)::BIGINT AS df FROM tfs_{name} GROUP BY term),
sc_{name} AS (
  SELECT t.doc_id, t.term,
         (ln((SELECT n FROM nn) / (d.df + 1)) + 1)
         * ((t.tf * ({BM25_K1} + 1.0))
            / (t.tf + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * q.dl / (SELECT avgdl FROM ad_{name})))) AS score
  FROM tfs_{name} t JOIN dfs_{name} d USING (term) JOIN dlq_{name} q USING (doc_id)
)"""


def fielded_base(fields: dict[str, str]) -> str:
    """WITH prefix for a multi-field schema: {field name: source column}."""
    parts = [
        f"quant(lo, hi, qlen) AS (SELECT * FROM (VALUES {_quant_values()}) v(lo, hi, qlen))",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM documents)",
    ]
    parts += [_field_pipeline(name, col) for name, col in sorted(fields.items())]
    return "WITH " + ",".join(parts) + "\n"


def fielded_and_sql(field_terms: list[tuple[str, str]],
                    fields: dict[str, str], k: int = 10) -> str:
    """And of fielded Terms: inner join across per-field score sets, sum."""
    sels = [
        f"(SELECT doc_id, score AS s{i} FROM sc_{f} WHERE term = '{t}') q{i}"
        for i, (f, t) in enumerate(field_terms)
    ]
    joins = sels[0]
    for i in range(1, len(sels)):
        joins += f" JOIN {sels[i]} USING (doc_id)"
    total = " + ".join(f"s{i}" for i in range(len(sels)))
    sel = f"SELECT doc_id, {total} AS score FROM {joins}"
    return fielded_base(fields) + topk(sel, k)


def fielded_group_and_sql(or_field: str, or_terms: list[str],
                          and_field: str, and_term: str,
                          fields: dict[str, str], k: int = 10) -> str:
    """And(Or over one field's terms, single fielded Term) — the oracle twin
    of FieldsPlugin group syntax ``f:(a OR b) AND g:t``.  Or = union of the
    field's per-term score sets summed per doc (multifield_or operation
    order); And = inner join + sum (fielded_and operation order)."""
    unions = " UNION ALL ".join(
        f"SELECT doc_id, score FROM sc_{or_field} WHERE term = '{t}'"
        for t in or_terms
    )
    grp = (f"(SELECT doc_id, sum(score) AS s0 FROM ({unions}) "
           "GROUP BY doc_id) q0")
    rhs = (f"(SELECT doc_id, score AS s1 FROM sc_{and_field} "
           f"WHERE term = '{and_term}') q1")
    sel = f"SELECT doc_id, s0 + s1 AS score FROM {grp} JOIN {rhs} USING (doc_id)"
    return fielded_base(fields) + topk(sel, k)


def multifield_or_sql(term: str, fields: dict[str, str], k: int = 10) -> str:
    """MultifieldParser default: unfielded term → Or over every field."""
    unions = " UNION ALL ".join(
        f"SELECT doc_id, score FROM sc_{f} WHERE term = '{term}'"
        for f in sorted(fields)
    )
    sel = f"SELECT doc_id, sum(score) AS score FROM ({unions}) GROUP BY doc_id"
    return fielded_base(fields) + topk(sel, k)


# ---------------------------------------------------------------------------
# Round-2 additions: Regex / Variations / DateRange / spans / nested /
# DFR weightings.  Same base pipeline, query-specific tails (operation-order
# parity with execution/score.py & evaluate.py documented inline).
# ---------------------------------------------------------------------------

LN2 = "0.6931471805599453"      # matches execution/score.py LN2
LOG2_E = "1.4426950408889634"   # matches execution/score.py LOG2_E
TWO_PI = "6.283185307179586"    # 2.0 * math.pi, Python-folded like the engine


def regex_sql(pattern: str, k: int = 10) -> str:
    """Regex term query — partial match like Spark ``rlike`` / DuckDB
    ``regexp_matches`` (keep patterns RE2 ∩ Java-regex compatible)."""
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc "
        f"WHERE regexp_matches(term, '{pattern}') GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def variations_sql(forms: list[str], k: int = 10) -> str:
    """Variations — the form list is a pure function of the query word
    (analysis/morph.py), embedded literally; membership in the term dict is
    applied by the IN filter itself."""
    return or_sql(forms, k=k)


def date_range_and_sql(term: str, epoch0: int, step: int, lo: int, hi: int,
                       k: int = 10) -> str:
    """And(Term, DateRange(warc_ts)) where warc_ts = epoch0 + doc_id*step
    seconds (the deterministic synthetic timestamp both engines derive).
    Engine And semantics: term score + constant 1.0."""
    sel = f"""
      SELECT doc_id, score + 1.0 AS score FROM sc
      WHERE term = '{term}'
        AND ({epoch0} + doc_id * {step}) >= {lo}
        AND ({epoch0} + doc_id * {step}) <= {hi}
    """
    return base_ctes() + topk(sel, k)


def span_first_sql(term: str, limit: int, k: int = 10) -> str:
    """SpanFirst(Term, limit): term occurs at token position <= limit."""
    match = (
        f"pm AS (SELECT DISTINCT doc_id FROM tokf "
        f"WHERE term = '{term}' AND pos <= {limit})"
    )
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term = '{term}' GROUP BY s.doc_id"
    )
    return base_ctes(match) + topk(sel, k)


def span_near_sql(a: str, b: str, slop: int, ordered: bool, k: int = 10) -> str:
    """SpanNear of two unit (term) spans within ``slop`` tokens."""
    fwd = f"(pb.pos > pa.pos AND pb.pos - pa.pos <= {slop})"
    rev = f"(pa.pos > pb.pos AND pa.pos - pb.pos <= {slop})"
    cond = fwd if ordered else f"({fwd} OR {rev})"
    match = f"""pm AS (
  SELECT DISTINCT pa.doc_id
  FROM (SELECT doc_id, pos FROM tokf WHERE term = '{a}') pa
  JOIN (SELECT doc_id, pos FROM tokf WHERE term = '{b}') pb
    ON pb.doc_id = pa.doc_id AND {cond}
)"""
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term IN ('{a}', '{b}') GROUP BY s.doc_id"
    )
    return base_ctes(match) + topk(sel, k)


def span_near2_sql(words: list[str], slop: int, k: int = 10) -> str:
    """Ordered SpanNear2 chain of unit (term) spans: each next term within
    ``slop`` tokens AFTER the previous.  Mirrors the engine's left-nested
    binary desugar (ast.SpanNear2): when ordered, the combined span's end
    is the previous term's position, so the pairwise gap conditions chain
    directly."""
    joins = [f"(SELECT doc_id, pos FROM tokf WHERE term = '{w}') p{i}"
             for i, w in enumerate(words)]
    conds = [
        f"p{i}.doc_id = p0.doc_id AND p{i}.pos > p{i-1}.pos "
        f"AND p{i}.pos - p{i-1}.pos <= {slop}"
        for i in range(1, len(words))
    ]
    match = ("pm AS (\n  SELECT DISTINCT p0.doc_id\n  FROM "
             + " , ".join(joins) + "\n  WHERE " + " AND ".join(conds) + "\n)")
    in_list = ", ".join(f"'{w}'" for w in words)
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term IN ({in_list}) GROUP BY s.doc_id"
    )
    return base_ctes(match) + topk(sel, k)


def _phrase_spans_cte(name: str, words: list[str]) -> str:
    """(doc_id, s, e) spans of a slop-1 phrase."""
    joins = [f"(SELECT doc_id, pos FROM tokf WHERE term = '{w}') q{i}"
             for i, w in enumerate(words)]
    conds = [f"q{i}.doc_id = q0.doc_id AND q{i}.pos = q0.pos + {i}"
             for i in range(1, len(words))]
    return (
        f"{name} AS (SELECT q0.doc_id, q0.pos AS s, q0.pos + {len(words)-1} AS e "
        f"FROM " + " , ".join(joins) + " WHERE " + " AND ".join(conds) + ")"
    )


def span_not_sql(a_words: list[str], b_words: list[str], k: int = 10) -> str:
    """SpanNot(Phrase(a), Phrase(b)): an a-span overlapping no b-span."""
    ctes = (
        _phrase_spans_cte("spa", a_words) + ",\n"
        + _phrase_spans_cte("spb", b_words) + ",\n"
        + """pm AS (
  SELECT DISTINCT sa.doc_id FROM spa sa
  WHERE NOT EXISTS (SELECT 1 FROM spb sb
                    WHERE sb.doc_id = sa.doc_id
                      AND sa.s <= sb.e AND sb.s <= sa.e)
)"""
    )
    ta = sorted(set(a_words))
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term IN ({_terms_in(ta)}) GROUP BY s.doc_id"
    )
    return base_ctes(ctes) + topk(sel, k)


def span_contains_sql(a_words: list[str], b_term: str, k: int = 10) -> str:
    """SpanContains(Phrase(a), Term(b)): an a-span containing a b position."""
    ctes = (
        _phrase_spans_cte("spa", a_words) + ",\n"
        + f"""pm AS (
  SELECT DISTINCT sa.doc_id FROM spa sa
  WHERE EXISTS (SELECT 1 FROM tokf tb
                WHERE tb.doc_id = sa.doc_id AND tb.term = '{b_term}'
                  AND sa.s <= tb.pos AND tb.pos <= sa.e)
)"""
    )
    ta = sorted(set(a_words))
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term IN ({_terms_in(ta)}) GROUP BY s.doc_id"
    )
    return base_ctes(ctes) + topk(sel, k)


def span_near_contains_sql(a: str, b: str, slop: int, inner: str,
                           k: int = 10) -> str:
    """SpanContains(SpanNear(Term a, Term b, slop, ordered), Term inner):
    combined near-spans (pa.pos, pb.pos) containing an ``inner`` position —
    exercises span-combinator nesting."""
    ctes = f"""spn AS (
  SELECT pa.doc_id, pa.pos AS s, pb.pos AS e
  FROM (SELECT doc_id, pos FROM tokf WHERE term = '{a}') pa
  JOIN (SELECT doc_id, pos FROM tokf WHERE term = '{b}') pb
    ON pb.doc_id = pa.doc_id AND pb.pos > pa.pos AND pb.pos - pa.pos <= {slop}
),
pm AS (
  SELECT DISTINCT sa.doc_id FROM spn sa
  WHERE EXISTS (SELECT 1 FROM tokf ti
                WHERE ti.doc_id = sa.doc_id AND ti.term = '{inner}'
                  AND sa.s <= ti.pos AND ti.pos <= sa.e)
)"""
    ta = sorted({a, b})
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term IN ({_terms_in(ta)}) GROUP BY s.doc_id"
    )
    return base_ctes(ctes) + topk(sel, k)


def span_or_sql(phrase_words: list[str], term: str, k: int = 10) -> str:
    """SpanOr([Phrase(a...), Term(t)]): union of the children's span sets —
    a doc matches when ANY child yields a span; score = sum of the UNION of
    the children's terms' BM25 (engine convention: the scoring side is the
    term union, regardless of which child matched)."""
    ctes = (
        _phrase_spans_cte("spa", phrase_words) + ",\n"
        + f"""pm AS (
  SELECT DISTINCT doc_id FROM spa
  UNION
  SELECT DISTINCT doc_id FROM tokf WHERE term = '{term}'
)"""
    )
    pw = sorted(set(phrase_words))
    # engine parity: a phrase child with ANY word absent from the lexicon
    # yields no span tree at all, so its words drop out of the scoring
    # union too (evaluate.py::_phrase_spans returns None) — gate the
    # phrase terms on all of them existing
    phrase_gate = (
        f"(s.term IN ({_terms_in(pw)}) AND (SELECT count(DISTINCT term) "
        f"FROM dfs WHERE term IN ({_terms_in(pw)})) = {len(pw)})"
    )
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term = '{term}' OR {phrase_gate} GROUP BY s.doc_id"
    )
    return base_ctes(ctes) + topk(sel, k)


def span_condition_sql(a_words: list[str], b_term: str, k: int = 10) -> str:
    """SpanCondition(Phrase(a...), Term(b)): a's spans survive wholesale in
    docs where b also matches (doc-level gate, b positions ignored); scored
    from a's terms only."""
    ctes = (
        _phrase_spans_cte("spa", a_words) + ",\n"
        + f"""pm AS (
  SELECT DISTINCT sa.doc_id FROM spa sa
  WHERE EXISTS (SELECT 1 FROM tokf tb
                WHERE tb.doc_id = sa.doc_id AND tb.term = '{b_term}')
)"""
    )
    ta = sorted(set(a_words))
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term IN ({_terms_in(ta)}) GROUP BY s.doc_id"
    )
    return base_ctes(ctes) + topk(sel, k)


def span_before_sql(a: str, b: str, k: int = 10) -> str:
    """SpanBefore(Term a, Term b): an occurrence of a before some b."""
    match = f"""pm AS (
  SELECT DISTINCT pa.doc_id
  FROM (SELECT doc_id, pos FROM tokf WHERE term = '{a}') pa
  JOIN (SELECT doc_id, pos FROM tokf WHERE term = '{b}') pb
    ON pb.doc_id = pa.doc_id AND pa.pos < pb.pos
)"""
    sel = (
        f"SELECT s.doc_id, sum(s.score) AS score FROM sc s JOIN pm USING (doc_id) "
        f"WHERE s.term = '{a}' GROUP BY s.doc_id"
    )
    return base_ctes(match) + topk(sel, k)


def nested_parent_sql(parent_pred: str, child_term: str, score_fn: str = "sum",
                      k: int = 10) -> str:
    """NestedParent block join: parents from ``parent_pred`` over documents,
    blocks = [parent, next_parent), child matches aggregated per block."""
    agg = {"sum": "sum", "max": "max", "avg": "avg"}[score_fn]
    ctes = f"""par AS (
  SELECT doc_id AS parent,
         lead(doc_id) OVER (ORDER BY doc_id) AS nxt
  FROM documents WHERE {parent_pred}
),
kids AS (SELECT doc_id, score FROM sc WHERE term = '{child_term}')"""
    sel = f"""
      SELECT p.parent AS doc_id, {agg}(k.score) AS score
      FROM kids k JOIN par p
        ON k.doc_id > p.parent AND (p.nxt IS NULL OR k.doc_id < p.nxt)
      GROUP BY p.parent
    """
    return base_ctes(ctes) + topk(sel, k)


def nested_children_sql(parent_pred: str, child_term: str, k: int = 10) -> str:
    ctes = f"""par AS (
  SELECT doc_id AS parent,
         lead(doc_id) OVER (ORDER BY doc_id) AS nxt
  FROM documents WHERE {parent_pred}
)"""
    sel = f"""
      SELECT s.doc_id, s.score FROM sc s
      WHERE s.term = '{child_term}'
        AND EXISTS (SELECT 1 FROM par p
                    WHERE s.doc_id > p.parent
                      AND (p.nxt IS NULL OR s.doc_id < p.nxt))
    """
    return base_ctes(ctes) + topk(sel, k)


def _dfr_ctes(model: str) -> str:
    """sc CTE with a DFR model score (execution/score.py::dfree_score /
    pl2_score operation order: log2(x) = ln(x)/LN2, same literals)."""
    if model == "dfree":
        formula = f"""
         (t.tf * (ln(((t.tf + 1.0) / (q.dl + 1.0)) / (t.tf / q.dl)) / {LN2}))
         * (  t.tf * (ln((t.tf / q.dl) * ((SELECT fl FROM fls) / c.cf)) / {LN2})
            + (t.tf + 1.0) * (ln(((t.tf + 1.0) / (q.dl + 1.0)) * ((SELECT fl FROM fls) / c.cf)) / {LN2})
            + 0.5 * (ln(((t.tf + 1.0) / (q.dl + 1.0)) / (t.tf / q.dl)) / {LN2}))"""
    elif model == "pl2":
        TF = f"(t.tf * (ln(1.0 + (SELECT avgdl FROM ad) / q.dl) / {LN2}))"
        formula = f"""
         (1.0 / ({TF} + 1.0))
         * (  {TF} * (ln(1.0 / (c.cf / (SELECT n FROM nn))) / {LN2})
            + (c.cf / (SELECT n FROM nn)) * {LOG2_E}
            + 0.5 * (ln({TWO_PI} * {TF}) / {LN2})
            + {TF} * ((ln({TF}) / {LN2}) - {LOG2_E}))"""
    elif model == "tfidf":
        formula = "t.tf * (ln((SELECT n FROM nn) / (d.df + 1)) + 1)"
    else:
        raise ValueError(model)
    dfs_join = "JOIN dfs d USING (term)" if model == "tfidf" else ""
    return f"""
cfs AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tfs GROUP BY term),
fls AS (SELECT sum(len_raw)::DOUBLE AS fl FROM dl),
scw AS (
  SELECT t.doc_id, t.term, {formula} AS score
  FROM tfs t JOIN dlq q USING (doc_id) JOIN cfs c USING (term) {dfs_join}
)"""


def weighting_or_sql(model: str, terms: list[str], reverse: bool = False,
                     k: int = 10) -> str:
    """Or query under an alternative weighting model (optionally reversed)."""
    neg = "0.0 - " if reverse else ""
    src = "sc" if model == "bm25" else "scw"
    sel = (
        f"SELECT doc_id, {neg}sum(score) AS score FROM {src} "
        f"WHERE term IN ({_terms_in(terms)}) GROUP BY doc_id"
    )
    extra = "" if model == "bm25" else _dfr_ctes(model)
    return base_ctes(extra) + topk(sel, k)


def weighted_and_sql(model: str, wterm: str, bterm: str, k: int = 10) -> str:
    """WeightingQuery oracle (``wrappers.py ≈L160``): And of a term scored
    under ``model`` (DFR CTE) and a term scored under BM25; And semantics =
    intersection, score = sum of the two branch scores."""
    sel = f"""
      SELECT w.doc_id, w.score + b.score AS score
      FROM (SELECT doc_id, score FROM scw WHERE term = '{wterm}') w
      JOIN (SELECT doc_id, score FROM sc WHERE term = '{bterm}') b USING (doc_id)
    """
    return base_ctes(_dfr_ctes(model)) + topk(sel, k)


def boosted_term_sql(token: str, mod: int = 3, k: int = 10) -> str:
    """PositionBoosts-format oracle (``formats.py::PositionBoosts ≈L300``):
    a synthetic ``token^boost`` marker (boost = doc_id % mod + 1) is
    prepended to every doc; BM25 scores the marked term with weight = its
    boost instead of tf.  Mirrors __spark_entry__._boost_searcher's corpus
    byte-for-byte; single-digit boosts tokenize to a <2-char token the
    minsize filter drops, so dl/df agree with the engine's stripped chain."""
    return f"""
WITH docs2 AS (
  SELECT doc_id,
         '{token}^' || CAST(doc_id % {mod} + 1 AS INT) || ' ' || text AS text,
         (doc_id % {mod} + 1)::DOUBLE AS bw
  FROM documents
),
tok AS (
  SELECT doc_id, lower(toks[i]) AS term
  FROM (SELECT doc_id, regexp_extract_all(text, '{TOKEN_PATTERN_RE2_UNI}') AS toks FROM docs2),
       UNNEST(generate_series(1, len(toks))) AS u(i)
),
tokf AS (SELECT * FROM tok WHERE length(term) >= 2 AND term NOT IN ({_STOPS})),
dl AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS len_raw
  FROM docs2 d LEFT JOIN tokf t USING (doc_id) GROUP BY d.doc_id
),
quant(lo, hi, qlen) AS (SELECT * FROM (VALUES {_quant_values()}) v(lo, hi, qlen)),
dlq AS (
  SELECT dl.doc_id, q.qlen::DOUBLE AS dl
  FROM dl JOIN quant q ON dl.len_raw BETWEEN q.lo AND q.hi
),
nn AS (SELECT count(*)::DOUBLE AS n FROM docs2),
ad AS (SELECT sum(len_raw)::DOUBLE / count(*) AS avgdl FROM dl),
tfs AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokf GROUP BY doc_id, term),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM tfs GROUP BY term),
wts AS (
  SELECT t.doc_id, t.term,
         CASE WHEN t.term = '{token}' THEN d2.bw ELSE t.tf END AS w
  FROM tfs t JOIN docs2 d2 USING (doc_id)
),
sc AS (
  SELECT t.doc_id, t.term,
         (ln((SELECT n FROM nn) / (d.df + 1)) + 1)
         * ((t.w * ({BM25_K1} + 1.0))
            / (t.w + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * q.dl / (SELECT avgdl FROM ad)))) AS score
  FROM wts t JOIN dfs d USING (term) JOIN dlq q USING (doc_id)
)
""" + topk(f"SELECT doc_id, score FROM sc WHERE term = '{token}'", k)


# ---------------------------------------------------------------------------
# Facet variants (MultiFacet / FunctionFacet / DateRangeFacet /
# StoredFieldFacet) and parser-plugin query shapes (GtLt, PlusMinus,
# MultifieldParser-DisMax, dateparse-lite).
# ---------------------------------------------------------------------------


def facet_multi_sql(term: str, cols: list[str]) -> str:
    collist = ", ".join(f"d.{c} AS {c}" for c in cols)
    group = ", ".join(f"d.{c}" for c in cols)
    return base_ctes() + f"""
      SELECT {collist}, count(*)::BIGINT AS n
      FROM (SELECT DISTINCT doc_id FROM sc WHERE term = '{term}') m
      JOIN documents d USING (doc_id) GROUP BY {group}
    """


def facet_function_sql(term: str, expr: str, name: str = "bucket") -> str:
    return base_ctes() + f"""
      SELECT {expr} AS {name}, count(*)::BIGINT AS n
      FROM (SELECT DISTINCT doc_id FROM sc WHERE term = '{term}') m
      JOIN documents d USING (doc_id) GROUP BY 1
    """


def facet_daterange_sql(term: str, epoch0: int, step: int, start: int,
                        end: int, gap: int) -> str:
    """DateRangeFacet over the synthetic warc_ts = epoch0 + doc_id*step."""
    import math
    nbins = int(math.ceil((end - start) / gap))
    ts = f"({epoch0} + d.doc_id * {step})"
    return base_ctes() + f"""
      SELECT CASE WHEN {ts} < {start} THEN -1
                  WHEN {ts} >= {end} THEN {nbins}
                  ELSE CAST(floor(({ts} - {start}) / {gap}) AS INT) END AS bin,
             count(*)::BIGINT AS n
      FROM (SELECT DISTINCT doc_id FROM sc WHERE term = '{term}') m
      JOIN documents d USING (doc_id) GROUP BY 1
    """


def facet_stored_split_sql(term: str, concat_expr: str) -> str:
    """StoredFieldFacet w/ allow_overlap: each doc counts toward every value
    of the split multi-valued string (``concat_expr`` rebuilds the stored
    column, e.g. ``d.source || ',' || d.lang``)."""
    return base_ctes() + f"""
      SELECT u.value AS value, count(*)::BIGINT AS n
      FROM (SELECT m.doc_id, unnest(string_split({concat_expr}, ',')) AS value
            FROM (SELECT DISTINCT doc_id FROM sc WHERE term = '{term}') m
            JOIN documents d USING (doc_id)) u
      GROUP BY u.value
    """


def and_term_gte_range_sql(term: str, lo: str, k: int = 10) -> str:
    """And(Term, TermRange(lo, None)) — the GtLt plugin's ``>=lo`` shape."""
    sel = f"""
      SELECT a.doc_id, a.s + b.s AS score FROM
        (SELECT doc_id, score AS s FROM sc WHERE term = '{term}') a
        JOIN (SELECT doc_id, sum(score) AS s FROM sc WHERE term >= '{lo}'
              GROUP BY doc_id) b USING (doc_id)
    """
    return base_ctes() + topk(sel, k)


def plusminus_sql(should: str, plus: str, minus: str, k: int = 10) -> str:
    """SimpleParser/PlusMinus: score from the optional term, +term required
    (unscored), -term excluded."""
    sel = f"""
      SELECT doc_id, score FROM sc WHERE term = '{should}'
        AND doc_id IN (SELECT doc_id FROM sc WHERE term = '{plus}')
        AND doc_id NOT IN (SELECT doc_id FROM sc WHERE term = '{minus}')
    """
    return base_ctes() + topk(sel, k)


def multifield_dismax_sql(term: str, fieldboosts: dict[str, float],
                          fields: dict[str, str], tiebreak: float = 0.0,
                          k: int = 10) -> str:
    """DisMaxParser: one term searched across fields, best-field scoring."""
    unions = " UNION ALL ".join(
        f"SELECT doc_id, score * {float(fieldboosts.get(f, 1.0))} AS s "
        f"FROM sc_{f} WHERE term = '{term}'"
        for f in sorted(fields)
    )
    sel = (
        f"SELECT doc_id, max(s) + {tiebreak} * (sum(s) - max(s)) AS score "
        f"FROM ({unions}) GROUP BY doc_id"
    )
    return fielded_base(fields) + topk(sel, k)


def date_range_iso_and_sql(term: str, epoch0: int, step: int, lo: int,
                           hi: int, incl_hi: bool, k: int = 10) -> str:
    """And(Term, DateRange) with parser-resolved epoch bounds."""
    op_hi = "<=" if incl_hi else "<"
    sel = f"""
      SELECT doc_id, score + 1.0 AS score FROM sc
      WHERE term = '{term}'
        AND ({epoch0} + doc_id * {step}) >= {lo}
        AND ({epoch0} + doc_id * {step}) {op_hi} {hi}
    """
    return base_ctes() + topk(sel, k)


def biword_term_sql(term: str, k: int = 10) -> str:
    """Term query over a BiWordFilter index: adjacent FILTERED tokens join
    as "a-b" shingles with renumbered positions; the whole stats pipeline
    (lengths, avgdl, df, BM25) re-derives over the pair stream."""
    idx = ("SELECT doc_id, term, row_number() OVER "
           "(PARTITION BY doc_id ORDER BY pos) - 1 AS idx FROM tokf")
    ctes = f"""tokb AS (
  SELECT a.doc_id, a.term || '-' || b.term AS term, a.idx AS pos
  FROM ({idx}) a JOIN ({idx}) b
    ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
  UNION ALL
  -- lone-token docs emit the single token (upstream BiWordFilter rule)
  SELECT doc_id, min(term) AS term, 0 AS pos FROM tokf
  GROUP BY doc_id HAVING count(*) = 1
),
dlb AS (
  SELECT d.doc_id, count(t.term)::BIGINT AS len_raw
  FROM documents d LEFT JOIN tokb t USING (doc_id) GROUP BY d.doc_id
),
dlqb AS (
  SELECT dl.doc_id, dl.len_raw, q.qlen::DOUBLE AS dl
  FROM dlb dl JOIN quant q ON dl.len_raw BETWEEN q.lo AND q.hi
),
adb AS (SELECT sum(len_raw)::DOUBLE / count(*) AS avgdl FROM dlb),
tfsb AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokb GROUP BY doc_id, term),
dfsb AS (SELECT term, count(*)::BIGINT AS df FROM tfsb GROUP BY term),
scb AS (
  SELECT t.doc_id, t.term,
         (ln((SELECT n FROM nn) / (d.df + 1)) + 1)
         * ((t.tf * ({BM25_K1} + 1.0))
            / (t.tf + {BM25_K1} * ((1.0 - {BM25_B}) + {BM25_B} * q.dl / (SELECT avgdl FROM adb)))) AS score
  FROM tfsb t JOIN dfsb d USING (term) JOIN dlqb q USING (doc_id)
)"""
    sel = f"SELECT doc_id, score FROM scb WHERE term = '{term}'"
    return base_ctes(ctes) + topk(sel, k)


def matched_terms_sql(terms: list[str], k: int = 10) -> str:
    """search(terms=True): top-k + sorted comma-joined matched query terms."""
    base = (f"SELECT doc_id, sum(score) AS score FROM sc "
            f"WHERE term IN ({_terms_in(terms)}) GROUP BY doc_id")
    return base_ctes() + f"""
      SELECT t.doc_id, round(t.score, 6) AS score,
             (SELECT array_to_string(list_sort(list(DISTINCT s.term)), ',')
              FROM sc s WHERE s.doc_id = t.doc_id
                AND s.term IN ({_terms_in(terms)})) AS matched
      FROM ({base}) t ORDER BY score DESC, doc_id ASC LIMIT {k}
    """


def phrase_freq_sql(words: list[str], slop: int = 1, k: int = 10) -> str:
    """Phrase scored by PHRASE FREQUENCY (Phrase(scoring="freq")): tf =
    distinct end positions of the adjacency chain, idf from the phrase's own
    doc frequency, BM25 shape identical to the term scorer."""
    joins = []
    for i in range(len(words)):
        joins.append(f"(SELECT doc_id, pos FROM tokf WHERE term = '{words[i]}') p{i}")
    cond = []
    for i in range(1, len(words)):
        cond.append(
            f"p{i}.doc_id = p0.doc_id AND p{i}.pos > p{i-1}.pos AND p{i}.pos <= p{i-1}.pos + {slop}"
        )
    last = len(words) - 1
    match = (
        f"pm AS (SELECT p0.doc_id, count(DISTINCT p{last}.pos)::DOUBLE AS ptf FROM "
        + " , ".join(joins)
        + " WHERE "
        + " AND ".join(cond)
        + " GROUP BY p0.doc_id), "
        + "pdf AS (SELECT count(*)::BIGINT AS df FROM pm)"
    )
    sel = f"""
      SELECT m.doc_id,
             (ln((SELECT n FROM nn) / ((SELECT df FROM pdf) + 1)) + 1)
             * ((m.ptf * ({BM25_K1} + 1.0))
                / (m.ptf + {BM25_K1} * ((1.0 - {BM25_B})
                   + {BM25_B} * q.dl / (SELECT avgdl FROM ad)))) AS score
      FROM pm m JOIN dlq q USING (doc_id)
    """
    return base_ctes(match) + topk(sel, k)


# ---------------------------------------------------------------------------
# Wrapper / constant-score query shapes (round-2 completion: driver entries
# for the previously pytest-only ops — Not-in-And, Require, Otherwise,
# Every, ConstantScore, boosted children, Frequency weighting).
# ---------------------------------------------------------------------------


def and_with_not_sql(a: str, b: str, k: int = 10) -> str:
    """``And([Term(a), Not(Term(b))])``: the Not child evaluates to the
    complement doc-set with constant score 1.0 (evaluate.py::_eval_not), and
    And sums child scores — so matches score ``score(a) + 1.0``."""
    sel = (
        f"SELECT doc_id, score + 1.0 AS score FROM sc WHERE term = '{a}' "
        f"AND doc_id NOT IN (SELECT doc_id FROM sc WHERE term = '{b}')"
    )
    return base_ctes() + topk(sel, k)


def require_sql(a_terms: list[str], b_term: str, k: int = 10) -> str:
    """``Require(Or(a_terms), Term(b))``: left semi — must match both sides,
    score from the a side only (``compound.py::Require ≈L660``)."""
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc "
        f"WHERE term IN ({_terms_in(a_terms)}) "
        f"AND doc_id IN (SELECT doc_id FROM sc WHERE term = '{b_term}') "
        f"GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def every_sql(k: int = 10) -> str:
    """``Every()``: all docs, constant score 1.0, doc_id tie-break."""
    return topk("SELECT doc_id, 1.0 AS score FROM documents", k)


def constant_score_sql(term: str, score: float, k: int = 10) -> str:
    """``Constant(Term(term), score)``: matching docs with a fixed score."""
    sel = (
        f"SELECT DISTINCT doc_id, {float(score)} AS score FROM sc "
        f"WHERE term = '{term}'"
    )
    return base_ctes() + topk(sel, k)


def boosted_or_sql(term_boosts: list[tuple[str, float]], k: int = 10) -> str:
    """``Or`` with per-child boosts: each child's BM25 score is multiplied
    by its boost before the per-doc sum (boost on every node)."""
    case = " ".join(
        f"WHEN term = '{t}' THEN score * {float(b)}" for t, b in term_boosts)
    sel = (
        f"SELECT doc_id, sum(CASE {case} END) AS score FROM sc "
        f"WHERE term IN ({_terms_in([t for t, _ in term_boosts])}) "
        f"GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def frequency_or_sql(terms: list[str], k: int = 10) -> str:
    """Or under the Frequency model (``scoring.py::Frequency ≈L280``):
    score = raw weight (tf)."""
    sel = (
        f"SELECT doc_id, sum(tf) AS score FROM tfs "
        f"WHERE term IN ({_terms_in(terms)}) GROUP BY doc_id"
    )
    return base_ctes() + topk(sel, k)


def correct_query_sql(unknown_word: str, suffix: str, maxdist: int = 2) -> str:
    """Corrected query string for ``Searcher.correct_query``: the top
    correction for the one unknown word (most frequent within levenshtein
    ``maxdist``, sharing the first char — same ordering as spelling_sql)
    concatenated with the untouched remainder of the query string."""
    return base_ctes() + f"""
      SELECT (SELECT t.term
              FROM (SELECT term, sum(tf)::BIGINT AS cf FROM tfs GROUP BY term) t
              WHERE levenshtein(t.term, '{unknown_word}') <= {maxdist}
                AND t.term LIKE '{_like_escape(unknown_word[:1])}%' ESCAPE '\\'
              ORDER BY t.cf DESC, t.term ASC LIMIT 1) || '{suffix}' AS corrected
    """


def more_like_sql(doc_ids: list[int], numterms: int = 5, k: int = 10) -> str:
    """``Searcher.more_like``: Or over the doc set's top key terms (tf·idf
    keyness, key_terms_sql ranking), excluding the source docs."""
    ids = ", ".join(str(d) for d in doc_ids)
    extra = f"""
kt AS (
  SELECT t.term
  FROM tfs t JOIN dfs d USING (term)
  WHERE t.doc_id IN ({ids})
  GROUP BY t.term, d.df
  ORDER BY sum(t.tf) * (ln((SELECT n FROM nn) / (d.df + 1)) + 1) DESC, t.term ASC
  LIMIT {numterms}
)"""
    sel = (
        f"SELECT doc_id, sum(score) AS score FROM sc "
        f"WHERE term IN (SELECT term FROM kt) AND doc_id NOT IN ({ids}) "
        f"GROUP BY doc_id"
    )
    return base_ctes(extra) + topk(sel, k)


def highlight_upper_sql(term: str, k: int = 5) -> str:
    """WholeFragmenter + UppercaseFormatter over the top-k docs of a term
    query (``src/whoosh/highlight.py::UppercaseFormatter ≈L480``): every
    analyzed-token occurrence of the term is uppercased in the stored text.
    ``\\b`` agrees with the tokenizer on this corpus (no dotted tokens; _
    is \\w on both sides, - breaks tokens on both sides).  ``(?i)`` because
    the engine matches ANALYZED (lowercased) tokens, so a capitalized
    occurrence ('Data') is uppercased too — and upper(any case variant)
    equals upper(term), so the literal replacement stays exact."""
    sel = f"SELECT doc_id, score FROM sc WHERE term = '{term}'"
    return base_ctes() + f"""
      SELECT t.doc_id,
             regexp_replace(d.text, '(?i)\\b{term}\\b', '{term.upper()}', 'g') AS hl
      FROM (SELECT doc_id FROM ({sel})
            ORDER BY round(score, 6) DESC, doc_id ASC LIMIT {k}) t
      JOIN documents d USING (doc_id)
    """


def highlight_pinpoint_sql(term: str, k: int = 5, surround: int = 20) -> str:
    """PinpointFragmenter + UppercaseFormatter, first-occurrence fragment
    (``src/whoosh/highlight.py::PinpointFragmenter ≈L430``): the engine takes
    hit spans from the PERSISTED char-offsets segment and, at
    ``maxchars=len(term)``, every group is a single hit, so the first
    fragment is exactly ``text[max(0, s-surround) : s+len+surround]`` with
    the matched span uppercased (``s`` = first analyzed occurrence).  The
    oracle finds ``s`` via the lazy-prefix capture — ``(?is)`` because the
    engine matches ANALYZED (lowercased) tokens across newlines; the ``\\b``
    agreement argument is highlight_upper_sql's (this corpus has no dotted
    tokens, ``_`` is ``\\w`` and ``-`` breaks tokens on both engines)."""
    L = len(term)
    sel = f"SELECT doc_id, score FROM sc WHERE term = '{term}'"
    return base_ctes() + f"""
      , pin AS (
        SELECT t.doc_id, d.text,
               length(regexp_extract(d.text,
                      '(?is)^(.*?)\\b{term}\\b', 1)) AS s
        FROM (SELECT doc_id FROM ({sel})
              ORDER BY round(score, 6) DESC, doc_id ASC LIMIT {k}) t
        JOIN documents d USING (doc_id))
      SELECT doc_id,
             substr(text, greatest(1, s + 1 - {surround}),
                    s - greatest(0, s - {surround}))
             || upper(substr(text, s + 1, {L}))
             || substr(text, s + 1 + {L},
                       least(length(text), s + {L} + {surround}) - (s + {L}))
               AS hl
      FROM pin
    """
