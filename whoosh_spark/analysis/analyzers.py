"""Pure-Python StandardAnalyzer-equivalent chain.

Semantics (SURVEY.md §2.2, citing upstream whoosh
``src/whoosh/analysis/analyzers.py::StandardAnalyzer (≈L110)``):

    RegexTokenizer(r"\\w+(\\.?\\w+)*", re.UNICODE)
      | LowercaseFilter            (CPython str.lower)
      | StopFilter(STOP_WORDS, minsize=2)

Load-bearing details:

* **positions are the tokenizer match ordinals** — StopFilter removes tokens
  WITHOUT renumbering, so position gaps remain (Phrase adjacency must respect
  them; ``src/whoosh/analysis/filters.py::StopFilter ≈L260``).
* lowercase happens BEFORE the stop/minsize check (chain order), and the
  minsize test applies to the lowered text.
* CPython ``re`` (Unicode ``\\w``) and CPython ``str.lower()`` are the
  byte-identity contract (input_hint); the Spark UDF in ``udfs.py`` calls
  THIS function per document so the two can never diverge.

This module is also the analysis half of the pytest oracle.
"""

from __future__ import annotations

import re

from whoosh_spark.config import MIN_WORD_SIZE, STOP_WORDS, TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN, re.UNICODE)

# Non-capturing form of the SAME pattern (TOKEN_PATTERN_RE2 is the exact
# ``(?:``-rewrite config.py maintains for the DuckDB oracle): with no groups,
# ``findall`` returns full-match strings directly, ~1.6× faster than
# finditer + m.group(0) on the CPython hot path.  Matches are provably
# identical — ``(?:)`` only suppresses capture, never changes the automaton —
# and the parity suite pins both chains to the same output.
from whoosh_spark.config import TOKEN_PATTERN_RE2 as _TP_NC

_TOKEN_RE_NC = re.compile(_TP_NC, re.UNICODE)


def tokenize_raw(text: str) -> list[str]:
    """RegexTokenizer output only (no lowercase/stop) — match ordinal = index."""
    if not text:
        return []
    return _TOKEN_RE_NC.findall(text)


def ngram_tokens(text: str, minsize: int = 2, maxsize: int = 4,
                 lower: bool = True) -> list[str]:
    """NgramTokenizer (``src/whoosh/analysis/ngrams.py::NgramTokenizer
    ≈L30``): character n-grams of the raw text, n in [minsize, maxsize] —
    substring-search indexing (NGRAM field type)."""
    if lower:
        text = text.lower()
    out: list[str] = []
    n_ch = len(text)
    for n in range(minsize, maxsize + 1):
        out.extend(text[i:i + n] for i in range(0, n_ch - n + 1))
    return out


def ngram_words(text: str, minsize: int = 2, maxsize: int = 4) -> list[str]:
    """NGRAMWORDS analog: tokenize first, then n-gram each token."""
    out: list[str] = []
    for tok in tokenize_raw(text):
        out.extend(ngram_tokens(tok, minsize, maxsize))
    return out


def analyze_text_ngram(text: str) -> tuple[list[str], list[int]]:
    """NGRAMWORDS field chain (``src/whoosh/fields.py::NGRAMWORDS ≈L1150``:
    RegexTokenizer | Lowercase | NgramFilter(2, 4)): every word expands to
    its char 2..4-grams, ALL carrying the word's tokenizer ordinal as
    position (NgramFilter does not renumber) — substring search indexing.
    No stop/minsize word filter (1-char words simply yield no grams)."""
    toks: list[str] = []
    poss: list[int] = []
    for i, word in enumerate(tokenize_raw(text)):
        grams = ngram_tokens(word, 2, 4)
        toks.extend(grams)
        poss.extend([i] * len(grams))
    return toks, poss


def analyze_text_stemming(text: str) -> tuple[list[str], list[int]]:
    """StemmingAnalyzer chain (``src/whoosh/analysis/analyzers.py::
    StemmingAnalyzer``): RegexTokenizer | Lowercase | Stop | StemFilter
    (Porter).  Same position semantics as the standard chain."""
    from whoosh_spark.analysis.porter import stem

    tokens, positions = analyze_text(text)
    return [stem(t) for t in tokens], positions


def fold_accents(token: str) -> str:
    """CharsetFilter-style accent folding (``analysis/filters.py::
    CharsetFilter ≈L300``): NFKD-decompose and drop combining marks."""
    import unicodedata

    return "".join(
        c for c in unicodedata.normalize("NFKD", token)
        if not unicodedata.combining(c)
    )


def charset_tokenize(text: str, charmap=None) -> list[str]:
    """CharsetTokenizer (``src/whoosh/analysis/tokenizers.py::
    CharsetTokenizer ≈L300``): loops char by char through a character map —
    a char mapping to None is a token BREAK, any other char is appended
    TRANSLATED (case/accent folding fused into tokenization, unlike
    CharsetFilter which folds after a regex tokenizer).

    The default map translates word chars (``\\w`` semantics: alnum + _)
    to their lowercased accent-fold and breaks on everything else; a
    combining mark folds to '' (skipped, NOT a break) so decomposed
    "cafe\\u0301" tokenizes identically to composed "café"."""
    if charmap is None:
        charmap = _default_charmap
    tokens: list[str] = []
    cur: list[str] = []

    def flush():
        # a run of only-folding chars (e.g. a lone combining mark between
        # breaks) joins to "" — never emit a phantom empty token
        t = "".join(cur)
        if t:
            tokens.append(t)
        cur.clear()

    for ch in text:
        t = charmap(ch)
        if t is None:
            flush()
        else:
            cur.append(t)
    flush()
    return tokens


def _default_charmap(ch: str) -> str | None:
    if ch.isalnum() or ch == "_":
        return fold_accents(ch).lower()
    import unicodedata

    # a bare combining mark continues the current token (folds away)
    return "" if unicodedata.combining(ch) else None


def analyze_text_charset(text: str) -> tuple[list[str], list[int]]:
    """"charset" chain: CharsetTokenizer + stop filter at ordinal
    positions — the tokenizer-level folding twin of the standard chain
    (identical output on ASCII corpora, accent/case-fused elsewhere)."""
    if not text:
        return [], []
    tokens: list[str] = []
    positions: list[int] = []
    for pos, t in enumerate(charset_tokenize(text)):
        if len(t) >= MIN_WORD_SIZE and t not in STOP_WORDS:
            tokens.append(t)
            positions.append(pos)
    return tokens, positions


def substitute(token: str, pattern: str, replacement: str) -> str:
    """SubstitutionFilter (``analysis/filters.py::SubstitutionFilter
    ≈L430``): regex substitution applied to every token."""
    return re.sub(pattern, replacement, token)


def make_substitution_analyzer(pattern: str, replacement: str,
                               base=None) -> object:
    """StandardAnalyzer | SubstitutionFilter chain: the substitution runs
    AFTER the base chain, token-wise; empty results drop (position gaps
    remain, same as StopFilter)."""
    base_fn = base or analyze_text
    pat = re.compile(pattern)

    def analyze(text: str) -> tuple[list[str], list[int]]:
        toks, poss = base_fn(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(toks, poss):
            s = pat.sub(replacement, t)
            if s:
                out_t.append(s)
                out_p.append(p)
        return out_t, out_p

    return analyze


def strip_token(token: str, chars: str | None = None) -> str:
    """StripFilter (``analysis/filters.py::StripFilter ≈L450``)."""
    return token.strip(chars)


def analyze_text_reversed(text: str) -> tuple[list[str], list[int]]:
    """StandardAnalyzer | ReverseTextFilter (``analysis/filters.py::
    ReverseTextFilter ≈L460``): each token reversed — the classic
    leading-wildcard trick (index reversed terms, query ``*suffix`` as a
    reversed Prefix)."""
    toks, poss = analyze_text(text)
    return [t[::-1] for t in toks], poss


_DELIM_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$", re.S)


def parse_delimited_boost(token: str, delimiter: str = "^") -> tuple[str, float]:
    """DelimitedAttributeFilter (``analysis/filters.py::
    DelimitedAttributeFilter ≈L470``): split a trailing ``^boost`` payload
    off a raw token; returns (text, boost) with boost 1.0 when absent."""
    if delimiter == "^":
        m = _DELIM_BOOST_RE.match(token)
    else:
        m = re.match(rf"^(.+){re.escape(delimiter)}(\d+(?:\.\d+)?)$", token, re.S)
    if m:
        return m.group(1), float(m.group(2))
    return token, 1.0


def analyze_text_boosts(text: str) -> tuple[list[str], list[int], list[float]]:
    """Whitespace-split ``word^boost`` attributes, then the standard chain
    per word (KeywordAnalyzer+DelimitedAttributeFilter composition used by
    boosted-tag fields): returns (tokens, positions, boosts).  Tokens a
    word expands to share its boost; position = source-word ordinal."""
    toks: list[str] = []
    poss: list[int] = []
    boosts: list[float] = []
    for pos, raw in enumerate(text.split()):
        word, b = parse_delimited_boost(raw)
        ts, _ = analyze_text(word)
        for t in ts:
            toks.append(t)
            poss.append(pos)
            boosts.append(b)
    return toks, poss, boosts


def analyze_text_boosted(text: str) -> tuple[list[str], list[int]]:
    """The token stream of ``analyze_text_boosts`` without the boost channel
    — the index-side analyzer that pairs with a ``boosts.token_boost_overlay``
    side table (registry name ``"boosted"``)."""
    toks, poss, _ = analyze_text_boosts(text)
    return toks, poss


def analyze_text(text: str) -> tuple[list[str], list[int]]:
    """Full chain: returns (tokens, positions) with stop-gap position semantics.

    ``len(tokens)`` is the document's field length (post-stop token count),
    exactly what Whoosh writes per doc (SURVEY.md §2.3 field lengths).
    """
    if not text:
        return [], []
    tokens: list[str] = []
    positions: list[int] = []
    for pos, t in enumerate(_TOKEN_RE_NC.findall(text)):
        t = t.lower()
        if len(t) >= MIN_WORD_SIZE and t not in STOP_WORDS:
            tokens.append(t)
            positions.append(pos)
    return tokens, positions


def analyze_text_spans(text: str) -> list[tuple[str, int, int]]:
    """Characters-format mirror of :func:`analyze_text`: the SAME chain
    (tokenize → lower → minsize/stop), but emitting ``(term, startchar,
    endchar)`` per surviving token (``src/whoosh/analysis/tokenizers.py::
    RegexTokenizer ≈L140`` ``chars=True`` mode; ``formats.py::Characters
    ≈L250`` stores exactly these spans per posting).

    Invariant (tested): ``[t for t, _, _ in analyze_text_spans(x)] ==
    analyze_text(x)[0]`` — the offsets segment can never disagree with the
    postings about which occurrences exist.
    """
    if not text:
        return []
    out: list[tuple[str, int, int]] = []
    for m in _TOKEN_RE.finditer(text):
        t = m.group(0).lower()
        if len(t) >= MIN_WORD_SIZE and t not in STOP_WORDS:
            out.append((t, m.start(), m.end()))
    return out


def analyze_id(text: str) -> tuple[list[str], list[int]]:
    """IDTokenizer / ID field type (``analysis/tokenizers.py::IDTokenizer
    ≈L120``): the entire value is one untokenized term (exact-match keys
    like url); no lowercase, no stop filter."""
    if not text:
        return [], []
    return [text], [0]


def analyze_keyword(text: str, lower: bool = True,
                    commas: bool = False) -> tuple[list[str], list[int]]:
    """KeywordAnalyzer / CommaSeparatedTokenizer (``analysis/tokenizers.py::
    SpaceSeparatedTokenizer ≈L140`` / ``CommaSeparatedTokenizer ≈L150``):
    split on whitespace (or commas), optional lowercase, no stop filter."""
    if not text:
        return [], []
    parts = [p.strip() for p in text.split(",")] if commas else text.split()
    toks = [(p.lower() if lower else p) for p in parts if p]
    return toks, list(range(len(toks)))


def analyze_comma(text: str) -> tuple[list[str], list[int]]:
    return analyze_keyword(text, commas=True)


def analyze_path(text: str) -> tuple[list[str], list[int]]:
    """PathTokenizer (``analysis/tokenizers.py::PathTokenizer ≈L170``): every
    ancestor prefix of a /-path is a term, so a prefix query on /a/b matches
    all descendants with an exact term lookup."""
    if not text:
        return [], []
    parts = [p for p in text.split("/") if p]
    toks = ["/" + "/".join(parts[: i + 1]) for i in range(len(parts))]
    return toks, list(range(len(toks)))


_INTRA_SPLIT_RE = re.compile(
    r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|\d+", re.UNICODE)


def intraword_split(token: str, mergewords: bool = False,
                    mergenums: bool = False) -> list[str]:
    """IntraWordFilter subword extraction (``src/whoosh/analysis/intraword.py
    ::IntraWordFilter ≈L40``): split on case transitions (camelCase), letter↔
    digit boundaries and delimiters; ALL-CAPS runs stay whole ("XMLHttp" →
    XML, Http).  ``mergewords``/``mergenums`` additionally emit the
    concatenation of adjacent alpha / numeric subwords."""
    parts = _INTRA_SPLIT_RE.findall(token)
    out = list(parts)
    if mergewords:
        run: list[str] = []
        for p in parts + [""]:
            if p and not p.isdigit():
                run.append(p)
            else:
                if len(run) > 1:
                    out.append("".join(run))
                run = []
    if mergenums:
        run = []
        for p in parts + [""]:
            if p and p.isdigit():
                run.append(p)
            else:
                if len(run) > 1:
                    out.append("".join(run))
                run = []
    return out


def analyze_text_intraword(text: str) -> tuple[list[str], list[int]]:
    """RegexTokenizer | IntraWordFilter | Lowercase | Stop.  Subwords share
    the parent token's position (phrase adjacency sees the original word
    ordinals; a camelCase word contributes several same-position terms)."""
    if not text:
        return [], []
    tokens: list[str] = []
    positions: list[int] = []
    for pos, w in enumerate(_TOKEN_RE_NC.findall(text)):
        for sub in intraword_split(w):
            t = sub.lower()
            if len(t) >= MIN_WORD_SIZE and t not in STOP_WORDS:
                tokens.append(t)
                positions.append(pos)
    return tokens, positions


def analyze_text_biword(text: str) -> tuple[list[str], list[int]]:
    """BiWordFilter chain (``analysis/intraword.py::BiWordFilter ≈L380``):
    standard analysis, then adjacent filtered tokens join as "a-b" shingles
    (phrase-as-term indexing); positions renumber over the pair sequence."""
    toks, _ = analyze_text(text)
    if len(toks) == 1:
        # upstream BiWordFilter emits the lone token when no pair can form —
        # a one-token doc must stay findable
        return toks, [0]
    pairs = [f"{toks[i]}-{toks[i+1]}" for i in range(len(toks) - 1)]
    return pairs, list(range(len(pairs)))


def analyze_text_adjacent_pairs(text: str) -> tuple[list[str], list[int]]:
    """Nextword/biword ACCELERATOR extractor (not an upstream chain): emits
    one "a b" token per pair of standard-chain tokens at CONSECUTIVE ordinal
    positions — an exact certificate for two-word slop-1 Phrase matches.

    This differs from :func:`analyze_text_biword` on purpose: BiWordFilter
    pairs adjacent *emitted* tokens, so a stop-word gap ("web the index")
    still forms "web-index" — right for upstream's phrase-as-term fields,
    wrong as a Phrase certificate (Phrase slop=1 honors the gap).  Here the
    pair forms only when ``pos[i+1] == pos[i] + 1``, so pair-term postings
    reproduce the Phrase(slop=1) doc set and per-doc occurrence count
    exactly (including repeated-word pairs like "data data").

    Design source: the published nextword-index technique for phrase
    querying (Williams, Zobel & Bahle, "Fast Phrase Querying with Combined
    Indexes", ACM TOIS 2004) — the separator is a space, which the
    tokenizer can never emit inside a term.
    """
    toks, poss = analyze_text(text)
    pairs: list[str] = []
    ppos: list[int] = []
    for i in range(len(toks) - 1):
        if poss[i + 1] == poss[i] + 1:
            pairs.append(f"{toks[i]} {toks[i+1]}")
            ppos.append(poss[i])
    return pairs, ppos


def make_hot_pairs_fn(hot):
    """Hot-constituent variant of :func:`analyze_text_adjacent_pairs`: emit
    a pair only when BOTH constituents are in ``hot`` (terms with df ≥ the
    index's ``pair_min_df``).  Rare-constituent phrases are already fast via
    the rare-slot candidate gate, so the accelerator only needs the hot×hot
    head — this collapses the pair dictionary from ~every distinct bigram
    (tens of millions at 1M docs; measured 11× the main index's merge cost)
    to the frequent-word head, the same restriction the combined-index
    literature applies.  The query router enforces the matching condition
    (both query-term dfs ≥ pair_min_df) before using the segment.

    ``hot`` may be a frozenset or a pyspark ``Broadcast`` of one: a small
    fractional threshold over a large vocabulary can make the set hundreds
    of MB, and a plain closure capture would re-pickle it into EVERY task —
    the broadcast spelling ships it once per executor (resolved lazily on
    first call, then cached in the closure cell)."""
    def fn(text: str) -> tuple[list[str], list[int]]:
        nonlocal hot
        if hasattr(hot, "value"):  # pyspark Broadcast → resolve once/task
            hot = hot.value
        toks, poss = analyze_text(text)
        pairs: list[str] = []
        ppos: list[int] = []
        for i in range(len(toks) - 1):
            if (poss[i + 1] == poss[i] + 1 and toks[i] in hot
                    and toks[i + 1] in hot):
                pairs.append(f"{toks[i]} {toks[i+1]}")
                ppos.append(poss[i])
        return pairs, ppos
    return fn


def analyze_text_adjacent_trigrams(text: str) -> tuple[list[str], list[int]]:
    """Ungated adjacent-trigram extractor — the registry fallback for the
    trigram sub-build's resume path.  Production builds always pass the
    hot-gated ``make_hot_trigrams_fn`` (an ungated trigram dictionary is
    unbounded); see that function for semantics."""
    toks, poss = analyze_text(text)
    tris: list[str] = []
    tpos: list[int] = []
    for i in range(len(toks) - 2):
        if poss[i + 1] == poss[i] + 1 and poss[i + 2] == poss[i] + 2:
            tris.append(f"{toks[i]} {toks[i+1]} {toks[i+2]}")
            tpos.append(poss[i])
    return tris, tpos


def make_hot_trigrams_fn(hot):
    """Hot-constituent adjacent-TRIGRAM extractor: emit "a b c" when the
    three standard-chain tokens sit at consecutive ordinals and ALL three
    are in ``hot`` — the 3-word extension of :func:`make_hot_pairs_fn`
    (same nextword-index design source, Williams/Zobel/Bahle TOIS 2004
    §combined indexes).  A trigram posting is an exact certificate for a
    3-word slop-1 Phrase match (doc set AND per-doc occurrence count), so
    the query router answers all-hot trigram phrases with one term lookup
    instead of three fat position decodes — the one phrase shape the pair
    segment still had to verify positionally.  ``hot`` may be a frozenset
    or a Broadcast of one (resolved lazily, see make_hot_pairs_fn)."""
    def fn(text: str) -> tuple[list[str], list[int]]:
        nonlocal hot
        if hasattr(hot, "value"):
            hot = hot.value
        toks, poss = analyze_text(text)
        tris: list[str] = []
        tpos: list[int] = []
        for i in range(len(toks) - 2):
            if (poss[i + 1] == poss[i] + 1 and poss[i + 2] == poss[i] + 2
                    and toks[i] in hot and toks[i + 1] in hot
                    and toks[i + 2] in hot):
                tris.append(f"{toks[i]} {toks[i+1]} {toks[i+2]}")
                tpos.append(poss[i])
        return tris, tpos
    return fn


def compound_split(token: str, wordset: frozenset | set,
                   keep_original: bool = True) -> list[str]:
    """CompoundWordFilter (``analysis/intraword.py::CompoundWordFilter
    ≈L300``): decompose a token into dictionary words (DP over split points,
    prefer fewest parts); unknown remainders keep the token whole."""
    n = len(token)
    # best[i] = (num_parts, split) covering token[:i]
    best: list[tuple[int, list[str]] | None] = [None] * (n + 1)
    best[0] = (0, [])
    for i in range(1, n + 1):
        for j in range(max(0, i - 24), i):
            if best[j] is not None and token[j:i] in wordset:
                cand = (best[j][0] + 1, best[j][1] + [token[j:i]])
                if best[i] is None or cand[0] < best[i][0]:
                    best[i] = cand
    if best[n] is None:
        return [token]
    parts = best[n][1]
    return ([token] if keep_original else []) + parts


def make_compound_analyzer(wordset) -> object:
    ws = frozenset(wordset)

    def analyze(text: str) -> tuple[list[str], list[int]]:
        if not text:
            return [], []
        tokens: list[str] = []
        positions: list[int] = []
        for pos, w in enumerate(_TOKEN_RE_NC.findall(text)):
            t = w.lower()
            for sub in compound_split(t, ws, keep_original=False) or [t]:
                if len(sub) >= MIN_WORD_SIZE and sub not in STOP_WORDS:
                    tokens.append(sub)
                    positions.append(pos)
        return tokens, positions

    return analyze


def analyze_text_phonetic(text: str) -> tuple[list[str], list[int]]:
    """DoubleMetaphoneFilter chain (``src/whoosh/analysis/morph.py::
    DoubleMetaphoneFilter ≈L60`` over ``lang/dmetaphone.py``): the standard
    chain, then each surviving token is replaced by its metaphone key(s) —
    primary always, secondary too when it differs, both at the token's
    position (upstream emits the secondary as a same-position variant).
    Index + query tee with this chain makes "smith" find "smyth"."""
    if not text:
        return [], []
    from whoosh_spark.analysis.dmetaphone import double_metaphone

    tokens: list[str] = []
    positions: list[int] = []
    for pos, t in enumerate(_TOKEN_RE_NC.findall(text)):
        t = t.lower()
        if len(t) >= MIN_WORD_SIZE and t not in STOP_WORDS:
            p, s = double_metaphone(t)
            for key in (p, s) if s else (p,):
                if key:
                    tokens.append(key.lower())
                    positions.append(pos)
    return tokens, positions


# same-position tokens are ALTERNATIVE keys (primary/secondary), not
# components — the query parser turns them into Or, not And
analyze_text_phonetic.emits_variants = True


# Named analyzer registry for per-field Schema configuration
# (``src/whoosh/fields.py::FieldType.analyzer``).  "standard" is special-
# cased to None in the build kernel (inlined fast path, identical output).
ANALYZERS: dict[str, object] = {
    "standard": analyze_text,
    "stemming": analyze_text_stemming,
    "intraword": analyze_text_intraword,
    "biword": analyze_text_biword,
    "id": analyze_id,
    "keyword": analyze_keyword,
    "comma": analyze_comma,
    "path": analyze_path,
    "reversed": analyze_text_reversed,
    "boosted": analyze_text_boosted,
    "phonetic": analyze_text_phonetic,
    "ngram": analyze_text_ngram,
    "charset": analyze_text_charset,
    "adjacent_pairs": analyze_text_adjacent_pairs,
    "adjacent_trigrams": analyze_text_adjacent_trigrams,
}


def register_analyzer(name: str, fn) -> None:
    """Custom-Analyzer extension point (``analysis/analyzers.py::Analyzer
    ≈L40`` — the §2.9 UDF surface): register ``fn(text) -> (tokens,
    positions)`` under a schema name usable everywhere a chain name is —
    ``FieldSpec(analyzer=...)``, ``write_index(analyzer=...)`` (persisted in
    the manifest), the ``parse_query(analyzer=...)`` query-time tee.  The
    function runs inside the Arrow batch kernel (one CPython call per doc,
    vectorized transport), so it must be a plain picklable callable.

    Set ``fn.emits_variants = True`` when same-position tokens are
    ALTERNATIVE keys (phonetic/synonym-style chains): the query parser
    then groups them as Or instead of the component-split And.

    Overwriting a built-in chain name is refused — persisted manifests
    reference chains by name, and silently changing "standard" would make
    every existing index unreadable-as-written."""
    if not callable(fn):
        raise TypeError(f"analyzer {name!r} must be callable")
    if name in _BUILTIN_ANALYZERS:
        raise ValueError(f"cannot overwrite built-in analyzer {name!r}")
    try:
        toks, poss = fn("probe text")
    except (TypeError, ValueError) as e:
        raise TypeError("analyzer must return (tokens, positions) "
                        f"parallel lists: {e}") from e
    if not isinstance(toks, list) or not isinstance(poss, list) \
            or len(toks) != len(poss):
        raise TypeError("analyzer must return (tokens, positions) "
                        "parallel lists")
    ANALYZERS[name] = fn


# per-language chains (lang_de/fr/es + the stemmer registry) self-register
# on import; imported HERE so a persisted manifest naming lang_<code>
# resolves in any fresh process without a side-effect import at the call
# site (safe: ANALYZERS and the tokenizer symbols above already exist)
from whoosh_spark.analysis import snowball as _snowball  # noqa: E402,F401

# snapshot AFTER the snowball import so the shipped lang_* chains count as
# built-ins — register_analyzer must refuse to shadow any chain a
# persisted manifest can reference by name (register_language remains the
# supported way to swap a language's stopwords/stemmer)
_BUILTIN_ANALYZERS = frozenset(ANALYZERS)
