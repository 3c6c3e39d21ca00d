"""Exploratory (non-derandomized) rank-identity fuzz campaign.

NOT collected by pytest (no test_ prefix): run manually —

    python tests/fuzz_campaign.py [n_queries] [seed] [--fields] [--many] [--spans] [--prune] [--strings] [--roundtrip [--ops]] [--pairs] [--trigrams]

``--pairs`` builds the index with the adjacent-pair accelerator
(``phrase_pairs=True``) so every random two-word slop-1 phrase runs the
nextword plan against the oracle instead of the positional fold.

``--prune`` forces the rare-slot candidate gate open (see
whoosh_spark/config.py PHRASE_PRUNE_*) so every random positional query
exercises the in-decoder pruned plan against the oracle.

Generates random query ASTs (same shape-space as tests/test_rank_fuzz_deep,
plus random depth/boost combos) and diffs Spark top-k ids+scores against the
pure-Python oracle.  With ``--fields`` the sweep runs the two-field
(title/body) schema of tests/test_rank_fuzz_fields.py against PyMultiIndex,
with random fieldnames on every leaf.  Failures print the repr(q) so it can
be pinned into tests/test_dup_expansion.py / the derandomized suites.  Used
for long background sweeps during development; the committed suites stay
derandomized so the driver's `pytest -x -q` gate is deterministic.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzz_vocab import BOOSTS, FUZZIES, PREFIXES, VOCAB, WILDCARDS  # noqa: E402
from whoosh_spark.index import InvertedIndex  # noqa: E402
from whoosh_spark.oracle.engine import PyIndex  # noqa: E402
from whoosh_spark.query import ast as Q  # noqa: E402
from whoosh_spark.search import Searcher  # noqa: E402
from whoosh_spark.session import get_spark  # noqa: E402

K = 10


def rand_leaf(rng: random.Random, fields: list[str | None]) -> Q.Query:
    fn = rng.choice(fields)
    r = rng.random()
    if r < 0.40:
        return Q.Term(rng.choice(VOCAB), rng.choice(BOOSTS), fieldname=fn)
    if r < 0.52:
        words = [rng.choice(VOCAB[:10] + ["the"])
                 for _ in range(rng.randint(2, 3))]
        return Q.Phrase(words, slop=rng.choice([1, 1, 2, 3]), fieldname=fn)
    if r < 0.64:
        return Q.Prefix(rng.choice(PREFIXES), rng.choice(BOOSTS),
                        fieldname=fn)
    if r < 0.76:
        return Q.Wildcard(rng.choice(WILDCARDS), rng.choice(BOOSTS),
                          fieldname=fn)
    if r < 0.84:
        return Q.Fuzzy(rng.choice(FUZZIES), maxdist=rng.choice([1, 2]),
                       fieldname=fn)
    if r < 0.90:
        los = [None, "a", "da", "m"]
        his = [None, "dz", "m", "z"]
        return Q.TermRange(rng.choice(los), rng.choice(his),
                           incl_lo=rng.random() < 0.8,
                           incl_hi=rng.random() < 0.8,
                           fieldname=fn)
    if r < 0.93:
        return Q.Regex(rng.choice(["da.a", "^qu", "or$", "(big|fast)"]),
                       rng.choice(BOOSTS), fieldname=fn)
    if r < 0.97:
        slot2 = (Q.Term(rng.choice(VOCAB[:10]), fieldname=fn)
                 if rng.random() < 0.6
                 else Q.Prefix(rng.choice(PREFIXES), fieldname=fn))
        return Q.Sequence([Q.Term(rng.choice(VOCAB[:10]), fieldname=fn),
                           slot2], slop=rng.choice([1, 2, 3]))
    return Q.Every(rng.choice(BOOSTS))


def rand_span_sub(rng: random.Random, fn=None) -> Q.Query:
    r = rng.random()
    if r < 0.5:
        return Q.Term(rng.choice(VOCAB), fieldname=fn)
    if r < 0.8:
        return Q.Phrase([rng.choice(VOCAB[:10]), rng.choice(VOCAB[:10])],
                        fieldname=fn)
    return Q.Prefix(rng.choice(PREFIXES), fieldname=fn)


def rand_span(rng: random.Random, depth: int = 0, fn=None) -> Q.Query:
    if depth >= 2:
        return rand_span_sub(rng, fn)
    sub = lambda: (rand_span(rng, depth + 1, fn) if rng.random() < 0.3  # noqa: E731
                   else rand_span_sub(rng, fn))
    r = rng.random()
    if r < 0.35:
        return Q.SpanNear(sub(), sub(), slop=rng.choice([1, 2, 3]),
                          ordered=rng.random() < 0.5)
    if r < 0.55:
        return Q.SpanNot(sub(), sub())
    if r < 0.7:
        return Q.SpanContains(sub(), sub())
    if r < 0.8:
        return Q.SpanBefore(sub(), sub())
    if r < 0.88:
        return Q.SpanOr([sub() for _ in range(rng.choice([2, 3]))])
    if r < 0.94:
        return Q.SpanCondition(sub(), sub())
    return Q.SpanFirst(sub(), limit=rng.choice([2, 5, 20]))


def rand_span_query(rng: random.Random,
                    fields: list[str | None] = (None,)) -> Q.Query:
    fn = rng.choice(list(fields))  # ONE field per span tree (engine rule)
    q = rand_span(rng, fn=fn)
    r = rng.random()
    if r < 0.6:
        return q
    if r < 0.75:
        return Q.And([q, Q.Term(rng.choice(VOCAB))])
    if r < 0.9:
        return Q.Or([q, rand_span(rng, fn=rng.choice(list(fields)))])
    return Q.AndNot(q, Q.Term(rng.choice(VOCAB)))


def rand_query(rng: random.Random, depth: int = 0,
               fields: list[str | None] = (None,)) -> Q.Query:
    fields = list(fields)
    if depth >= 3 or rng.random() < 0.35:
        return rand_leaf(rng, fields)
    kids = lambda n: [rand_query(rng, depth + 1, fields)  # noqa: E731
                      for _ in range(n)]
    one = lambda: rand_query(rng, depth + 1, fields)  # noqa: E731
    r = rng.random()
    if r < 0.22:
        return Q.And(kids(rng.randint(1, 3)), boost=rng.choice(BOOSTS))
    if r < 0.44:
        return Q.Or(kids(rng.randint(1, 3)),
                    minmatch=rng.choice([0, 0, 2, 3]),
                    boost=rng.choice(BOOSTS))
    if r < 0.58:
        return Q.DisMax(kids(rng.randint(1, 3)),
                        tiebreak=rng.choice([0.0, 0.3, 0.5, 1.0]))
    if r < 0.70:
        return Q.AndNot(one(), one())
    if r < 0.80:
        return Q.AndMaybe(one(), one())
    if r < 0.86:
        return Q.Require(one(), one())
    if r < 0.92:
        return Q.Otherwise(one(), one())
    if r < 0.93:
        return Q.Constant(one(), score=rng.choice([0.5, 1.0, 2.0]))
    if r < 0.97:
        return Q.Weighted(one(), weighting=rng.choice(
            ["pl2", "dfree", "tfidf", "frequency", "reverse:bm25"]))
    return Q.Not(one(), boost=rng.choice(BOOSTS))


def rand_qstring(rng: random.Random, fieldnames: list[str]) -> str:
    """Random query STRING from the parser's grammar — exercises the
    parse→evaluate→oracle chain wholesale (field prefixes, fielded GROUPS,
    fuzzy maxdist/prefixlength, all-star Every, phrases w/ slop, boosts,
    ranges, regex, stopword-vanishing leaves)."""
    def leaf() -> str:
        r = rng.random()
        if r < 0.30:
            tok = rng.choice(VOCAB)
        elif r < 0.38:
            tok = rng.choice(VOCAB) + "^" + rng.choice(["2", "0.5", "3.0"])
        elif r < 0.48:
            tok = '"%s %s"%s' % (rng.choice(VOCAB[:10]),
                                 rng.choice(VOCAB[:10]),
                                 rng.choice(["", "~2", "~3"]))
        elif r < 0.56:
            tok = rng.choice(PREFIXES) + "*"
        elif r < 0.63:
            tok = rng.choice(WILDCARDS)
        elif r < 0.72:
            tok = rng.choice(FUZZIES) + rng.choice(
                ["~", "~1", "~2", "~1/2", "~2/3", "~1/3"])
        elif r < 0.80:
            tok = "[%s TO %s]" % (rng.choice(["a", "da", "m"]),
                                  rng.choice(["dz", "m", "z"]))
        elif r < 0.84:
            tok = 'r"%s"' % rng.choice(["da.a", "^qu", "or$"])
        elif r < 0.88:
            tok = rng.choice(["*", "*:*"])
        else:
            tok = rng.choice(["the", "a"])  # stop/short leaves vanish
        if fieldnames and rng.random() < 0.25 and not tok.startswith("*"):
            return rng.choice(fieldnames) + ":" + tok
        return tok

    def expr(depth: int = 0) -> str:
        if depth >= 2 or rng.random() < 0.4:
            return leaf()
        parts = [expr(depth + 1) for _ in range(rng.randint(2, 3))]
        s = rng.choice([" AND ", " OR ", " ", " AND ", " OR "]).join(parts)
        r = rng.random()
        if r < 0.22:
            return "(" + s + ")"
        if r < 0.42 and fieldnames:
            return rng.choice(fieldnames) + ":(" + s + ")"
        if r < 0.52:
            return "NOT (" + s + ")"
        return s

    return expr()


SAFE_VOCAB = [w for w in VOCAB if w != "the"]  # stop leaves break identity


def rand_qpair(rng: random.Random, fieldnames: list[str],
               depth: int = 0, amb: str | None = None):
    """(expected AST, equivalent query string) generated TOGETHER — the
    string side carries independent ground truth, so parse(s) ≠ ast is a
    PARSER bug (the --strings mode can't see those: it parses once and
    feeds the same AST to both engines).  ``amb`` is the ambient field an
    enclosing ``field:(...)`` group imposes on unfielded leaves."""
    def leafpair():
        fn = (rng.choice([None, None, *fieldnames])
              if fieldnames else None)
        eff = fn if fn is not None else amb
        r = rng.random()
        w = rng.choice(SAFE_VOCAB)
        if r < 0.30:
            b = rng.choice([None, 2.0, 0.5, 3.0])
            s = w + (f"^{b}" if b else "")
            q = Q.Term(w, b or 1.0, fieldname=eff)
        elif r < 0.45:
            # 2- and 3-word phrases: the 3-word slop-1 shape exercises the
            # chained pair-candidate gate on a --pairs index
            ws = [w] + [rng.choice(SAFE_VOCAB[:10])
                        for _ in range(rng.randint(1, 2))]
            sl = rng.choice([1, 1, 2, 3])
            s = '"' + " ".join(ws) + '"' + (f"~{sl}" if sl > 1 else "")
            q = Q.Phrase(ws, slop=sl, fieldname=eff)
        elif r < 0.58:
            p = rng.choice(PREFIXES)
            s = p + "*"
            q = Q.Prefix(p, fieldname=eff)
        elif r < 0.70:
            d, pl = rng.choice([1, 2]), rng.choice([1, 2, 3])
            s = f"{w}~{d}/{pl}" if pl != 1 else f"{w}~{d}"
            q = Q.Fuzzy(w, maxdist=d, prefixlength=pl, fieldname=eff)
        elif r < 0.82:
            lo, hi = sorted(rng.sample(SAFE_VOCAB, 2))
            il, ih = rng.random() < 0.7, rng.random() < 0.7
            s = ("[" if il else "{") + f"{lo} TO {hi}" + ("]" if ih else "}")
            q = Q.TermRange(lo, hi, il, ih, fieldname=eff)
        elif r < 0.9 or not fieldnames:
            s = "*"
            q = Q.Every() if eff is None else Q.Prefix("", fieldname=eff)
        else:
            s = "*"
            fn = rng.choice(fieldnames)
            return Q.Prefix("", fieldname=fn), f"{fn}:*"
        if fn is not None:
            s = f"{fn}:{s}"
        return q, s

    if depth >= 2 or rng.random() < 0.45:
        return leafpair()
    n = rng.randint(2, 3)
    pairs = [rand_qpair(rng, fieldnames, depth + 1, amb)
             for _ in range(n)]
    r = rng.random()
    if r < 0.3 and fieldnames:
        # fielded group: the prefix becomes the ambient field of every
        # unfielded leaf inside — regenerate children under that ambient
        f = rng.choice(fieldnames)
        pairs = [rand_qpair(rng, fieldnames, depth + 1, amb=f)
                 for _ in range(n)]
        op = rng.choice([" OR ", " AND "])
        ast = (Q.Or if op == " OR " else Q.And)([p[0] for p in pairs])
        return ast, f + ":(" + op.join(f"({p[1]})" for p in pairs) + ")"
    if r < 0.55:
        ast = Q.And([p[0] for p in pairs])
        return ast, " AND ".join(f"({p[1]})" for p in pairs)
    if r < 0.8:
        ast = Q.Or([p[0] for p in pairs])
        return ast, " OR ".join(f"({p[1]})" for p in pairs)
    ast = Q.Not(pairs[0][0])
    return ast, "NOT (" + pairs[0][1] + ")"


def roundtrip_campaign(n: int, rng: random.Random,
                       fieldnames: list[str], ops_mode: bool = False) -> int:
    """parse(render(q)) ≡ q.normalize() over random ASTs — pure Python,
    no Spark.  Returns the failure count.  With ``ops_mode`` the rendered
    string swaps every operator for a custom spelling (&&, ||, !) and the
    parse runs under the matching ``ops=`` map (OperatorsPlugin
    replace-semantics), so the whole random grammar exercises the custom
    lexer path against the same expected AST."""
    from whoosh_spark.query.parser import parse_query

    custom = {"and": r"&&", "or": r"\|\|", "not": r"!"}
    fails = 0
    for i in range(n):
        ast, s = rand_qpair(rng, fieldnames)
        kw = {}
        if ops_mode:
            s = (s.replace(" AND ", " && ").replace(" OR ", " || ")
                 .replace("NOT (", "! ("))
            kw["ops"] = custom
        try:
            got = parse_query(s, fields=set(fieldnames) or None, **kw)
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"\nFAIL (exception) s={s!r} expected={ast!r}\n"
                  f"  {type(e).__name__}: {e}", flush=True)
            continue
        exp = ast.normalize()
        if got != exp:
            fails += 1
            print(f"\nFAIL #{fails} s={s!r}\n  parsed={got!r}\n"
                  f"  expected={exp!r}", flush=True)
        if (i + 1) % 2000 == 0:
            print(f"  {i + 1}/{n} ({fails} fails)", flush=True)
    print(f"done: {n} round-trips, {fails} failures", flush=True)
    return fails


def _build_single(spark, pairs: bool = False, trigrams: bool = False):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    if trigrams:
        # hot pair + trigram segments: every random 2-word slop-1 phrase
        # takes the pair plan, every all-hot 3-word one the trigram plan
        ix = InvertedIndex.build(docs, phrase_pairs=True, pair_min_df=0.02,
                                 phrase_trigrams=True)
    else:
        ix = InvertedIndex.build(docs, phrase_pairs=pairs)
    searcher = Searcher(ix)
    rows = docs.select("doc_id", "text").collect()
    py = PyIndex([(int(r["doc_id"]), r["text"]) for r in rows])
    return searcher, py, [None]


def _build_fielded(spark):
    from whoosh_spark import FieldSpec, MultiFieldIndex
    from whoosh_spark.oracle.engine import PyMultiIndex

    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(int(r["doc_id"]), " ".join((r["text"] or "").split()[:6]),
             r["text"]) for r in raw.select("doc_id", "text").collect()]
    docs = spark.createDataFrame(rows, "doc_id long, title string, body string")
    mix = MultiFieldIndex.build(
        docs, fields={"title": FieldSpec("title"), "body": FieldSpec("body")},
        default_field="body")
    py = PyMultiIndex(
        {"title": PyIndex([(d, t) for d, t, _ in rows]),
         "body": PyIndex([(d, b) for d, _, b in rows])},
        default_field="body")
    return Searcher(mix), py, [None, "title", "body", "body"]


def _run_many(searcher, py, batch: list[Q.Query]) -> list[str]:
    """Run a group through search_many and diff each vs the oracle;
    returns failure descriptions (empty = all matched)."""
    names = {f"q{i}": q for i, q in enumerate(batch)}
    rows = searcher.search_many(names, limit=K).collect()
    per: dict[str, list[tuple[int, float]]] = {}
    for r in rows:
        per.setdefault(r["qname"], []).append(
            (int(r["doc_id"]), float(r["score"])))
    fails = []
    for name, q in names.items():
        got = sorted(per.get(name, []), key=lambda t: (-t[1], t[0]))
        exp = py.search(q, K)
        ok = [g[0] for g in got] == [e[0] for e in exp] and all(
            abs(g[1] - e[1]) <= 1e-9 * max(1.0, abs(e[1]))
            for g, e in zip(got, exp))
        if not ok:
            fails.append(f"search_many[{name}] q={q!r}\n"
                         f"  spark={got}\n  oracle={exp}")
    return fails


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    fielded = "--fields" in sys.argv[1:]
    pairs = "--pairs" in sys.argv[1:]
    trigrams = "--trigrams" in sys.argv[1:]
    many = "--many" in sys.argv[1:]
    spans = "--spans" in sys.argv[1:]
    prune = "--prune" in sys.argv[1:]
    strings = "--strings" in sys.argv[1:]
    roundtrip = "--roundtrip" in sys.argv[1:]
    ops_mode = "--ops" in sys.argv[1:]
    if prune:
        # force the rare-slot candidate gate OPEN so every positional
        # query runs the in-decoder pruned plan against the oracle
        from whoosh_spark import config

        config.PHRASE_PRUNE_MAX_DF = 10**9
        config.PHRASE_PRUNE_RATIO = 0
    if pairs:
        # round-5 payoff model: at fuzz-corpus scale the estimated decode
        # savings never clear the fixed-cost threshold, so the chained
        # k-word gate would silently decline — zero the thresholds so the
        # GATED plan is what gets fuzzed
        from whoosh_spark import config

        config.PAIR_GATE_MIN_SAVED_ROWS = 0
        config.PAIR_GATE_MIN_SAVED_FRAC = 0.0
        config.PAIR_GATE_MAX_CAND_FRAC = 1.0
    n = int(argv[0]) if len(argv) > 0 else 500
    seed = int(argv[1]) if len(argv) > 1 else random.randrange(2**31)
    rng = random.Random(seed)
    print(f"fuzz campaign: n={n} seed={seed} fielded={fielded} many={many} "
          f"spans={spans} prune={prune} strings={strings} "
          f"roundtrip={roundtrip} ops={ops_mode} pairs={pairs} "
          f"trigrams={trigrams}",
          flush=True)

    if roundtrip:
        fnames = ["title", "body"] if fielded else []
        return 1 if roundtrip_campaign(n, rng, fnames, ops_mode) else 0

    spark = get_spark(master="local[4]", shuffle_partitions=4,
                      app="whoosh_spark_fuzz")
    searcher, py, fields = (_build_fielded(spark) if fielded
                            else _build_single(spark, pairs=pairs,
                                               trigrams=trigrams))

    def _string_gen():
        from whoosh_spark.query.ast import NullQuery as _NQ
        from whoosh_spark.query.parser import parse_query as _pq

        fnames = [f for f in fields if f]
        while True:
            s = rand_qstring(rng, fnames)
            q = _pq(s, fields=set(fnames) if fnames else None)
            if q != _NQ:
                return q

    if many:
        fails = 0
        t0 = time.time()
        group_size = 8
        done = 0
        while done < n:
            gen = _string_gen if strings \
                else (lambda: rand_span_query(rng, fields)) if spans \
                else (lambda: rand_query(rng, fields=fields))
            batch = [gen() for _ in range(min(group_size, n - done))]
            done += len(batch)
            try:
                msgs = _run_many(searcher, py, batch)
            except Exception as e:  # noqa: BLE001
                fails += 1
                print(f"\nFAIL (exception) batch={batch!r}\n"
                      f"  {type(e).__name__}: {e}", flush=True)
                continue
            for m in msgs:
                fails += 1
                print(f"\nFAIL #{fails} {m}", flush=True)
            if done % 80 == 0:
                print(f"  {done}/{n} ({time.time() - t0:.0f}s, "
                      f"{fails} fails)", flush=True)
        print(f"done: {done} queries via search_many, {fails} failures, "
              f"seed={seed}", flush=True)
        return 1 if fails else 0

    fails = 0
    t0 = time.time()
    gen = _string_gen if strings \
        else (lambda: rand_span_query(rng, fields)) if spans \
        else (lambda: rand_query(rng, fields=fields))
    for i in range(n):
        q = gen()
        try:
            got = [(int(r["doc_id"]), float(r["score"]))
                   for r in searcher.search(q, limit=K).collect()]
            exp = py.search(q, K)
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"\nFAIL #{fails} (exception) q={q!r}\n  {type(e).__name__}: {e}",
                  flush=True)
            continue
        ok = [g[0] for g in got] == [e[0] for e in exp] and all(
            abs(g[1] - e[1]) <= 1e-9 * max(1.0, abs(e[1]))
            for g, e in zip(got, exp))
        if not ok:
            fails += 1
            print(f"\nFAIL #{fails} q={q!r}\n  spark={got}\n  oracle={exp}",
                  flush=True)
        if (i + 1) % 50 == 0:
            el = time.time() - t0
            print(f"  {i + 1}/{n} ({el:.0f}s, {fails} fails)", flush=True)
    print(f"done: {n} queries, {fails} failures, seed={seed}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
