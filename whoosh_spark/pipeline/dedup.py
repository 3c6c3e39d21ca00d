"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the whole point of these formulations):

* exact: one hash-groupBy — Spark's partial+final agg, no skew (md5 keys).
* n-gram Jaccard: inverted shingle index + pair-count join.  The classic
  quadratic blowup is bounded by ``max_shingle_df`` — a shingle occurring in
  more than that many docs is dropped on BOTH sides of the pair join (hot
  shingles are stop-phrase-like and carry no dedup signal; this is the
  standard frequency cut used by web-dedup pipelines).
* MinHash: signatures are p column aggregates over the shingle explode (one
  shuffle); LSH banding groups docs by (band, band_hash) and expands pairs
  inside each bucket — bucket sizes are bounded w.h.p. (``max_bucket`` caps
  the degenerate case with a connectivity-preserving star), no cross join
  ever, and the signature pipeline runs exactly once.
* SimHash: 60 bit-majority aggregates per doc; near-dup candidates via
  ``max_hamming + 1`` band buckets (pigeonhole ⇒ full recall at the radius),
  verified with bit_count(xor) — all JVM bit ops, portable md5-prefix hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Docs whose text is byte-identical to another doc.

    Returns (doc_id, canonical_id, group_size): canonical = min doc_id of the
    group (deterministic survivor), one row per member of a dup group.
    """
    h = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.md5(F.col(text_col)).alias("h"))
    groups = h.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("group_size"),
    )
    return (
        h.join(groups.where(F.col("group_size") > 1), "h")
        .select("doc_id", "canonical_id", "group_size")
    )


# ---------------------------------------------------------------------------
# word n-gram shingles + exact Jaccard
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams over whitespace tokens.

    Tokenization is plain split-on-space (not the index analyzer): dedup
    operates on raw surface text, and the simple rule is reproducible in any
    engine (the DuckDB oracle uses string_split).
    """
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    grams = F.when(
        F.size("t") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - n),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = toks.select("doc_id", F.explode(grams).alias("shingle"))
    return sh.distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    tau: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (a, b, jaccard) with a < b.

    |A ∩ B| from the inverted shingle join, |A ∪ B| = |A| + |B| − |A ∩ B|.

    ``max_shingle_df`` is DEFAULT-ON (1000): without the hot-shingle cut the
    pair join is quadratic in the hottest shingle's df — the classic skew
    bomb on web boilerplate.  Pass None explicitly for the uncut exact join.
    Note the cut changes semantics slightly (Jaccard over the surviving
    shingle sets) — the DuckDB oracle applies the identical cut.
    """
    sh = shingles(docs, n, text_col)
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("df")).where(
            F.col("df") > max_shingle_df
        )
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "a", "sz": "sza"}), "a")
        .join(sizes.withColumnsRenamed({"doc_id": "b", "sz": "szb"}), "b")
        .withColumn("jaccard", F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")))
        .where(F.col("jaccard") >= tau)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, num_perm: int = 128, n: int = 3,
                       text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>) — p permutation minima in ONE aggregation.

    Each shingle is hashed ONCE (``xxhash64(shingle)``); permutation i is
    ``xxhash64(h, seed=i)`` over that 8-byte value.  Hashing the string once
    instead of p times cuts the aggregation cost ~2× (measured at sf0.1)
    while keeping everything whole-stage codegen; 64-bit pre-hash collisions
    are negligible versus MinHash's own estimation error.
    """
    sh = shingles(docs, n, text_col)
    hashed = sh.select("doc_id", F.xxhash64("shingle").alias("h"))
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"s{i}")
        for i in range(num_perm)
    ]
    sig = hashed.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"s{i}") for i in range(num_perm)]).alias("sig")
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 32,
                        rows: int = 4, max_bucket: int | None = 4096,
                        inline_cap: int = 512,
                        num_perm: int | None = None) -> DataFrame:
    """(a, b) candidate pairs sharing at least one LSH band bucket.

    Single-pass formulation: band hashes are ``xxhash64`` over the band's
    ``rows`` signature longs directly (codegen, no string building), then
    ONE groupBy collects each bucket's doc ids.  Pair expansion is tiered
    by bucket size so no tier can blow up memory:

    - ``<= inline_cap`` (virtually every real bucket): all pairs expanded
      in-array — one row per bucket, at most C(inline_cap, 2) two-long
      structs (~2 MB) per cell, no second pass over the signature pipeline.
    - ``inline_cap < size <= max_bucket``: ids explode to rows and pair via
      a per-bucket equi-join — still exact all-pairs, but distributed
      instead of materialized inside one aggregation cell.
    - ``> max_bucket`` (skew bomb: thousands of near-identical docs that
      survived exact dedup): STAR expansion — min doc id paired with every
      other member — linear cost.  This preserves duplicate-CLUSTER
      connectivity but NOT pair completeness: downstream exact-verify can
      only keep pairs that were generated, so callers needing every
      verified pair must pass ``max_bucket=None`` (exact everywhere).
    """
    if num_perm is not None and bands * rows > num_perm:
        # fail fast with a clear message — otherwise element_at past the
        # signature's end throws an opaque INVALID_ARRAY_INDEX mid-job
        # (or, with ANSI off, silently hashes NULLs into one shared bucket)
        raise ValueError(
            f"bands*rows = {bands * rows} exceeds the signature width "
            f"num_perm = {num_perm}")
    bhs = [
        F.xxhash64(*[F.element_at("sig", b * rows + j + 1) for j in range(rows)])
        for b in range(bands)
    ]
    banded = signatures.select(
        "doc_id", F.posexplode(F.array(*bhs)).alias("band", "bh"))
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    return tiered_bucket_pairs(buckets, inline_cap=inline_cap,
                               max_bucket=max_bucket)


def tiered_bucket_pairs(buckets: DataFrame, inline_cap: int = 512,
                        max_bucket: int | None = 4096) -> DataFrame:
    """Distinct (a, b) pairs (a < b) from bucket membership lists, tiered by
    bucket size so no tier can blow up a task (the shared skew armor for
    MinHash-LSH and embedding-LSH banding — see ``lsh_candidate_pairs`` for
    the tier semantics).  ``buckets`` must have columns
    ``(band, bh, ids array<long>)`` with ``ids`` sorted ascending."""
    ids = F.col("ids")
    all_pairs = F.flatten(F.transform(
        ids,
        lambda x, i: F.transform(
            F.slice(ids, i + F.lit(2), F.size(ids)),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    ))
    star_pairs = F.transform(
        F.slice(ids, 2, F.size(ids)),
        lambda y: F.struct(F.element_at(ids, 1).alias("a"), y.alias("b")),
    )
    size = F.size(ids)
    if max_bucket is None:
        inline = buckets.where(size <= inline_cap)
        big = buckets.where(size > inline_cap)
        pairs = all_pairs
    else:
        inline = buckets.where((size <= inline_cap) | (size > max_bucket))
        big = buckets.where((size > inline_cap) & (size <= max_bucket))
        pairs = F.when(size > max_bucket, star_pairs).otherwise(all_pairs)
    inline_rows = (
        inline.select(F.explode(pairs).alias("p")).select("p.a", "p.b"))
    member = big.select("band", "bh", F.explode(ids).alias("id"))
    big_rows = (
        member.join(member.withColumnRenamed("id", "id2"), ["band", "bh"])
        .where(F.col("id") < F.col("id2"))
        .select(F.col("id").alias("a"), F.col("id2").alias("b"))
    )
    return inline_rows.unionByName(big_rows).distinct()


def minhash_near_dups(docs: DataFrame, tau: float = 0.8, num_perm: int = 128,
                      bands: int = 32, rows: int = 4, n: int = 3,
                      text_col: str = "text",
                      max_bucket: int | None = 4096) -> DataFrame:
    """LSH-accelerated near-dup pairs VERIFIED by exact Jaccard ≥ tau.

    Candidate recall at tau=0.8 with 32 bands × 4 rows is
    1−(1−0.8⁴)³² ≈ 1−6e−8 — the verify step makes survivors exact, so the
    result equals the brute-force Jaccard output w.o.p. while the join is
    linear in bucket sizes instead of quadratic in docs.

    ``max_bucket`` caps pathological buckets (see ``lsh_candidate_pairs``):
    above it candidate generation degrades to a connectivity-preserving
    star, so pairs inside such a bucket whose hub fails the tau verify can
    be missed.  Pass ``max_bucket=None`` to guarantee brute-force-equal
    output regardless of skew (exact distributed pairing at any size).
    """
    cand = lsh_candidate_pairs(minhash_signatures(docs, num_perm, n, text_col),
                               bands, rows, max_bucket, num_perm=num_perm)
    sh = shingles(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "a"), "a")
        .join(
            sh.withColumnsRenamed({"doc_id": "b"}),
            ["b", "shingle"],
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "a", "sz": "sza"}), "a")
        .join(sizes.withColumnsRenamed({"doc_id": "b", "sz": "szb"}), "b")
        .withColumn("jaccard", F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")))
        .where(F.col("jaccard") >= tau)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 md5 hex chars → portable across engines, sign-safe


def md5_prefix_long(col, hexchars: int = 15):
    """First ``hexchars`` md5 hex chars read as a long — THE engine-portable
    hash contract used by simhash/sampling and their oracles: Spark
    ``conv(substring(md5(x),1,n),16,10)::long`` equals DuckDB
    ``('0x' || substr(md5(x),1,n))::BIGINT`` bit-for-bit (SQL twin:
    ``oracle.pipeline_sql.md5_prefix_sql``).  Keep both sides in these two
    helpers so the contract can never drift copy-by-copy."""
    return F.conv(F.substring(F.md5(col), 1, hexchars), 16, 10).cast("long")


def simhash60(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long) — 60 tf-weighted bit-majority votes per doc.

    The token hash is the first 15 hex chars of md5 read as an integer —
    NOT engine-private (Spark ``conv(substring(md5(t),1,15),16,10)`` equals
    DuckDB ``('0x' || substr(md5(t),1,15))::BIGINT`` bit-for-bit), so the
    whole operator has an exact brute-force SQL oracle."""
    tok = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    h = tok.withColumn("h", md5_prefix_long(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0,
               F.shiftleft(F.lit(1).cast("long"), i)
               ).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    ]
    out = agg.withColumn("simhash", sum(bit_terms[1:], bit_terms[0]))
    return out.select("doc_id", "simhash")


def _band_slices(bits: int, bands: int) -> list[tuple[int, int]]:
    """(start_bit, width) for ``bands`` nearly-equal contiguous bit bands."""
    base, extra = divmod(bits, bands)
    out, start = [], 0
    for i in range(bands):
        w = base + (1 if i < extra else 0)
        out.append((start, w))
        start += w
    return out


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text") -> DataFrame:
    """(a, b, hamming) pairs with Hamming(simhash) ≤ max_hamming — EXACT.

    Banding with ``bands = max_hamming + 1`` nearly-equal bit ranges: by
    pigeonhole, any pair within Hamming ≤ max_hamming has ≥ 1 band with zero
    differing bits, so the equi-join on (band, key) has FULL recall at the
    requested radius (a fixed band count would silently under-recall for
    larger radii — the round-1 bug).  Exact ``bit_count(xor)`` verify."""
    if not 0 <= max_hamming < SIMHASH_BITS:
        raise ValueError(f"max_hamming must be in [0, {SIMHASH_BITS})")
    bands = max_hamming + 1
    sh = simhash60(docs, text_col)
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("simhash", start)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("key"))
            for i, (start, width) in enumerate(_band_slices(SIMHASH_BITS, bands))
        ])).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    l = banded.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "key")
    r = banded.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "key")
    return (
        l.join(r, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# line-level exact dedup (C4-style)
# ---------------------------------------------------------------------------

def line_dedup(docs: DataFrame, text_col: str = "text",
               sep: str = "\n", min_chars: int = 1) -> DataFrame:
    """(doc_id, text, n_lines, n_dropped): corpus-wide line deduplication —
    the C4 rule that keeps only the FIRST occurrence of every distinct
    (trimmed) line and rewrites documents without the repeats.

    First occurrence is deterministic: smallest (doc_id, line_idx).  The
    dataflow is explode → one shuffle keyed by the line hash (md5 — uniform,
    no hot keys) with a min-struct aggregate, broadcast-free join back on
    (hash, doc_id, idx), then ordered reassembly via sort_array over
    (idx, line) structs — no window functions, no skewed keys.

    Lines shorter than ``min_chars`` after trim are kept verbatim (they are
    structure, not content).  Empty-text docs pass through unchanged.
    """
    import re as _re

    # F.split takes a REGEX; sep is a literal (array_join and the DuckDB
    # twin's string_split both treat it literally), so escape it
    lines = (docs
             .select(F.col("doc_id").cast("long").alias("doc_id"),
                     F.posexplode(F.split(F.col(text_col), _re.escape(sep)))
                     .alias("idx", "line"))
             .withColumn("key", F.md5(F.trim(F.col("line"))))
             .withColumn("elig", F.length(F.trim(F.col("line"))) >= min_chars))
    firsts = (lines.where("elig")
              .groupBy("key")
              .agg(F.min(F.struct("doc_id", "idx")).alias("first")))
    kept = (lines.join(firsts, "key", "left")
            .where(~F.col("elig")
                   | ((F.col("first.doc_id") == F.col("doc_id"))
                      & (F.col("first.idx") == F.col("idx")))))
    out = (kept.groupBy("doc_id")
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "line"))),
                        lambda s: s["line"]),
                    sep).alias("text"),
                F.count("*").alias("_kept"))
           )
    totals = (lines.groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_lines")))
    return (totals.join(out, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                    "n_lines",
                    (F.col("n_lines") - F.coalesce(F.col("_kept"), F.lit(0)))
                    .cast("long").alias("n_dropped")))


# ---------------------------------------------------------------------------
# exact-substring duplication spans (suffix-array dedup, windowed-hash form)
# ---------------------------------------------------------------------------

def duplicated_spans(docs: DataFrame, n: int = 20,
                     text_col: str = "text", min_count: int = 2) -> DataFrame:
    """Maximal token spans of length ≥ n duplicated verbatim in the corpus
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better": remove exact substrings ≥ k tokens that occur more than once).

    The published method builds a corpus suffix array — inherently
    sequential and RAM-bound.  The distributed restatement: hash every
    n-token window; a window whose hash occurs ≥ ``min_count`` times
    anywhere (across docs OR repeated within one doc) is duplicated, and a
    run of overlapping/adjacent duplicated windows is exactly a maximal
    duplicated substring of length ≥ n.  Returns one row per maximal span:
    (doc_id, start_tok, end_tok, span_tokens), end exclusive.

    Scale shape: window explode is narrow; the hash count is one
    partial+final groupBy on uniform md5 keys; the join back is a semi-join
    (no fan-out); span merging is a per-doc window function (partitions
    bounded by doc length, never corpus-sized).  At production scale swap
    md5 for xxhash64 — md5 is kept here because the DuckDB value-oracle
    computes the identical string.  Tokenization is split-on-space, same
    engine-portable rule as every dedup op in this module.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    ).where(F.size("t") >= n)
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.md5(F.concat_ws(" ", F.slice("t", i + 1, n))),
            )
        ).alias("i", "h"),
    )
    hot = (wins.groupBy("h").agg(F.count("*").alias("c"))
           .where(F.col("c") >= min_count).select("h"))
    dup = wins.join(hot, "h", "left_semi").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    brk = F.when(
        F.lag("i").over(w).isNull() | (F.col("i") - F.lag("i").over(w) > n),
        F.lit(1)).otherwise(F.lit(0))
    isl = (dup.withColumn("brk", brk)
           .withColumn("isl", F.sum("brk").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (isl.groupBy("doc_id", "isl")
            .agg(F.min("i").alias("start_tok"),
                 (F.max("i") + n).alias("end_tok"))
            .select("doc_id",
                    F.col("start_tok").cast("long").alias("start_tok"),
                    F.col("end_tok").cast("long").alias("end_tok"),
                    (F.col("end_tok") - F.col("start_tok")).cast("long")
                    .alias("span_tokens")))


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a probe set)
# ---------------------------------------------------------------------------

def contamination(docs: DataFrame, probes: DataFrame, n: int = 8,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, n_hits, contaminated) — flag corpus documents that share
    any word ``n``-gram with the probe corpus (pre-training benchmark
    decontamination: probes = eval-set texts, hits = leakage candidates).

    Scale shape: the probe shingle set is DISTINCT and tiny relative to the
    corpus (benchmarks are KBs against TBs), so it BROADCASTS and the
    corpus side streams through a map-side hash semi-join — no shuffle of
    corpus shingles, no skew (each corpus gram probes a read-only hash
    set).  ``n_hits`` counts the distinct overlapping grams per document;
    every corpus doc appears in the output (n_hits=0 rows included) so the
    result is a total decontamination verdict, joinable as a keep-filter.
    """
    ps = shingles(probes, n, text_col).select("shingle").distinct()
    cs = shingles(docs, n, text_col)
    hits = (cs.join(F.broadcast(ps), "shingle")
            .groupBy("doc_id")
            .agg(F.count_distinct("shingle").alias("n_hits")))
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    return (ids.join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
                    .alias("n_hits"),
                    (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
                    .alias("contaminated")))
