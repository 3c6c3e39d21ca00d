"""Training-data pipeline operators: semantics tests on hand-built fixtures
(reference style: tiny corpora, inline expected values) plus scale-shape
assertions (bounded groups, no cross joins where promised)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark.pipeline import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def ddb():
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    yield con
    con.close()


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),          # near dup
        (3, "completely different content about spark engines"),
        (4, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),          # case-variant
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(tiny):
    out = {r["doc_id"]: (r["canonical_id"], r["group_size"])
           for r in dedup.exact_duplicates(tiny).collect()}
    assert out == {0: (0, 2), 1: (0, 2)}  # case-variant is NOT byte-identical


def test_content_fingerprint_case_insensitive(tiny):
    fps = {r["doc_id"]: r["fp"] for r in textstats.content_fingerprint(tiny).collect()}
    assert fps[0] == fps[1] == fps[4]
    assert fps[0] != fps[2]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    assert dedup.shingles(df, n=3).count() == 0


def test_ngram_jaccard_values(tiny):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(tiny, n=3, tau=0.1).collect()}
    # docs 0/1 identical → J=1; 0/2 share 6 of 8 distinct 3-grams → 0.75
    assert pairs[(0, 1)] == 1.0
    assert abs(pairs[(0, 2)] - 0.75) < 1e-6
    assert (0, 3) not in pairs


def test_minhash_matches_exact_jaccard(tiny):
    exact = {(r["a"], r["b"]) for r in
             dedup.ngram_jaccard_pairs(tiny, n=3, tau=0.5).collect()}
    lsh = {(r["a"], r["b"]) for r in
           dedup.minhash_near_dups(tiny, tau=0.5, n=3).collect()}
    assert lsh == exact


def test_lsh_pair_tiers_exact_and_star(spark):
    """Tiered pair expansion: buckets over inline_cap pair via the
    distributed equi-join (EXACT all-pairs, no giant cell); only above
    max_bucket does the star degradation kick in; max_bucket=None is
    exact at any size."""
    sigs = spark.createDataFrame(
        [(i, [1, 2, 3, 4]) for i in range(8)],  # one bucket of 8 per band
        "doc_id long, sig array<long>")
    allp = {(a, b) for a in range(8) for b in range(a + 1, 8)}
    inline = {(r["a"], r["b"]) for r in dedup.lsh_candidate_pairs(
        sigs, bands=2, rows=2).collect()}                      # in-array tier
    big = {(r["a"], r["b"]) for r in dedup.lsh_candidate_pairs(
        sigs, bands=2, rows=2, max_bucket=None, inline_cap=3).collect()}
    star = {(r["a"], r["b"]) for r in dedup.lsh_candidate_pairs(
        sigs, bands=2, rows=2, max_bucket=5, inline_cap=3).collect()}
    assert inline == allp
    assert big == allp                                          # join tier
    assert star == {(0, i) for i in range(1, 8)}                # hub only


def test_minhash_max_bucket_none_matches_exact(tiny):
    exact = {(r["a"], r["b"]) for r in
             dedup.ngram_jaccard_pairs(tiny, n=3, tau=0.5).collect()}
    lsh = {(r["a"], r["b"]) for r in
           dedup.minhash_near_dups(tiny, tau=0.5, n=3, max_bucket=None).collect()}
    assert lsh == exact


def test_simhash_identical_docs_distance_zero(tiny):
    out = {(r["a"], r["b"]): r["hamming"]
           for r in dedup.simhash_near_dups(tiny, max_hamming=16).collect()}
    assert out[(0, 1)] == 0


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "ab cd.ef 12 x!")], "doc_id long, text string")
    r = textstats.token_counts(df).collect()[0]
    assert (r["n_ws"], r["n_word"], r["n_bpeish"]) == (4, 4, 7)
    # analyzer regex keeps 'cd.ef' whole; bpe-ish splits it into
    # 'cd', '.', 'ef' and separates '!' (ab, cd, ., ef, 12, x, ! = 7)


def test_quality_monotone(spark):
    good = "the data engine writes many words " * 5
    bad = "!!! ??? ### @@@"
    df = spark.createDataFrame([(0, good), (1, bad)], "doc_id long, text string")
    q = {r["doc_id"]: r["quality"] for r in textstats.quality_features(df).collect()}
    assert q[0] > q[1]


LANG_SAMPLES = [
    (0, "the cat and the dog sat in the house with a friend", "en"),
    (1, "le chat et la maison les amis de la ville est une", "fr"),
    (2, "der hund und die katze von dem haus mit den freunden", "de"),
    (3, "東京 大阪 京都 名古屋 札幌 神戸 福岡 広島 仙台 千葉", "zh"),  # Kanji-only → zh (documented)
    (4, "il gatto di casa che dorme con il cane della città per ore", "it"),
    (5, "os gatos não dormem para sempre com os cães mais velhos dos vizinhos", "pt"),
    (6, "het huis van een kat die niet op de hond wacht maar ook slaapt", "nl"),
    (7, "он сказал что это не так как мы думали и по этому поводу", "ru"),
    (8, "猫は家の中で犬と一緒に寝ています、とても静かです", "ja"),
    (9, "고양이는 집에서 개와 함께 잠을 잡니다 아주 조용해요", "ko"),
]


def test_lang_id_profiles(spark):
    df = spark.createDataFrame([(i, t) for i, t, _ in LANG_SAMPLES],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(df).collect()}
    assert out == {i: lang for i, _, lang in LANG_SAMPLES}


def test_lang_id_oracle_parity(spark):
    """Spark lang_id ≡ the DuckDB oracle SQL on multilingual text (the
    driver's documents are English-only, so parity on the CJK/Cyrillic
    branches is only proven here)."""
    import duckdb
    from whoosh_spark.oracle import pipeline_sql as PSQL
    df = spark.createDataFrame([(i, t) for i, t, _ in LANG_SAMPLES],
                               "doc_id long, text string")
    got = [(r["doc_id"], r["lang_pred"], r["lang_score"])
           for r in textstats.lang_id(df).orderBy("doc_id").collect()]
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    exp = con.execute(PSQL.lang_id_sql()).fetchall()
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in exp]
    for g, e in zip(got, exp):
        assert g[2] == pytest.approx(e[2], abs=1e-9)


def test_winnow_overlap_detection(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "XX " + a + " YY"  # contains a as substring-token run
    c = "unrelated words entirely different from the others here now"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], "doc_id long, text string")
    fps = {r["doc_id"]: set(r["fingerprints"])
           for r in textstats.winnow_fingerprints(df, k=3, w=2).collect()}
    assert fps[0] & fps[1]          # shared fingerprints from the overlap
    assert not (fps[0] & fps[2])


def test_cosine_topk_self_first(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = similarity.cosine_topk(df, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cos"] == 1.0


def test_ann_contains_self(spark):
    import numpy as np
    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in rows[5][1]]
    top = similarity.ann_topk(df, q, k=3, bits=6)
    assert top.collect()[0]["vec_id"] == 5


def test_embedding_near_dups_exact_vs_lsh_recall(spark):
    """Planted near-dups: the banded LSH path must equal the exact grid join
    at the operating point (deterministic: seeded data + seeded planes)."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    base = rng.standard_normal((40, 16))
    vecs = [(i, base[i]) for i in range(40)]
    vecs += [(100 + i, base[i] + 0.02 * rng.standard_normal(16))
             for i in range(10)]  # 10 planted near-dups, cos ≈ 0.997+
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>")
    exact = {(r["a"], r["b"]): r["cos"] for r in
             similarity.embedding_near_dups_exact(df, tau=0.95, grid=4).collect()}
    assert len(exact) >= 10  # all planted pairs found by the exact baseline
    lsh = {(r["a"], r["b"]): r["cos"] for r in
           similarity.embedding_near_dups(df, tau=0.95, bits=128, bands=16).collect()}
    assert set(lsh) <= set(exact)  # LSH never invents pairs
    assert lsh == exact            # full recall at the operating point


def test_embedding_near_dups_skew_bomb_tiers(spark):
    """Degenerate corpus region: thousands of IDENTICAL embeddings share every
    band key.  The tiered bucket expansion (ported from MinHash LSH) must keep
    the pair count linear above ``max_bucket`` (connectivity-preserving star),
    stay exact all-pairs in the mid tier, and equal brute force with
    ``max_bucket=None``."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=[13, 0]))
    v = [float(x) for x in rng.standard_normal(8)]
    n = 2000
    rows = [(i, v) for i in range(n)]
    # a few distinct background vectors that must NOT pair with the clone blob
    rows += [(10_000 + i, [float(x) for x in rng.standard_normal(8)])
             for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # star tier: bucket of 2000 clones > max_bucket → n-1 pairs, not C(n,2)
    star = similarity.embedding_near_dups(
        df, tau=0.99, bits=64, bands=8, max_bucket=256).collect()
    assert len(star) == n - 1                     # linear, bounded expansion
    assert all(r["a"] == 0 and r["cos"] == 1.0 for r in star)  # star center=min id
    assert {r["b"] for r in star} == set(range(1, n))  # cluster connectivity

    # mid tier (inline_cap < size <= max_bucket): distributed per-bucket
    # equi-join stays EXACT all-pairs
    small = spark.createDataFrame(rows[:300], "vec_id long, embedding array<float>")
    mid = similarity.embedding_near_dups(
        small, tau=0.99, bits=64, bands=8, inline_cap=64, max_bucket=4096)
    assert mid.count() == 300 * 299 // 2

    # max_bucket=None: brute-force-equal under any skew
    exact = similarity.embedding_near_dups(
        small, tau=0.99, bits=64, bands=8, max_bucket=None)
    assert exact.count() == 300 * 299 // 2


def test_multimodal_shapes(spark):
    from whoosh_spark.corpus import pages_df

    pages = pages_df(spark, 20, partitions=2)
    meta = multimodal.media_metadata(pages)
    assert meta.columns == ["doc_id", "n_bytes", "sha", "magic"]
    assert meta.count() == 20
    assert meta.where(F.col("magic") == "3C68746D").count() == 20  # '<htm'

    dec = multimodal.decode_image(pages, impl=multimodal.fake_decode, feat_dim=8)
    rows = dec.collect()
    assert len(rows) == 20 and all(len(r["features"]) == 8 for r in rows)

    with pytest.raises(Exception):  # stub path raises NotImplementedError
        multimodal.decode_image(pages).collect()

    frames = multimodal.frame_sample(pages, every_n_bytes=128, max_frames=3)
    assert frames.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0] <= 3


class TestHtmlExtract:
    def test_corpus_byte_identity(self, spark):
        """North-rule invariant: extracted text byte-identical per url."""
        from whoosh_spark.corpus import pages_df
        from whoosh_spark.pipeline.extract import extract_text

        pages = pages_df(spark, 100, seed=11, partitions=4)
        j = (extract_text(pages).alias("e")
             .join(pages.select("url", F.col("text").alias("ref")).alias("p"),
                   "url"))
        assert j.where(F.col("e.text") != F.col("ref")).count() == 0

    def test_noise_stripping_and_entities(self, spark):
        from whoosh_spark.pipeline.extract import extract_text

        html = (b"<html><head><title>T</title>"
                b"<SCRIPT>var a = '<p>not text</p>';</SCRIPT>"
                b"<style>p { color: red }</style></head>"
                b"<body><!-- hidden --><p>Tom &amp; Jerry&#39;s</p>"
                b"<div>a &lt;b&gt; &quot;c&quot;&nbsp;d</div>\n"
                b"  e\t f </body></html>")
        df = spark.createDataFrame([(1, html)], "doc_id long, html binary")
        out = extract_text(df).collect()[0]
        assert out["text"] == 'T Tom & Jerry\'s a <b> "c" d e f'

    def test_oracle_parity(self, spark, ddb):
        from whoosh_spark.oracle.pipeline_sql import html_extract_sql
        from whoosh_spark.pipeline.extract import extract_text

        pre = '<html><script>if (a) { b(); }</script><p>'
        suf = '</p><i>x &amp; y&nbsp;&#39;z&#39;</i></html>'
        pages = ddb.sql("SELECT doc_id, text FROM documents").df()
        sdf = spark.createDataFrame(pages).select(
            "doc_id",
            F.encode(F.concat(F.lit(pre), F.col("text"), F.lit(suf)),
                     "UTF-8").alias("html"))
        got = {r["doc_id"]: r["text"]
               for r in extract_text(sdf).collect()}
        want = {r[0]: r[1] for r in ddb.sql(html_extract_sql(pre, suf)).fetchall()}
        assert got == want


class TestRepetition:
    def test_hand_computed(self, spark):
        rows = [
            (0, "a b a b c"),       # words: dup a,b (4/5); bigrams: "a b" x2 of 4
            (1, "x"),               # single word, no bigrams
            (2, ""),                # empty
            (3, "u v w"),           # no repetition
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               textstats.repetition_features(df).collect()}
        assert out[0]["n_words"] == 5
        assert out[0]["dup_word_frac"] == 0.8
        assert out[0]["top_bigram_frac"] == 0.5       # "a b" twice of 4
        assert out[0]["dup_bigram_frac"] == 0.5
        assert out[1]["n_words"] == 1 and out[1]["top_bigram_frac"] == 0.0
        assert out[2]["n_words"] == 0 and out[2]["dup_word_frac"] == 0.0
        assert out[3]["dup_word_frac"] == 0.0 and out[3]["dup_bigram_frac"] == 0.0


class TestUrlCanonical:
    def test_normalization_rules(self, spark):
        from whoosh_spark.pipeline.urls import canonical_urls

        rows = [
            (0, "HTTPS://Example.COM:443/A/b?z=1&a=2#frag"),
            (1, "http://example.com:80/x"),
            (2, "http://example.com:8080/x"),          # non-default port kept
            (3, "https://example.com/p?"),              # empty query stripped
            (4, "https://example.com/p?b=2&a=1"),
            (5, "https://example.com/p?a=1&b=2"),       # same params, sorted
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = {r["doc_id"]: r["url_canon"]
               for r in canonical_urls(df).collect()}
        assert got[0] == "https://example.com/A/b?a=2&z=1"
        assert got[1] == "http://example.com/x"
        assert got[2] == "http://example.com:8080/x"
        assert got[3] == "https://example.com/p"
        assert got[4] == got[5] == "https://example.com/p?a=1&b=2"

    def test_dedup_groups(self, spark):
        from whoosh_spark.pipeline.urls import url_duplicates

        rows = [(0, "http://a.com/x"), (1, "HTTP://A.com:80/x#f"),
                (2, "http://b.com/y")]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = {r["doc_id"]: (r["canonical_id"], r["group_size"])
               for r in url_duplicates(df).collect()}
        assert out == {0: (0, 2), 1: (0, 2)}

    def test_corpus_urls_stable(self, spark):
        """Already-canonical corpus urls pass through unchanged."""
        from whoosh_spark.corpus import pages_df
        from whoosh_spark.pipeline.urls import canonical_urls

        pages = pages_df(spark, 50, seed=3)
        j = canonical_urls(pages).join(pages.select("doc_id", "url"), "doc_id")
        assert j.where(F.col("url_canon") != F.col("url")).count() == 0


class TestNormalizeText:
    def test_nfc_and_controls(self, spark):
        from whoosh_spark.pipeline.extract import normalize_text

        nfd = "cafe" + chr(769)           # e + combining acute
        df = spark.createDataFrame(
            [(0, nfd + " \x07\x00ok\ttab")], "doc_id long, text string")
        out = normalize_text(df).collect()[0]["text"]
        assert out == "café ok\ttab"  # composed, BEL/NUL gone, tab kept


class TestLineDedup:
    def test_first_occurrence_kept(self, spark):
        rows = [
            (0, "keep me\nshared line\nunique zero"),
            (1, "shared line\nunique one\nshared line"),
            (2, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in dedup.line_dedup(df).collect()}
        assert out[0]["text"] == "keep me\nshared line\nunique zero"
        assert out[0]["n_dropped"] == 0
        # doc 1 loses BOTH copies of the shared line (doc 0 owns it)
        assert out[1]["text"] == "unique one"
        assert out[1]["n_lines"] == 3 and out[1]["n_dropped"] == 2
        assert out[2]["text"] == "" and out[2]["n_lines"] == 1

    def test_short_lines_kept_verbatim(self, spark):
        rows = [(0, "a\n\nb"), (1, "a\n\nb")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["text"]
               for r in dedup.line_dedup(df, min_chars=2).collect()}
        # 1-char lines are structure: both docs keep them; nothing ≥2 chars
        assert out[0] == "a\n\nb" and out[1] == "a\n\nb"


def test_host_stats(spark):
    from whoosh_spark.pipeline.urls import host_stats

    rows = [(0, "HTTP://A.com:80/x", "abc"), (1, "http://a.com/y", "defgh"),
            (2, "https://b.org/z", "ij")]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r["host"]: (r["n_docs"], r["n_chars"])
           for r in host_stats(df).collect()}
    assert out == {"a.com": (2, 8), "b.org": (1, 2)}


class TestPipelineReviewRegressions:
    """Round-2 pipeline review findings (session 2026-08-19)."""

    def test_schemeless_urls_not_fused(self, spark):
        from whoosh_spark.pipeline import urls

        docs = spark.createDataFrame(
            [(0, "www.example.com/a"), (1, "mailto:x@y.com"),
             (2, "//cdn.z.com/q"), (3, "HTTP://A.com/p#frag"),
             (4, "http://a.com/p")],
            "doc_id long, url string")
        canon = {r["doc_id"]: r["url_canon"]
                 for r in urls.canonical_urls(docs).collect()}
        # schemeless/malformed pass through unchanged (fragment dropped)
        assert canon[0] == "www.example.com/a"
        assert canon[2] == "//cdn.z.com/q"
        assert "" not in canon.values()
        # real duplicates still group (case-folded scheme+host, no frag)
        assert canon[3] == canon[4] == "http://a.com/p"
        dups = urls.url_duplicates(docs).collect()
        assert {int(r["doc_id"]) for r in dups} == {3, 4}

    def test_extract_survives_malformed_utf8(self, spark):
        from whoosh_spark.pipeline import extract

        docs = spark.createDataFrame(
            [(0, bytearray(b"<p>ok</p>")),
             (1, bytearray(b"<p>bad \xff\xfe bytes</p>"))],
            "doc_id long, html binary")
        rows = {r["doc_id"]: r["text"]
                for r in extract.extract_text(docs).collect()}
        assert rows[0] == "ok"
        assert "bad" in rows[1] and "bytes" in rows[1]  # no job abort

    def test_pack_sequences_null_text(self, spark):
        from whoosh_spark.pipeline import sampling

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, None), (3, "d e")],
            "doc_id long, text string")
        rows = {r["doc_id"]: (r["n_tokens"], r["bin_id"])
                for r in sampling.pack_sequences(docs, budget=4).collect()}
        assert rows[2][0] == 0  # NULL text = 0 tokens, not a crash
        # exclusive prefix sums: doc1 at 0 → bin 0; doc3 at 3 → 3//4 = 0
        assert rows[1] == (3, 0) and rows[3] == (2, 0)

    def test_lsh_width_validation(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b c d e f g"), (1, "a b c d e f h")],
            "doc_id long, text string")
        with pytest.raises(ValueError, match="num_perm"):
            dedup.minhash_near_dups(docs, num_perm=8, bands=4, rows=4)

    def test_winnow_matches_oracle_on_unicode_ws(self, spark):
        # NBSP must NOT split tokens - the DuckDB oracle's RE2 '\\s' is
        # ASCII-only, and the Python side must match it exactly
        import duckdb

        from whoosh_spark.oracle import pipeline_sql as P

        text = "aa\u00a0bb cc dd ee ff gg\thh\u2028ii"
        docs = spark.createDataFrame(
            [(0, text)], "doc_id long, text string")
        got = sorted(
            int(fp)
            for r in textstats.winnow_fingerprints(docs, k=3, w=2).collect()
            for fp in r["fingerprints"])
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = sorted(int(b) for _, b in
                      con.execute(P.winnow_sql(3, 2)).fetchall())
        assert got == want and got

    def test_prep_corpus_gates_before_dedup(self, spark):
        # fingerprint ignores case/punct; doc 1 (min id, fails quality gate)
        # must not evict its passing duplicate doc 9
        good = "the cat sat on the mat and looked at the big warm sun"
        docs = spark.createDataFrame(
            [(1, good + " !!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"),
             (9, good)],
            "doc_id long, text string")
        kept = {int(r["doc_id"])
                for r in textstats.prep_corpus(docs, min_quality=0.5).collect()}
        assert 9 in kept

    def test_similarity_empty_and_guards(self, spark):
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>")
        assert similarity.ann_topk(empty, [1.0, 0.0], k=3).count() == 0
        assert similarity.ivf_topk(empty, [1.0, 0.0], k=3).count() == 0
        assert similarity.embedding_near_dups(empty).count() == 0
        with pytest.raises(ValueError, match="bits"):
            similarity.rp_lsh_buckets(empty, bits=72)
        with pytest.raises(ValueError, match="band width"):
            similarity.embedding_near_dups(empty, bits=256, bands=2)
