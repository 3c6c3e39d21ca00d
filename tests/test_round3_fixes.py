"""Regressions for the round-3 review findings: TimeLimit partial mode
honors the child collector's order and slices the pre-limit frame, the
plaintext loader rejects hand-edit corruption instead of encoding garbage,
and Format transforms are validated by full (name, type) signature."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import collectors as C
from whoosh_spark.query import ast as Q


def test_timelimit_partial_keeps_sorting_order(searcher):
    """TimeLimitCollector(SortingCollector) partial rows must come back in
    the CHILD's stored-field order, not hardcoded score order."""
    child = C.SortingCollector("n_chars", limit=10)
    c = C.TimeLimitCollector(child, timelimit=300.0, partial=True)
    searcher.search_with_collector(Q.Term("the"), c)
    assert not c.timed_out
    got = [(int(r["doc_id"]), int(r["n_chars"])) for r in c.rows]
    want = [(int(r["doc_id"]), int(r["n_chars"]))
            for r in searcher.search(Q.Term("the"), limit=10,
                                     sortedby="n_chars",
                                     with_stored=["n_chars"]).collect()]
    assert got == want


def test_timelimit_partial_matches_unchunked_topk(searcher):
    c = C.TimeLimitCollector(C.TopCollector(10), timelimit=300.0)
    searcher.search_with_collector(Q.Term("the"), c)
    assert not c.timed_out
    got = [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in c.rows]
    want = [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in searcher.search(Q.Term("the"), limit=10).collect()]
    assert got == want


def test_timelimit_partial_rejects_missing_columns(searcher):
    """A custom terminal collector whose frame drops doc_id/score must get
    a clear TypeError from partial mode, not an AnalysisException."""

    class Custom(C.Collector):
        def collect(self, ctx, scores):
            return scores.groupBy().agg(F.count("*").alias("n"))

        def order_spec(self, ctx):
            return []

    c = C.TimeLimitCollector(Custom(), timelimit=300.0, partial=True)
    with pytest.raises(TypeError, match="doc_id"):
        searcher.search_with_collector(Q.Term("the"), c)


def test_format_transform_type_change_raises(spark):
    from whoosh_spark.formats import Format

    df = spark.createDataFrame(
        [(0, ["a"], [1], [bytearray(b"\x01\x00")], 1, 1)],
        "doc_id long, terms array<string>, tfs array<long>, "
        "pos_blobs array<binary>, len_raw int, dl int")
    bad = Format("bad_cast", transform=lambda d: d.withColumn(
        "tfs", F.col("tfs").cast("array<double>")))
    with pytest.raises(ValueError, match="changed the analyzed schema"):
        bad.apply(df)
    # name-preserving, type-preserving transform passes
    ok = Format("ok_noop", transform=lambda d: d.withColumn(
        "tfs", F.transform("tfs", lambda t: t + F.lit(0))))
    ok.apply(df)


@pytest.fixture(scope="module")
def dumped(tmp_path_factory, ix):
    from whoosh_spark.codec.plaintext import dump_plaintext

    path = str(tmp_path_factory.mktemp("ptxt"))
    dump_plaintext(ix, path)
    return path


def _corrupt_posting(spark, path: str, mutate) -> None:
    """Rewrite the postings/ text dir with the first MULTI-POSITION line
    mutated (mutate returns None to skip a line)."""
    import glob

    files = sorted(glob.glob(f"{path}/postings/part-*"))
    lines = []
    for f in files:
        with open(f) as fh:
            lines.extend(fh.read().splitlines())
    for i, ln in enumerate(lines):
        m = mutate(ln)
        if m is not None:
            lines[i] = m
            break
    else:
        raise AssertionError("no mutable posting line found")
    import shutil
    shutil.rmtree(f"{path}/postings")
    spark.createDataFrame([(ln,) for ln in lines], "value string") \
        .coalesce(1).write.mode("overwrite").text(f"{path}/postings")


def test_plaintext_unsorted_positions_are_sorted(spark, dumped, tmp_path):
    """Hand-edited position order must round-trip to the SORTED list, never
    a negative-delta varint bomb."""
    import shutil

    from whoosh_spark.codec.plaintext import load_plaintext

    path = str(tmp_path / "unsorted")
    shutil.copytree(dumped, path)

    def reverse_positions(line):
        parts = line.split("\t")
        pos = parts[4].split(",")
        if len(pos) < 2 or pos == list(reversed(pos)):
            return None  # keep looking for a multi-position line
        parts[4] = ",".join(reversed(pos))
        return "\t".join(parts)

    _corrupt_posting(spark, path, reverse_positions)
    ix2 = load_plaintext(spark, path)
    # every decoded position list is strictly ascending and non-negative
    posts = ix2.postings_where(F.lit(True), with_positions=True)
    bad = posts.where(
        F.exists(F.zip_with(
            F.slice("positions", 1, F.greatest(F.size("positions") - 1,
                                               F.lit(0))),
            F.slice("positions", 2, F.greatest(F.size("positions") - 1,
                                               F.lit(0))),
            lambda a, b: b <= a), lambda x: x)
        | (F.element_at("positions", 1) < 0)).count()
    assert bad == 0


def _bump_tf(ln):
    parts = ln.split("\t")
    parts[3] = str(int(parts[3]) + 1)
    return "\t".join(parts)


@pytest.mark.parametrize("mutation,err_match", [
    (lambda ln: "\t".join(ln.split("\t")[:4] + ["5,x3"]), "non-numeric"),
    (_bump_tf, "tf disagrees"),
])
def test_plaintext_malformed_dump_raises(spark, dumped, tmp_path,
                                         mutation, err_match):
    import shutil

    from whoosh_spark.codec.plaintext import load_plaintext

    path = str(tmp_path / "bad")
    shutil.copytree(dumped, path)
    _corrupt_posting(spark, path, mutation)
    ix2 = load_plaintext(spark, path)
    with pytest.raises(Exception, match=err_match):
        # load is lazy (mapInArrow); force the decode
        ix2.blocks.count()


# ---- review findings: boost validation on hand-written __init__ nodes -----

@pytest.mark.parametrize("bad", [
    lambda: Q.And([Q.Term("a")], "title"),
    lambda: Q.Or([Q.Term("a")], "title"),
    lambda: Q.DisMax([Q.Term("a")], "title"),
    lambda: Q.Sequence([Q.Term("a")], 1, "title"),
    lambda: Q.Phrase(["web", "index"], 1, "title"),
    lambda: Q.SpanOr([Q.Term("a")], "title"),
])
def test_compound_nodes_validate_boost(bad):
    """Custom __init__ bypassed the dataclass __post_init__, so the classic
    field-name-in-the-boost-slot slip passed construction on compounds."""
    with pytest.raises(TypeError, match="boost must be a number"):
        bad()


# ---- review findings: self-merge guard must canonicalize paths ------------

@pytest.mark.parametrize("spell", [
    lambda d: "file://" + d,          # URI spelling of the same local dir
    lambda d: d + "/",                # trailing slash
    lambda d: d + "/../" + d.rsplit("/", 1)[1],  # relative hop
])
def test_merge_indexes_self_merge_guard_canonicalizes(spark, tmp_path, spell):
    from whoosh_spark import store

    dst = str(tmp_path / "ix2")
    with pytest.raises(ValueError, match="must not be one of the sources"):
        store.merge_indexes(spark, [str(tmp_path / "ix1"), spell(dst)], dst)


# ---- review findings: merge-partition env override fails fast -------------

@pytest.mark.parametrize("bad", ["0", "-3"])
def test_merge_partitions_env_rejects_nonpositive(spark, tmp_path,
                                                  monkeypatch, bad):
    from whoosh_spark.store import _merge_partitions

    monkeypatch.setenv("WHOOSH_MERGE_PARTITIONS", bad)
    with pytest.raises(ValueError, match="must be >= 1"):
        _merge_partitions(spark, str(tmp_path))
