"""Posting Format API (formats.py) — payload declaration per index/field.

Upstream ``src/whoosh/formats.py`` (Existence ≈L130, Frequency ≈L180,
Positions ≈L240, Characters ≈L280): the format decides what each posting
stores.  Here that's a columnar reshaping of the analyzed frame before the
posting shuffle; these tests pin (a) score-neutrality of ``frequency`` for
non-positional queries, (b) tf:=1 under ``existence``, (c) the positional-
query guard, (d) persistence + resume-guard through write_index/load_index,
(e) the register_format extension point, (f) per-field formats in a
MultiFieldIndex schema.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from whoosh_spark import formats as FMT
from whoosh_spark.index import InvertedIndex
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


@pytest.fixture(scope="module")
def small_docs(spark, sf0001_documents):
    return sf0001_documents.where(F.col("doc_id") < 120).cache()


@pytest.fixture(scope="module")
def pos_ix(small_docs):
    return InvertedIndex.build(small_docs)


@pytest.fixture(scope="module")
def freq_ix(small_docs):
    return InvertedIndex.build(small_docs, format="frequency")


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in df.select("doc_id", "score").collect()]


def test_frequency_scores_identical_for_nonpositional(pos_ix, freq_ix):
    q = Q.And([Q.Term("big"), Q.Term("data")])
    a = Searcher(pos_ix).search(q, limit=20, optimize=False)
    b = Searcher(freq_ix).search(q, limit=20, optimize=False)
    assert _rows(a) == _rows(b)
    # WAND path too (block max_weight unchanged by dropping positions)
    aw = Searcher(pos_ix).search(Q.Term("data"), limit=10)
    bw = Searcher(freq_ix).search(Q.Term("data"), limit=10)
    assert _rows(aw) == _rows(bw)


def test_frequency_blocks_drop_positions_bytes(pos_ix, freq_ix):
    def pos_bytes(ix):
        return int(ix.blocks.select(
            F.sum(F.length("positions")).alias("b")).collect()[0]["b"])

    def n_postings(ix):
        return int(ix.blocks.select(F.sum("n").alias("n")).collect()[0]["n"])

    # empty blob = 1 byte (varint 0) per posting; real positions are larger
    assert pos_bytes(freq_ix) == n_postings(freq_ix)
    assert pos_bytes(pos_ix) > 2 * pos_bytes(freq_ix)


def test_positional_query_raises_on_frequency_format(freq_ix):
    s = Searcher(freq_ix)
    with pytest.raises(ValueError, match="does not store positions"):
        s.search(Q.Phrase(["big", "data"]), limit=5, optimize=False).collect()
    with pytest.raises(ValueError, match="does not store positions"):
        freq_ix.postings(["data"], with_positions=True)


def test_existence_forces_tf_one(small_docs, pos_ix):
    ex_ix = InvertedIndex.build(small_docs, format="existence")
    tfs = [float(r["tf"]) for r in ex_ix.postings(["data"]).collect()]
    assert tfs and set(tfs) == {1.0}
    # the positions-format index genuinely has tf > 1 somewhere for 'data'
    base = [float(r["tf"]) for r in pos_ix.postings(["data"]).collect()]
    assert max(base) > 1.0
    # doc membership identical, scores differ (tf saturation gone)
    a = {int(r["doc_id"]) for r in pos_ix.postings(["data"]).collect()}
    b = {int(r["doc_id"]) for r in ex_ix.postings(["data"]).collect()}
    assert a == b


def test_write_load_roundtrip_and_resume_guard(spark, small_docs, tmp_path):
    from whoosh_spark.store import load_index, write_index

    path = str(tmp_path / "freq_ix")
    man = write_index(small_docs, path, format="frequency")
    assert man["posting_format"] == "frequency"
    ix = load_index(spark, path)
    assert ix.posting_format == "frequency"
    got = _rows(Searcher(ix).search(Q.Term("data"), limit=10))
    mem = _rows(Searcher(InvertedIndex.build(small_docs, format="frequency"))
                .search(Q.Term("data"), limit=10))
    assert got == mem
    with pytest.raises(ValueError, match="does not store positions"):
        Searcher(ix).search(Q.Phrase(["big", "data"]), optimize=False)
    # resuming the same dir with a DIFFERENT format must refuse
    with pytest.raises(ValueError, match="wipe the index dir"):
        write_index(small_docs, path, format="positions")
    # deletion clones carry the format (snapshot-attr propagation)
    clone = ix.with_deleted(spark.createDataFrame([(1,)], "doc_id long"))
    assert clone.posting_format == "frequency"


def test_characters_format_implies_offsets(spark, small_docs, tmp_path):
    from whoosh_spark.store import load_index, write_index

    path = str(tmp_path / "chars_ix")
    man = write_index(small_docs, path, format="characters")
    assert man["posting_format"] == "characters"
    ix = load_index(spark, path)
    assert ix.char_offsets is not None  # side segment written by the switch
    # characters keeps positions: phrase works
    assert _rows(Searcher(ix).search(Q.Phrase(["big", "data"]), limit=5,
                                     optimize=False))


def test_register_custom_format(small_docs):
    def cap2(analyzed):
        return analyzed.withColumn(
            "tfs", F.transform("tfs", lambda t: F.least(t, F.lit(2).cast(
                analyzed.schema["tfs"].dataType.elementType))))

    FMT.register_format(
        FMT.Format("capped2", store_positions=False, transform=cap2),
        overwrite=True)
    ix = InvertedIndex.build(small_docs, format="capped2")
    tfs = [float(r["tf"]) for r in ix.postings(["data"]).collect()]
    assert tfs and max(tfs) <= 2.0
    # registry validation
    with pytest.raises(ValueError, match="already registered"):
        FMT.register_format(FMT.Format("frequency"))
    with pytest.raises(ValueError, match="identifier"):
        FMT.register_format(FMT.Format("no spaces"))
    with pytest.raises(TypeError):
        FMT.register_format("frequency")
    with pytest.raises(ValueError, match="unknown posting format"):
        InvertedIndex.build(small_docs, format="nope")


def test_transform_schema_guard(small_docs):
    bad = FMT.Format("badfmt", transform=lambda df: df.drop("tfs"))
    FMT.register_format(bad, overwrite=True)
    with pytest.raises(ValueError, match="changed the analyzed schema"):
        InvertedIndex.build(small_docs, format="badfmt").blocks.count()


def test_multifield_per_field_formats(small_docs):
    from whoosh_spark.multifield import FieldSpec, MultiFieldIndex

    mix = MultiFieldIndex.build(
        small_docs,
        fields={"text": FieldSpec("text"),
                "lang": FieldSpec("lang", format="existence")},
        default_field="text")
    s = Searcher(mix)
    # default field keeps positions: phrase works
    assert _rows(s.search(Q.Phrase(["big", "data"]), limit=5,
                          optimize=False))
    # existence field: membership query works, tf forced to 1
    lang_ix = mix.index_for("lang")
    assert lang_ix.posting_format == "existence"
    tfs = {float(r["tf"]) for r in lang_ix.postings(["en"]).collect()}
    assert tfs == {1.0}
