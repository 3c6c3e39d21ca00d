"""Codec registry: named storage encodings (blocks / plaintext / custom)
with write-side dispatch (dump_index) and sniffing reads (open_index).
Mirrors upstream codec/base.py::Codec pluggability over the Spark layout."""

from __future__ import annotations

import pytest

from whoosh_spark.codec import registry as R
from whoosh_spark.query import ast as Q
from whoosh_spark.search import Searcher


def _topk(ix, q=Q.Term("data"), k=10):
    return [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in Searcher(ix).search(q, limit=k).collect()]


def test_blocks_codec_roundtrip(spark, ix, tmp_path):
    path = str(tmp_path / "blocks_dump")
    manifest = R.dump_index(ix, path, codec="blocks")
    assert manifest["codec"] == "blocks"
    assert R.sniff_codec(path) == "blocks"
    ix2 = R.open_index(spark, path)
    assert _topk(ix2) == _topk(ix)
    # stored fields survive the blocks dump
    assert "source" in ix2.docs.columns


def test_plaintext_codec_roundtrip(spark, ix, tmp_path):
    path = str(tmp_path / "ptxt_dump")
    R.dump_index(ix, path, codec="plaintext")
    assert R.sniff_codec(path) == "plaintext"
    ix2 = R.open_index(spark, path)
    assert _topk(ix2) == _topk(ix)


def test_open_index_on_write_index_dir(spark, sf0001_documents, tmp_path):
    """A dir written by store.write_index (no marker file) sniffs as the
    blocks codec via its manifest."""
    from whoosh_spark import store

    path = str(tmp_path / "wi")
    store.write_index(sf0001_documents, path)
    assert R.sniff_codec(path) == "blocks"
    ix2 = R.open_index(spark, path)
    assert len(_topk(ix2)) == 10


def test_open_index_on_bare_plaintext_dump(spark, ix, tmp_path):
    """dump_plaintext called directly (no registry marker) still opens."""
    from whoosh_spark.codec.plaintext import dump_plaintext

    path = str(tmp_path / "bare_ptxt")
    dump_plaintext(ix, path)
    assert R.sniff_codec(path) == "plaintext"
    ix2 = R.open_index(spark, path)
    assert _topk(ix2) == _topk(ix)


def test_custom_codec_dispatch(spark, ix, tmp_path):
    """A registered custom codec is reachable through dump_index/open_index
    without callers naming it at read time."""
    calls = []

    def dump(i, p):
        calls.append("dump")
        return R.get_codec("plaintext").dump(i, p)

    def load(sp, p):
        calls.append("load")
        return R.get_codec("plaintext").load(sp, p)

    R.register_codec(R.Codec("custom_txt", dump=dump, load=load),
                     overwrite=True)
    try:
        path = str(tmp_path / "custom")
        R.dump_index(ix, path, codec="custom_txt")
        assert R.sniff_codec(path) == "custom_txt"
        ix2 = R.open_index(spark, path)
        assert calls == ["dump", "load"]
        assert _topk(ix2) == _topk(ix)
    finally:
        R.CODECS.pop("custom_txt", None)


def test_registry_validation():
    with pytest.raises(ValueError, match="unknown codec"):
        R.get_codec("nope")
    with pytest.raises(TypeError, match="expected a Codec"):
        R.register_codec(object())
    with pytest.raises(ValueError, match="identifier"):
        R.register_codec(R.Codec("not a name", dump=print, load=print))
    with pytest.raises(TypeError, match="callable"):
        R.register_codec(R.Codec("badcall", dump=None, load=print))
    with pytest.raises(ValueError, match="already registered"):
        R.register_codec(R.Codec("blocks", dump=print, load=print))


def test_sniff_unrecognized_dir(tmp_path):
    with pytest.raises(FileNotFoundError, match="no index recognized"):
        R.sniff_codec(str(tmp_path))

def test_failed_dump_drops_stale_toc(spark, ix, tmp_path):
    """A partial re-dump over an existing index must not leave the OLD
    manifest/marker in place — open_index would silently mix generations."""
    path = str(tmp_path / "redump")
    R.dump_index(ix, path, codec="blocks")

    def bad_dump(i, p):
        raise RuntimeError("disk full mid-dump")

    R.register_codec(R.Codec("explode", dump=bad_dump, load=print),
                     overwrite=True)
    try:
        with pytest.raises(RuntimeError, match="disk full"):
            R.dump_index(ix, path, codec="explode")
        with pytest.raises(FileNotFoundError, match="no index recognized"):
            R.sniff_codec(path)
    finally:
        R.CODECS.pop("explode", None)


def test_dump_empty_index(spark, tmp_path):
    """Zero-doc index dumps without crashing and records zero counters."""
    from whoosh_spark.index import InvertedIndex

    empty = spark.createDataFrame([], "doc_id long, text string")
    ix0 = InvertedIndex.build(empty)
    manifest = R.dump_index(ix0, str(tmp_path / "empty"), codec="blocks")
    assert manifest["n_docs"] == 0
    assert manifest["total_len"] == 0


def test_dump_carries_source_manifest_facts(spark, sf0001_documents, tmp_path):
    """store_text/chunk_bits in a re-dumped manifest reflect the SOURCE
    index, not hardcoded defaults."""
    from whoosh_spark import store

    src_path = str(tmp_path / "src")
    store.write_index(sf0001_documents, src_path, store_text=True,
                      chunk_bits=12)
    ix1 = store.load_index(spark, src_path)
    manifest = R.dump_index(ix1, str(tmp_path / "redump2"), codec="blocks")
    assert manifest["store_text"] is True
    assert manifest["chunk_bits"] == 12
