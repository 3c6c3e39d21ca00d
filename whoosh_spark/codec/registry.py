"""Codec API — upstream ``src/whoosh/codec/base.py::Codec (≈L50)`` as a
registry of named STORAGE encodings.

Split of responsibilities (mirrors upstream):

* a **Format** (:mod:`whoosh_spark.formats`) decides WHAT each posting
  stores (positions / tf / existence payload);
* a **Codec** decides HOW an index's logical content — postings, doc
  lengths, stored fields, stats — persists on disk.

Upstream ships ``W3Codec`` (the production block file format),
``PlainTextCodec`` (``codec/plaintext.py``) and ``MemoryCodec``; pluggable
through the ``FileIndex.create(..., codec=...)`` argument.  The Spark
restatement registers:

* ``"blocks"`` — the production layout ``store.write_index`` emits
  (varint/FOR posting blocks + parquet tables + JSON manifest).  The
  MemoryCodec analog is ``InvertedIndex.build`` (in-session frames, no
  persistence), so it needs no registry entry.
* ``"plaintext"`` — the greppable line-oriented debug dump
  (:mod:`whoosh_spark.codec.plaintext`), faithful round-trip.

A CUSTOM codec is a :class:`Codec` with two callables — ``dump(ix, path)``
persisting an :class:`~whoosh_spark.index.InvertedIndex`'s logical content
and ``load(spark, path)`` reconstructing it — registered through
:func:`register_codec` (validated like ``register_analyzer`` /
``register_format``).  :func:`dump_index` dispatches writes;
:func:`open_index` sniffs the on-disk marker and dispatches reads, so
callers never hardcode the encoding.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable

from whoosh_spark import fs as FS

_CODEC_MARKER = "_codec"  # tiny text file naming the codec that wrote a dir


@dataclass(frozen=True)
class Codec:
    """Named storage encoding: ``dump(ix, path) -> dict`` persists the
    index's logical content (returns its header/manifest), ``load(spark,
    path) -> InvertedIndex`` reconstructs a queryable index."""

    name: str
    dump: Callable
    load: Callable


def _dump_blocks(ix, path: str) -> dict:
    """Persist an in-session index through the standard parquet layout —
    the same dirs + manifest ``store.write_index`` produces, minus the
    analyze-phase checkpoints (this writes an ALREADY-BUILT index, e.g.
    one loaded from another codec or built in memory)."""
    for name, df in (("blocks", ix.blocks), ("term_stats", ix.term_stats),
                     ("field_stats", ix.field_stats),
                     ("doc_lengths", ix.doc_lengths)):
        df.write.mode("overwrite").parquet(FS.join(path, name))
    docs = ix.docs
    if docs is None:
        # load_index reads docs/ unconditionally; an index without stored
        # fields (e.g. plaintext-loaded) persists the id column only
        docs = ix.doc_lengths.select("doc_id")
    docs.write.mode("overwrite").parquet(FS.join(path, "docs"))
    if ix.char_offsets is not None:
        ix.char_offsets.write.mode("overwrite").parquet(
            FS.join(path, "char_offsets"))
    if ix.boosts is not None:
        ix.boosts.write.mode("overwrite").parquet(FS.join(path, "boosts"))
    if ix.deleted is not None:
        ix.deleted.write.mode("overwrite").parquet(FS.join(path, "deleted"))
    fs_rows = ix.field_stats.collect()
    # an empty index aggregates to no row / NULL counters (global_stats
    # handles the same state)
    n_docs = int(fs_rows[0]["doc_count"] or 0) if fs_rows else 0
    total_len = int(fs_rows[0]["total_len"] or 0) if fs_rows else 0
    import time as _time

    from whoosh_spark.store import DEFAULT_CHUNK_BITS

    # carry source-index facts forward when it was loaded from a manifest
    # (a freshly built in-session index has none)
    src = getattr(ix, "manifest", None) or {}
    manifest = {
        "format": "whoosh-spark/1",
        "codec": "blocks",
        "generation": int(_time.time()),
        "field": ix.field,
        "chunk_bits": src.get("chunk_bits", DEFAULT_CHUNK_BITS),
        "n_docs": n_docs,
        "total_len": total_len,
        "store_text": src.get("store_text", False),
        "analyzer": ix.analyzer,
        "text_col": ix.text_col,
        "posting_format": ix.posting_format,
    }
    FS.write_text_atomic(FS.join(path, "manifest.json"),
                         json.dumps(manifest, indent=1))
    return manifest


def _load_blocks(spark, path: str):
    from whoosh_spark.store import load_index

    return load_index(spark, path)


def _load_plaintext(spark, path: str):
    from whoosh_spark.codec.plaintext import load_plaintext

    return load_plaintext(spark, path)


def _dump_plaintext(ix, path: str) -> dict:
    from whoosh_spark.codec.plaintext import dump_plaintext

    return dump_plaintext(ix, path)


CODECS: dict[str, Codec] = {
    "blocks": Codec("blocks", dump=_dump_blocks, load=_load_blocks),
    "plaintext": Codec("plaintext", dump=_dump_plaintext,
                       load=_load_plaintext),
}


def get_codec(name: str) -> Codec:
    try:
        return CODECS[name]
    except KeyError:
        raise ValueError(
            f"unknown codec {name!r} (have: {sorted(CODECS)}) — register "
            f"custom codecs with codec.registry.register_codec") from None


def register_codec(codec: Codec, overwrite: bool = False) -> Codec:
    """Add a custom :class:`Codec` to the registry (the extension point)."""
    if not isinstance(codec, Codec):
        raise TypeError(f"expected a Codec, got {type(codec).__name__}")
    if not codec.name or not codec.name.isidentifier():
        raise ValueError(f"codec name must be an identifier: {codec.name!r}")
    if not callable(codec.dump) or not callable(codec.load):
        raise TypeError(f"codec {codec.name!r} dump/load must be callable")
    if codec.name in CODECS and not overwrite:
        raise ValueError(f"codec {codec.name!r} already registered "
                         f"(overwrite=True to replace)")
    CODECS[codec.name] = codec
    return codec


def dump_index(ix, path: str, codec: str = "blocks") -> dict:
    """Persist ``ix`` under ``path`` with the named codec and stamp the
    codec marker so :func:`open_index` can dispatch without being told."""
    c = get_codec(codec)
    try:
        header = c.dump(ix, path)
    except BaseException:
        # a partial re-dump over an existing index would leave the OLD
        # TOC files describing a mix of generations — drop every file
        # sniff_codec recognizes so open_index refuses the state (same
        # invariant store.write_index re-establishes on a failed tail)
        for toc in ("manifest.json", "header.json", _CODEC_MARKER):
            FS.remove(FS.join(path, toc))
        raise
    FS.write_text_atomic(FS.join(path, _CODEC_MARKER), c.name)
    return header


def sniff_codec(path: str) -> str:
    """Name of the codec that wrote ``path``.  Order: the explicit marker
    (anything written by :func:`dump_index`), then the blocks manifest
    (``store.write_index`` output), then a bare plaintext header
    (``dump_plaintext`` called directly)."""
    marker = FS.read_text(FS.join(path, _CODEC_MARKER))
    if marker is not None:
        return marker.strip()
    raw = FS.read_text(FS.join(path, "manifest.json"))
    if raw is not None:
        return json.loads(raw).get("codec", "blocks")
    raw = FS.read_text(FS.join(path, "header.json"))
    if raw is not None and str(
            json.loads(raw).get("codec", "")).startswith(
                "whoosh-spark-plaintext"):
        return "plaintext"
    raise FileNotFoundError(
        f"no index recognized under {path!r} (no codec marker, manifest, "
        f"or plaintext header)")


def open_index(spark, path: str):
    """Open a persisted index whatever codec wrote it — the codec-aware
    ``open_dir`` (``src/whoosh/index.py::open_dir ≈L120`` resolves the
    TOC's codec the same way)."""
    return get_codec(sniff_codec(path)).load(spark, path)
