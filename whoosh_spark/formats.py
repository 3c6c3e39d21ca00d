"""Posting Format API — upstream ``src/whoosh/formats.py`` (≈L60
``Format``, L130 ``Existence``, L180 ``Frequency``, L240 ``Positions``,
L280 ``Characters``) as a declared per-index posting payload.

A Format decides WHAT each posting stores.  Upstream formats emit a value
string per posting at write time; here the payload choice is a columnar
transformation of the analyzed frame BEFORE the posting shuffle, so a
leaner format shrinks the bytes that flow through the index's one wide
shuffle AND the persisted blocks — at web scale, dropping the positions
stream (the fat column) roughly halves both.

Built-ins:

* ``positions`` (default) — tf + position deltas per posting; Phrase /
  Sequence / Span queries work.
* ``frequency`` — tf only; positions stream written empty.  Positional
  queries raise (upstream raises ``QueryError`` when the field lacks
  positions).
* ``existence`` — tf forced to 1 (doc-membership only); scoring reduces
  to the idf-driven form, exactly upstream's Existence behavior.
* ``characters`` — ``positions`` plus the char-offsets side segment
  (``chars.py``); declared here so ``write_index(format="characters")``
  is the one-switch equivalent of upstream ``TEXT(chars=True)``.

Custom formats register through :func:`register_format` with an optional
``transform`` hook — a function over the analyzed frame (one row per doc:
``terms``/``tfs``/``pos_blobs`` parallel arrays) that reshapes the payload
with JVM column expressions; the hook must preserve the analyzed schema.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F

# varint(0): the self-describing empty positions blob — one byte per
# posting keeps the stream's per-posting framing intact (codec fallback
# walks varint(count) + deltas)
_EMPTY_POS_BLOB = bytearray(b"\x00")


@dataclass(frozen=True)
class Format:
    """Declared posting payload.

    store_positions — positions survive into the blocks (positional
                      queries allowed)
    store_tf        — true term frequencies survive (False ⇒ tf := 1)
    transform       — optional extra hook over the analyzed frame,
                      applied AFTER the built-in payload reshaping
    """

    name: str
    store_positions: bool = True
    store_tf: bool = True
    transform: Optional[Callable[[DataFrame], DataFrame]] = None

    def apply(self, analyzed: DataFrame) -> DataFrame:
        out = analyzed
        if not self.store_tf:
            out = out.withColumn(
                "tfs", F.transform("tfs", lambda t: F.lit(1).cast(
                    out.schema["tfs"].dataType.elementType)))
        if not self.store_positions:
            out = out.withColumn(
                "pos_blobs",
                F.transform("pos_blobs", lambda b: F.lit(_EMPTY_POS_BLOB)))
        if self.transform is not None:
            # full (name, type) signature, nullability-insensitive — a
            # name-only check would let a type-changing transform crash
            # deep inside the Arrow encode instead of here
            def sig(schema):
                return [(f.name, f.dataType.simpleString())
                        for f in schema.fields]

            before = sig(out.schema)
            out = self.transform(out)
            if sig(out.schema) != before:
                raise ValueError(
                    f"format {self.name!r} transform changed the analyzed "
                    f"schema: {before} -> {sig(out.schema)}")
        return out


FORMATS: dict[str, Format] = {
    "positions": Format("positions"),
    "frequency": Format("frequency", store_positions=False),
    "existence": Format("existence", store_positions=False, store_tf=False),
    "characters": Format("characters"),
}


def get_format(name: str) -> Format:
    try:
        return FORMATS[name]
    except KeyError:
        raise ValueError(
            f"unknown posting format {name!r} (have: {sorted(FORMATS)}) — "
            f"register custom formats with formats.register_format") from None


def register_format(fmt: Format, overwrite: bool = False) -> Format:
    """Add a custom :class:`Format` to the registry (the extension point;
    validated like ``register_analyzer``)."""
    if not isinstance(fmt, Format):
        raise TypeError(f"expected a Format, got {type(fmt).__name__}")
    if not fmt.name or not fmt.name.isidentifier():
        raise ValueError(f"format name must be an identifier: {fmt.name!r}")
    if fmt.name in FORMATS and not overwrite:
        raise ValueError(f"format {fmt.name!r} already registered "
                         f"(overwrite=True to replace)")
    FORMATS[fmt.name] = fmt
    return fmt
