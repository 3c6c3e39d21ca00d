"""Multi-field schema + index: Whoosh ``Schema``/``FieldType`` + BM25F.

Upstream analogs (SURVEY.md §2.1/§2.6; cites per provenance caveat —
``/root/reference`` is empty, anchors are the public whoosh 2.7.4 layout):
``src/whoosh/fields.py::Schema (≈L1200)`` declares named fields with
per-field analyzers; ``src/whoosh/scoring.py::BM25F (≈L140)`` accepts
``<fieldname>_B`` kwargs so each field gets its own length normalization.

Spark-first restatement: every index table already carries a ``field``
column, so a multi-field index is a family of per-field table sets — each
field is built by the SAME single-field dataflow (its own analyze pass over
its source column, its own posting shuffle), and queries against different
fields compose through the ordinary score algebra:

    score(doc) = Σ_fields  field_boost_f · BM25(idf_f, tf_f, dl_f; B_f)

which is exactly Whoosh's BM25F behavior: per-field B and per-field average
length in the saturation term, field boost as a multiplicative weight.

``MultiFieldIndex`` delegates the single-field surface (term_stats, docs,
postings, global_stats, …) to the DEFAULT field's index, so the existing
``Searcher``/``Evaluator``/WAND paths work unchanged for unfielded queries;
fielded query nodes (``Term(..., fieldname="title")``) route to the right
sub-index inside the evaluator.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from whoosh_spark.config import BM25_B
from whoosh_spark.index import InvertedIndex


@dataclass(frozen=True)
class FieldSpec:
    """One schema field (``fields.py::FieldType``, ≈L200).

    source   — column of the docs DataFrame holding this field's text
    analyzer — name in ``analysis.analyzers.ANALYZERS`` (standard | stemming)
    b        — per-field BM25F length normalization (None = config default)
    boost    — query-time field weight (multiplies this field's scores)
    format   — posting Format name (``formats.py``): what each posting
               stores (positions | frequency | existence | registered)
    """

    source: str
    analyzer: str = "standard"
    b: float | None = None
    boost: float = 1.0
    format: str = "positions"
    pairs: bool = False  # adjacent-pair phrase accelerator for this field
    pair_min_df: float = 0  # hot-only pair threshold (fraction of N if <1)


def resolve_specs(docs: DataFrame, fields: dict[str, "FieldSpec | str"],
                  id_col: str = "doc_id") -> dict[str, FieldSpec]:
    """Expand a user schema into concrete per-field specs.

    Glob/dynamic fields (``fields.py::Schema.add("*_tag", glob=True)
    ≈L1250``): a field NAME containing ``* ? [`` is a pattern — it expands
    over the docs table's string columns (the Spark analog of "any document
    field matching the glob gets this FieldType"), skipping ``id_col`` and
    explicitly declared fields.  Shared by the in-memory build and the
    persisted writer so both resolve globs identically."""
    explicit = {}
    globs = {}
    for name, spec in fields.items():
        spec = spec if isinstance(spec, FieldSpec) else FieldSpec(spec)
        (globs if any(c in name for c in "*?[") else explicit)[name] = spec
    specs = dict(explicit)
    if globs:
        import fnmatch

        str_cols = [f.name for f in docs.schema.fields
                    if f.dataType.simpleString() == "string"
                    and f.name != id_col]
        for pat, spec in globs.items():
            for col in str_cols:
                if col in specs or not fnmatch.fnmatchcase(col, pat):
                    continue
                src = (col if any(c in spec.source for c in "*?[")
                       else spec.source)
                specs[col] = FieldSpec(src, spec.analyzer, spec.b,
                                       spec.boost, spec.format,
                                       spec.pairs, spec.pair_min_df)
        if not specs:
            raise ValueError(
                f"no docs column matches schema globs {sorted(globs)}")
    return specs


class MultiFieldIndex:
    """Family of per-field InvertedIndex table sets over one docs table."""

    def __init__(self, spark: SparkSession, indexes: dict[str, InvertedIndex],
                 specs: dict[str, FieldSpec], docs: DataFrame,
                 default_field: str):
        if default_field not in indexes:
            raise ValueError(f"default_field {default_field!r} not in schema")
        self.spark = spark
        self.indexes = indexes
        self.specs = specs
        self.docs = docs
        self.default_field = default_field
        self.path = None  # family root when opened from disk (store.py)

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        docs: DataFrame,
        fields: dict[str, FieldSpec | str],
        id_col: str = "doc_id",
        default_field: str | None = None,
        cache: bool = True,
    ) -> "MultiFieldIndex":
        """Build one index per schema field.

        ``fields`` maps field name → FieldSpec (or a plain source-column name
        as shorthand).  Each field runs the standard single-field build —
        its own analyze pass + one posting shuffle; fields build as
        independent Spark jobs (a cluster runs them back-to-back; there is
        no cross-field barrier in the dataflow).

        Glob/dynamic fields (``fields.py::Schema.add("*_tag", glob=True)
        ≈L1250``): a field NAME containing ``* ? [`` is a pattern — it
        expands over the docs table's string columns (the Spark analog of
        "any document field matching the glob gets this FieldType"),
        skipping ``id_col`` and any explicitly declared field.  A glob
        spec's ``source`` normally names the matched column itself; pass
        the pattern (or any glob) as ``source`` to mean "the matched
        column".
        """
        specs = resolve_specs(docs, fields, id_col)
        default_field = default_field or next(iter(specs))
        indexes = {
            name: InvertedIndex.build(
                docs, id_col=id_col, text_col=spec.source, field=name,
                cache=cache, analyzer=spec.analyzer, format=spec.format,
                phrase_pairs=spec.pairs, pair_min_df=spec.pair_min_df)
            for name, spec in specs.items()
        }
        stored = docs.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else docs
        return cls(docs.sparkSession, indexes, specs, stored, default_field)

    # ---- TOC generation tracking (``index.py::Index.up_to_date ≈L380``)
    def generation(self) -> int:
        """Max child generation (-1 when every field is an in-memory build —
        the RamStorage analog, never stale)."""
        return max(ix.generation() for ix in self.indexes.values())

    def up_to_date(self) -> bool:
        """True if no field's index has a newer committed generation."""
        return all(ix.up_to_date() for ix in self.indexes.values())

    def refresh(self) -> "MultiFieldIndex":
        """``self`` when every field is current, else a new family with each
        stale field re-opened at its latest committed generation."""
        if self.up_to_date():
            return self
        fresh = {}
        for name, ix in self.indexes.items():
            nx = ix.refresh()
            if nx is not ix and nx.docs is None:
                # family sub-index (write_stored=False): the stored table
                # lives at the family root, re-attach it on reopen
                nx.docs = self.docs
            fresh[name] = nx
        out = MultiFieldIndex(self.spark, fresh, self.specs, self.docs,
                              self.default_field)
        out.path = self.path
        return out

    # ------------------------------------------------------------------
    def index_for(self, field: str | None) -> InvertedIndex:
        f = field or self.default_field
        try:
            return self.indexes[f]
        except KeyError:
            raise KeyError(f"unknown field {f!r}; schema has {sorted(self.indexes)}")

    def spec_for(self, field: str | None) -> FieldSpec:
        return self.specs[field or self.default_field]

    def bm25_b(self, field: str | None) -> float:
        b = self.spec_for(field).b
        return BM25_B if b is None else float(b)

    def field_boost(self, field: str | None) -> float:
        return float(self.spec_for(field).boost)

    @property
    def primary(self) -> InvertedIndex:
        return self.indexes[self.default_field]

    # -- single-field delegation (Searcher/WAND compatibility) ----------
    @property
    def field(self) -> str:
        return self.default_field

    @property
    def blocks(self):
        return self.primary.blocks

    @property
    def term_stats(self):
        return self.primary.term_stats

    @property
    def field_stats(self):
        return self.primary.field_stats

    @property
    def doc_lengths(self):
        return self.primary.doc_lengths

    @property
    def deleted(self):
        return self.primary.deleted

    def global_stats(self):
        return self.primary.global_stats()

    def total_field_length(self):
        return self.primary.total_field_length()

    def stats_for_terms(self, terms):
        return self.primary.stats_for_terms(terms)

    def expand_terms(self, predicate, limit: int = 1024):
        return self.primary.expand_terms(predicate, limit)

    def postings(self, terms, with_positions: bool = False):
        return self.primary.postings(terms, with_positions)

    def postings_where(self, block_pred, with_positions: bool = False):
        return self.primary.postings_where(block_pred, with_positions)

    def _decode(self, blk, with_positions: bool):
        return self.primary._decode(blk, with_positions)

    def not_deleted(self, df: DataFrame) -> DataFrame:
        return self.primary.not_deleted(df)

    def all_doc_ids(self) -> DataFrame:
        return self.primary.all_doc_ids()

    def idf(self, df: int) -> float:
        return self.primary.idf(df)

    def reader(self):
        """Low-level read surface (``reading.py::IndexReader``) — fielded
        lookups route to the owning sub-index, like fielded query nodes."""
        from whoosh_spark.reader import IndexReader

        return IndexReader(self)
