"""WordNet-style thesaurus (upstream ``whoosh.lang.wordnet`` analog,
``src/whoosh/lang/wordnet.py`` ≈L1-120: ``Thesaurus.from_file`` /
``from_filename`` / ``to_storage`` / ``from_storage`` / ``synonyms``).

Parses the WordNet prolog synset file format — lines like::

    s(100002137,1,'entity',n,1,11).

— into word↔synset maps, answers ``synonyms(word)``, persists to a
two-column parquet table (the Spark analog of upstream's mini index over
``synset``/``word`` fields), and expands a query word into an Or query
over its expansion set.

Scale posture: a thesaurus is a small dimension table (WordNet ≈ 2×10^5
rows).  It lives driver-side / broadcast-side; expansion happens at plan
time (one Or over ≤ a few dozen terms), so synonym search costs one
multi-term union over the posting lists and never shuffles the corpus.
"""

from __future__ import annotations

import re
from typing import Iterable

# s(synset_id, w_num, 'word', ss_type, sense_number, tag_count).
_SYNS_RE = re.compile(r"^s\((\d+),\s*\d+,\s*'((?:[^']|'')*)',")


class Thesaurus:
    """Word → synonym lookup over WordNet-format synset data."""

    def __init__(self) -> None:
        self.w2s: dict[str, set[int]] = {}
        self.s2w: dict[int, set[str]] = {}

    # -- construction -------------------------------------------------------

    def add(self, synset_id: int, word: str) -> None:
        self.w2s.setdefault(word, set()).add(synset_id)
        self.s2w.setdefault(synset_id, set()).add(word)

    @classmethod
    def from_file(cls, lines: Iterable[str]) -> "Thesaurus":
        """Build from an open file object / iterable of ``wn_s.pl`` prolog
        lines.  Words are lowercased; the prolog ``''`` escape is folded
        back to ``'``; non-synset lines are ignored."""
        t = cls()
        for line in lines:
            m = _SYNS_RE.match(line.strip())
            if m:
                t.add(int(m.group(1)), m.group(2).replace("''", "'").lower())
        return t

    @classmethod
    def from_filename(cls, path: str) -> "Thesaurus":
        with open(path, encoding="utf-8") as f:
            return cls.from_file(f)

    # -- lookup -------------------------------------------------------------

    def synonyms(self, word: str) -> list[str]:
        """Sorted synonyms of ``word`` across all its synsets, excluding
        the word itself (upstream ``Thesaurus.synonyms`` contract)."""
        word = word.lower()
        out: set[str] = set()
        for sid in self.w2s.get(word, ()):
            out |= self.s2w[sid]
        out.discard(word)
        return sorted(out)

    def expansion(self, word: str) -> list[str]:
        """The word plus its synonyms — the term set a synonym-expanded
        query unions over."""
        return sorted({word.lower()} | set(self.synonyms(word)))

    # -- persistence (parquet through the engine fs layer) ------------------

    def to_storage(self, spark, path: str) -> None:
        """Persist as a (synset_id, word) parquet table — the Spark analog
        of upstream's ``to_storage(storage, indexname)`` mini index."""
        rows = [(sid, w) for sid, ws in sorted(self.s2w.items())
                for w in sorted(ws)]
        spark.createDataFrame(rows, "synset_id long, word string") \
            .coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def from_storage(cls, spark, path: str) -> "Thesaurus":
        t = cls()
        for r in spark.read.parquet(path).collect():
            t.add(r.synset_id, r.word)
        return t

    # -- query-side ---------------------------------------------------------

    def query(self, word: str, boost: float = 1.0):
        """Or query over the word's expansion set (upstream pattern:
        ``Or([Term(fieldname, w) for w in thesaurus.synonyms(w)] + [Term
        (fieldname, w)])``).  Terms missing from the index simply match
        nothing — membership is applied by the posting lookup itself."""
        from whoosh_spark.query import ast as Q

        return Q.Or([Q.Term(w) for w in self.expansion(word)], boost=boost)
