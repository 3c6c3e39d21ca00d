"""whoosh_spark — a PySpark-native inverted-index build + BM25 query engine
with the capabilities of Whoosh (sdelements/whoosh), re-expressed as columnar
shuffle-based dataflow.  See SURVEY.md for the structural blueprint and
README.md for architecture.
"""

from whoosh_spark.analysis.wordnet import Thesaurus
from whoosh_spark.index import InvertedIndex
from whoosh_spark.multifield import FieldSpec, MultiFieldIndex
from whoosh_spark.reader import IndexReader, TermInfo
from whoosh_spark.results import Hit, Results
from whoosh_spark.search import Searcher
from whoosh_spark.writing import AsyncWriter, BufferedWriter, IndexWriter

__all__ = ["InvertedIndex", "MultiFieldIndex", "FieldSpec", "Searcher",
           "Results", "Hit", "IndexReader", "TermInfo", "IndexWriter",
           "AsyncWriter", "BufferedWriter", "Thesaurus"]
__version__ = "0.1.0"
