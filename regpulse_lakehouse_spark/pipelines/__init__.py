from .corpus import CorpusResult, prepare_corpus
from .vectorize import vectorize_corpus
from .extract import ColumnExtractor, PandasExtractor
from .scan import ScanResult, run_scan
from .merge import MergeResult, run_merge

__all__ = [
    "ColumnExtractor",
    "CorpusResult",
    "PandasExtractor",
    "ScanResult",
    "prepare_corpus",
    "vectorize_corpus",
    "run_scan",
    "MergeResult",
    "run_merge",
]
