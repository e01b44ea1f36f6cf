from .extract import ColumnExtractor, PandasExtractor
from .scan import ScanResult, run_scan
from .merge import MergeResult, run_merge

__all__ = [
    "ColumnExtractor",
    "PandasExtractor",
    "ScanResult",
    "run_scan",
    "MergeResult",
    "run_merge",
]
