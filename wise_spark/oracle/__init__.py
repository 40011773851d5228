from .bm25_pandas import PandasBM25Oracle
from .fts5 import Fts5Oracle, fts5_available

__all__ = ["PandasBM25Oracle", "Fts5Oracle", "fts5_available"]
