from .ingest import ingest_html, read_corpus
from .metadata_csv import import_metadata_csv, time2sec_col

__all__ = ["ingest_html", "read_corpus", "import_metadata_csv", "time2sec_col"]
