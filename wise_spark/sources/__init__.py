from .ingest import ingest_html, read_corpus

__all__ = ["ingest_html", "read_corpus"]
