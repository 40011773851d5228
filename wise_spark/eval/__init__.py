from .retrieval import average_precision, mean_average_precision, recall_at_k

__all__ = ["average_precision", "mean_average_precision", "recall_at_k"]
