from .retrieval import (
    average_precision,
    mean_average_precision,
    ndcg_at_k,
    recall_at_k,
)

__all__ = [
    "average_precision",
    "mean_average_precision",
    "ndcg_at_k",
    "recall_at_k",
]
