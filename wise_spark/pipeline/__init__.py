from .text import (
    token_stats,
    quality_features,
    lang_guess,
    fingerprints,
    repetition_features,
)
from .urls import canonicalize_url, url_duplicate_groups
from .dedup import (
    exact_duplicates,
    shingles,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from .similarity import (
    cosine_topk,
    lsh_cosine_topk,
    cosine_neardup_pairs,
    ivf_cosine_topk,
    ivf_centroids_random,
    train_ivf_centroids,
)
from .relational import (
    sessionize,
    best_per_group,
    ordered_lookup,
    tolerance_merge,
    overlap_antijoin,
    overlap_join,
)

__all__ = [
    "token_stats",
    "quality_features",
    "lang_guess",
    "fingerprints",
    "repetition_features",
    "canonicalize_url",
    "url_duplicate_groups",
    "exact_duplicates",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "cosine_topk",
    "lsh_cosine_topk",
    "cosine_neardup_pairs",
    "ivf_cosine_topk",
    "ivf_centroids_random",
    "train_ivf_centroids",
    "sessionize",
    "best_per_group",
    "ordered_lookup",
    "tolerance_merge",
    "overlap_antijoin",
    "overlap_join",
]
