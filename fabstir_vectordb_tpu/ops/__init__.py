from .distance import (
    pairwise_sq_l2,
    pairwise_dot,
    pairwise_cosine_dist,
    pairwise_distance,
    squared_norms,
    METRICS,
)
from .topk import masked_topk, merge_topk, chunked_topk
from .kmeans import kmeans_pp_init, lloyd_step, kmeans_train, assign_clusters

__all__ = [
    "pairwise_sq_l2",
    "pairwise_dot",
    "pairwise_cosine_dist",
    "pairwise_distance",
    "squared_norms",
    "METRICS",
    "masked_topk",
    "merge_topk",
    "chunked_topk",
    "kmeans_pp_init",
    "lloyd_step",
    "kmeans_train",
    "assign_clusters",
]
