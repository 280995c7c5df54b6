from .vector import (
    cosine_similarity_expr,
    dot_expr,
    euclidean_expr,
    l2_norm_expr,
    nearest_centroid_expr,
    squared_euclidean_expr,
)

__all__ = [
    "cosine_similarity_expr",
    "dot_expr",
    "euclidean_expr",
    "l2_norm_expr",
    "nearest_centroid_expr",
    "squared_euclidean_expr",
]
