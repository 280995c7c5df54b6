from .core import KMeansParams, KMeansResult, assign, davies_bouldin_index, lloyd
from .mllib import mllib_kmeans

__all__ = [
    "KMeansParams",
    "KMeansResult",
    "assign",
    "davies_bouldin_index",
    "lloyd",
    "mllib_kmeans",
]
