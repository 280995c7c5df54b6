"""Production K-Means via pyspark.ml — the scale path (SURVEY §7.1 M3).

The compat Lloyd loop in ``core.py`` reproduces the reference's exact
semantics (rounding, tie-breaks, loop cap); this module is the engine you
would actually run at 100 TB: MLlib's KMeans (k-means|| init, DataFrame
in, model out), which distributes init as well as iterations.

Caveat from SURVEY §8 Q6: MLlib ``tol`` compares SQUARED movement of
weighted centers; the reference's ``thresh`` compares unsquared movement —
callers converting thresholds should pass ``tol = thresh**2`` only as an
approximation.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans as MLKMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mllib_kmeans(
    df: DataFrame,
    k: int,
    seed: int = 42,
    max_iter: int = 50,
    tol: float = 1e-6,
    features_col: str = "features",
    init_mode: str = "k-means||",
):
    """Fit MLlib KMeans on an ``array<float>`` column.

    Returns (model, labeled_df) with the label in a ``cluster`` column to
    match the compat engine's output shape.
    """
    vec = df.withColumn("_fvec", array_to_vector(F.col(features_col).cast("array<double>")))
    model = (
        MLKMeans(k=k, seed=seed, maxIter=max_iter, tol=tol, initMode=init_mode)
        .setFeaturesCol("_fvec")
        .setPredictionCol("cluster")
        .fit(vec)
    )
    labeled = model.transform(vec).drop("_fvec")
    return model, labeled
