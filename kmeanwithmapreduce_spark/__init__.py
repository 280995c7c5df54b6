"""kmeanwithmapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo MinhTuanCoder/KmeanWithMapreduce (an iterative Hadoop
MapReduce K-Means: Code/KmeanMapReduce/src/Main.java plus
KMapper/KCombiner/KReducer/PointWritable), re-expressed Spark-first:

- DataFrame / Spark SQL relational surface (scans, joins, aggs, windows,
  sorts, set ops) — Catalyst plans, Tungsten execution.
- K-Means as both a semantics-exact ``compat`` Lloyd's loop (DataFrame
  assign + agg per iteration, driver-held k×d centroids) and a ``native``
  MLlib path.
- Large-scale training-data pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), similarity search over embeddings, text
  analysis, multimodal column plumbing.
- Structured Streaming over the events table (watermarks, tumbling /
  sliding / session windows).

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
