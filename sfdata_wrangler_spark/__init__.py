"""sfdata_wrangler_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``gregerhardt/sfdata_wrangler`` (reference surveyed in SURVEY.md),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, partitioned Parquet storage, window functions instead of
sorted iterrows loops, and Arrow-batched pandas UDFs only where the
built-in operators genuinely cannot express the semantics.

Layout:
- ``session``     SparkSession construction with scale-oriented defaults
- ``functions``   scalar column-function library (SURVEY §2.8)
- ``operators``   aggregation engine, windows, weighting, dedup,
                  similarity, crosstab (SURVEY §2.4/2.5 + LLM-data ops)
- ``sources``     readers: fixed-width, tab, CSV, GTFS, parquet lake
- ``pipelines``   reference pipeline equivalents (expand, cascade,
                  clipper, taxi)
- ``streaming``   Structured Streaming variants (sessionization,
                  watermarked windows, stateful ops, stream-stream
                  joins, incremental dedup)
- ``multimodal``  binary media columns with real stdlib codecs
                  (BMP, RIFF/AVI, RIFF/WAVE) in Arrow-batched kernels
"""

__version__ = "0.1.0"
