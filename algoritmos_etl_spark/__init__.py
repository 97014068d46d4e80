"""algoritmos_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference system GT09Neil/Algoritmos-ETL (a
financial-analytics ETL + query engine over daily OHLCV bars): cleaning,
calendar alignment, returns/volatility analytics, risk classification,
sliding-window pattern detection, pairwise time-series similarity
(Euclidean / Pearson / cosine / DTW), multi-key sorts and top-K — plus
large-scale extensions (dedup, similarity search, text analysis,
event-time windowing) a 100 TB training-data pipeline needs.

Everything is expressed as DataFrame transformations so Catalyst can
optimize (predicate pushdown, broadcast joins, whole-stage codegen,
AQE); Python touches data only through Arrow-vectorized pandas UDFs in
the few operators Spark lacks natively (DTW, windowed streak histogram).
"""

__version__ = "0.1.0"
