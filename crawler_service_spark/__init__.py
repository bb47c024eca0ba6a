"""crawler_service_spark — a from-scratch PySpark-native URL-frontier +
politeness scheduler with the query/data-processing capabilities of the
reference crawler service (see SURVEY.md).

Spark-first design: DataFrame/SQL plans optimized by Catalyst; vectorized
pandas/Arrow UDFs for the parse/extract/canonicalize leaves (zero
per-row Python); round-based BSP frontier loop with parquet-manifest
snapshots for checkpoint/resume.
"""

from crawler_service_spark.config import CrawlConfig

__all__ = ["CrawlConfig"]
__version__ = "0.1.0"
