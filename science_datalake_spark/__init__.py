"""science_datalake_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
J0nasW/science-datalake reference (see SURVEY.md), re-expressed Spark-first:
DataFrame/SQL plans over Parquet, Catalyst-optimized, designed for a
1000-executor cluster reading 100 TB even though tests run on local[32].
"""

from science_datalake_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
