"""PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference energy-analytics pipeline (see SURVEY.md):
scans, cleaning/projection/filter, calendar derivations, dimension joins,
multi-level rollups, per-entity window features, top-k, K-Means/regression
ML, and z-score anomaly scoring - plus large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns,
streaming rollups).

Everything is declared through the DataFrame / Spark SQL API so Catalyst
and Tungsten choose physical strategies; no RDD-level code and no
row-at-a-time Python UDFs on hot paths.
"""

from smart_energy_consumption_analytics_using_big_data_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
