"""bigdatafinalproject_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference project naamaleah/BigDataFinalProject (a
PySpark book-recommendation pipeline; see SURVEY.md), extended with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing, streaming).

Design stance (SURVEY.md §7):
- DataFrame/SQL only; Catalyst plans everything; no custom IR.
- Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Every operator is written for a 1000-executor / 100 TB deployment and
  merely *tested* on local[32]: broadcast small dims, avoid unpartitioned
  windows, no driver-side loops over data.
"""

from bigdatafinalproject_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
