"""datamunging_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``dbist/datamunging`` recipe collection (Hive/Pig/PySpark/Scala recipes over
the CMS Medicare Part B dataset; see SURVEY.md) as a single idiomatic PySpark
DataFrame library, extended with the operators a large-scale LLM-training-data
pipeline needs (dedup, similarity search, multimodal columns, text analysis).

Design rules (SURVEY.md §3-§4):
  * DataFrame/SQL only — the Catalyst logical plan is the IR; no custom
    parser, optimizer, or executor.
  * Built-in ``pyspark.sql.functions`` everywhere possible; Arrow-batched
    pandas UDFs only where built-ins can't express the semantics.
  * Every operator designed for 100 TB: broadcast small sides, minimize
    shuffles, keep filters/pruning pushable to the parquet scan.
"""

from datamunging_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
