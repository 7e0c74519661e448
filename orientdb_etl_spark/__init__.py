"""orientdb_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
``360-Innovations/orientdb-etl`` (the OrientDB ETL module), re-expressed
Spark-first: a JSON pipeline spec (superset of the reference's
``begin/source/extractor/transformers/loader/end`` shape —
``/root/reference/src/main/java/com/orientechnologies/orient/etl/OETLProcessor.java:105-179``)
compiles to a single declarative DataFrame lineage executed by Catalyst.
Row-at-a-time processing is deliberately absent: every operator is a
``DataFrame -> DataFrame`` function, so predicate pushdown, column pruning,
join selection and AQE apply end-to-end.

Public surface:
    - :func:`orientdb_etl_spark.session.get_spark` — tuned local session.
    - :class:`orientdb_etl_spark.pipeline.Pipeline` — compile/run a config.
    - :mod:`orientdb_etl_spark.functions` — dedup / similarity / text /
      multimodal operators for large-scale training-data pipelines.
"""

from orientdb_etl_spark.pipeline import Pipeline, PipelineResult
from orientdb_etl_spark.session import cluster_profile, get_spark

__all__ = ["Pipeline", "PipelineResult", "cluster_profile", "get_spark"]
__version__ = "0.1.0"
