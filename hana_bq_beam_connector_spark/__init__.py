"""hana_bq_beam_connector_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``google/hana-bq-beam-connector`` (an Apache Beam HANA→BigQuery batch
ETL, see /root/reference), re-expressed Spark-first:

* reference parity: partitioned JDBC ingest with equi-depth chunk
  planning (HanaToBQ.java:150-172), HANA→BigQuery type mapping
  (HanaToBQ.java:59-81), stringify/append semantics
  (HanaDBRowToTableRowFn.java:21-38), append sink
  (HanaToBQ.java:256-259);
* extension surface: the full relational operator set (joins, aggs,
  windows, set ops, scalar fns), LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal columns), and
  Structured Streaming windows — every operator designed for 100 TB
  inputs (broadcast/AQE/salting/LSH instead of cross joins).

Everything is declarative DataFrame/SQL so Catalyst owns the physical
plan; Python UDFs appear only where built-ins cannot express the
semantics, and then always Arrow-batched.
"""

from hana_bq_beam_connector_spark.config import PipelineConfig
from hana_bq_beam_connector_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]

__version__ = "0.1.0"
