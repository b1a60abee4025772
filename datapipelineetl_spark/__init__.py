"""datapipelineetl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference telecom ETL pipeline
(MohamedYoussefjo/DataPipelineETL): schema-projected file ingestion,
sentinel/null cleaning chains, 3GPP TS 32.435 XML flattening, Kafka-style
JSON envelope serde, micro-batch streaming — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Design stance (see SURVEY.md §7): the reference's *semantics* are the spec;
its architecture (driver-side XML loops, Airflow-as-dataflow) is not.
Everything here is declarative DataFrame code that Catalyst can optimize —
predicate pushdown, column pruning, broadcast joins, AQE — so the same
operators that pass the sf0.01 correctness harness scale to a
1000-executor cluster.
"""

from datapipelineetl_spark.session import get_session, session_builder

__all__ = ["get_session", "session_builder"]
__version__ = "0.1.0"
