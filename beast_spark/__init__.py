"""beast_spark — a PySpark-native analytics/ingest engine.

A from-scratch rebuild of the capabilities of odpf/beast (a Kafka →
BigQuery streaming proto sink; see /root/reference) re-expressed
Spark-first:

* **Streaming ingest** (``beast_spark.streaming``): Kafka-shaped source →
  proto/JSON decode → column-mapping projection → metadata enrichment →
  valid/invalid split → retrying, classifying, DLQ-writing sink via
  ``foreachBatch`` (reference operators A1–A21 of SURVEY.md §2.A).
* **Schema/plan layer** (``beast_spark.plans``): proto-style type mapping →
  Spark ``StructType``, column-mapping JSON compiler → generated ``select``,
  schema diff for additive evolution (A5, A22–A24).
* **Batch query surface** (``beast_spark.queries``): the full relational
  operator inventory (SURVEY.md §2.B) over Spark SQL/DataFrame, each query
  paired with an ANSI-SQL oracle.
* **Training-data pipeline extensions** (``beast_spark.operators``): exact +
  MinHash/SimHash/Jaccard dedup, embedding similarity search, text
  analysis, multimodal binary-column plumbing.

Everything is DataFrame-first: logical plans are declared via the
DataFrame/SQL API and physical strategy is left to Catalyst + AQE.
"""

__version__ = "0.1.0"

from beast_spark.session import get_spark  # noqa: F401
