"""mongo_to_parquet_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL tool
(REQUEA/mongo-to-parquet, /root/reference/src/mongodb_to_parquet/main.py)
as an idiomatic Spark engine, and extends it with the relational /
window / streaming / LLM-data-pipeline operator surface declared in
SURVEY.md §2.3.

Layout:
    session     — SparkSession builder with engine defaults (AQE, zstd, ...)
    config      — reference-compatible JSON job config (fixes the
                  reference's ``bacth_size`` typo, keeps include/exclude XOR)
    sources/    — fixture catalog + partitioned-parquet export (R1-R15 parity)
    operators/  — as-of join, dedup (exact/minhash/simhash/embedding),
                  similarity search, text analysis, multimodal plumbing
    functions/  — vector + text column-expression builders (UDF-free)
    streaming/  — tumbling/sliding/session windows, watermark replay
    queries/    — the driver-checked query registry (queries()/oracle_sql())
"""

from mongo_to_parquet_spark.session import get_spark
from mongo_to_parquet_spark.sources.catalog import TABLES, load_table, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_table", "load_tables", "register_views"]
