"""MongoDB source — the reference's R1 scan via the Spark Mongo connector.

The reference iterates a pymongo cursor row-at-a-time (main.py:297-303).
Spark-first, the scan is the official MongoDB Spark connector
(``format("mongodb")``), which splits collections into partitions
(sample/shard-key based) and pushes ``$match``/``$project`` down — replacing
the reference's single-threaded cursor AND its hand-built date-range
pushdown (main.py:288-293) with connector pushdown.

The connector jar is not present in this environment, so this module is
import-gated: ``read_collection`` raises a clear error when the format is
unavailable, and the rest of the engine (catalog/export/queries) never
depends on it. ``ExportJob`` runs the reference's full multi-collection
job (main.py:241-309) against any table-providing source, defaulting to
the parquet fixture catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongo_to_parquet_spark.config import JobConfig
from mongo_to_parquet_spark.sources.export import export_partitioned


def read_collection(
    spark: SparkSession, uri: str, database: str, collection: str
) -> DataFrame:
    """Scan one MongoDB collection (reference R1, main.py:297-303)."""
    try:
        return (
            spark.read.format("mongodb")
            .option("spark.mongodb.read.connection.uri", uri)
            .option("database", database)
            .option("collection", collection)
            .load()
        )
    except Exception as e:  # connector jar absent in this container
        raise NotImplementedError(
            "MongoDB Spark connector not on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector to spark.jars.packages. "
            "All other sources (parquet fixtures) work without it."
        ) from e


class ExportJob:
    """The reference's ``ExportJob.run`` (main.py:241-309), source-agnostic.

    The reference fans out one Python thread per database (main.py:266-273)
    because its cursor is single-threaded; on Spark each scan is already
    partition-parallel, so collections are submitted sequentially and Spark's
    scheduler overlaps their tasks. ``reader`` maps a collection name to a
    DataFrame (defaults injection point for tests / parquet fixtures).
    """

    def __init__(self, spark: SparkSession, cfg: JobConfig, reader):
        self.spark = spark
        self.cfg = cfg
        self.reader = reader  # Callable[[str], DataFrame]

    def run(self) -> dict[str, int]:
        """Export every configured collection; returns rows written per
        collection (reference's R12 count observability, main.py:104,158)."""
        totals: dict[str, int] = {}
        for coll, date_field in sorted(self.cfg.date_collections.items()):
            df = self.reader(coll)
            out = f"{self.cfg.output_dir}/{coll}"
            export_partitioned(
                df, out, date_field, start=self.cfg.start_date, end=self.cfg.end_date
            )
            totals[coll] = self.spark.read.parquet(out).count()
        return totals
