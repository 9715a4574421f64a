"""Streaming mixture weights: the online half of q_mix_temperature
(queries/llm.py) — as the corpus grows batch by batch, the per-source
token counts fold into a tiny persisted state and the temperature-scaled
sampling table (mT5 τ=2, IEEE-exact SQRT + floor-div basis points) is
re-emitted after every batch, so the dataloader always reads weights
that reflect everything ingested so far.

Unlike stream_pack this fold is ORDER-INSENSITIVE (counts are a
commutative monoid), so any batch split converges to the batch key —
pinned in tests/test_streaming.py. State = |sources| rows of two
integers, the ledger-keyed state-swap pattern (replay no-op on markers,
torn batches invisible and recommitted).

At 100 TB/day ingest: per-batch cost is one map-combined aggregate over
the delta plus a |sources|-row merge; the weights table a training job
polls is always one committed parquet read.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATE_SCHEMA = "source string, n_docs bigint, n_tokens bigint"


def _committed(state_dir: str) -> list[int]:
    led = os.path.join(state_dir, "ledger")
    if not os.path.isdir(led):
        return []
    return sorted(int(f) for f in os.listdir(led) if f.isdigit())


def _weights(per: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens) → the q_mix_temperature output shape."""
    from pyspark.sql import Window as W

    tot = W.partitionBy()
    return (
        per.withColumn("rt", F.floor(F.sqrt(F.col("n_tokens"))).cast("bigint"))
        .withColumn("tot_tok", F.sum("n_tokens").over(tot))
        .withColumn("tot_rt", F.sum("rt").over(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("div(n_tokens * 10000, tot_tok)").cast("bigint").alias("raw_bp"),
            F.expr("div(rt * 10000, tot_rt)").cast("bigint").alias("temp_bp"),
        )
    )


def stream_mix(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    source_col: str = "source",
    text_col: str = "text",
):
    """Fold a document stream into running per-source mixture weights.

    Returns the started streaming query (availableNow trigger — drains
    what exists, then stops)."""
    spark = docs_stream.sparkSession
    os.makedirs(os.path.join(state_dir, "ledger"), exist_ok=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        marker = os.path.join(state_dir, "ledger", str(bid))
        if os.path.exists(marker):
            return
        delta = batch_df.groupBy(F.col(source_col).alias("source")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.expr(f"size(filter(split({text_col}, ' '), w -> w != ''))"))
            .cast("bigint")
            .alias("n_tokens"),
        )
        prior = [b for b in _committed(state_dir) if b < bid]
        if prior:
            st = spark.read.parquet(
                os.path.join(state_dir, "state", f"batch={max(prior)}")
            )
        else:
            st = spark.createDataFrame([], _STATE_SCHEMA)
        merged = (
            st.unionByName(delta)
            .groupBy("source")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            )
        )
        state_path = os.path.join(state_dir, "state", f"batch={bid}")
        merged.write.mode("overwrite").parquet(state_path)
        _weights(spark.read.parquet(state_path)).write.mode("overwrite").parquet(
            os.path.join(state_dir, "weights", f"batch={bid}")
        )
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": bid}, f)
        os.rename(tmp, marker)

    return (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_weights(spark: SparkSession, state_dir: str) -> DataFrame:
    """The CURRENT committed weights table (last committed batch)."""
    seen = _committed(state_dir)
    if not seen:
        return spark.createDataFrame(
            [],
            "source string, n_docs bigint, n_tokens bigint,"
            " raw_bp bigint, temp_bp bigint",
        )
    return spark.read.parquet(
        os.path.join(state_dir, "weights", f"batch={max(seen)}")
    )
