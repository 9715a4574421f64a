"""Streaming greedy sequence packing: the online half of q_pack_greedy
(queries/llm.py) — documents trickle in (the crawl-append shape: doc_id
monotone per shard across batches) and each micro-batch extends the
per-shard open bin exactly where the previous batch left it, so the
union of streamed assignments is bit-identical to running the batch
packer over everything that has arrived (pinned in
tests/test_streaming.py).

State per shard is TWO integers — (open_bin, fill) of the currently
filling bin — carried between batches as a tiny parquet keyed by the
ledger, the stream_kmv state-swap pattern: per-batch report + state
dirs, then an atomic marker rename. Replayed batches skip on their
marker; a torn batch (artifacts without marker) is invisible to readers
and recommitted identically by the next run.

At 100 TB/day ingest: the state table is n_shards rows (broadcast), the
per-batch cost is one shuffle by shard into the Arrow grouped-map pass —
the batch packer's own plan, applied to the delta only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ASSIGN_COLS = ["shard", "doc_id", "n_tok", "bin_id"]
_PACKED_SCHEMA = (
    "shard bigint, doc_id bigint, n_tok bigint, bin_id bigint,"
    " open_bin bigint, fill bigint"
)
_STATE_SCHEMA = "shard bigint, open_bin bigint, fill bigint"


def _committed(state_dir: str) -> list[int]:
    led = os.path.join(state_dir, "ledger")
    if not os.path.isdir(led):
        return []
    return sorted(int(f) for f in os.listdir(led) if f.isdigit())


def stream_pack(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    pack_l: int = 128,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Pack a document stream into L-token training bins, shard-parallel.

    Returns the started streaming query (availableNow trigger — drains
    what exists, then stops)."""
    spark = docs_stream.sparkSession
    os.makedirs(os.path.join(state_dir, "ledger"), exist_ok=True)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        marker = os.path.join(state_dir, "ledger", str(bid))
        if os.path.exists(marker):
            return
        base = batch_df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            (F.col(id_col) % n_shards).cast("long").alias("shard"),
            F.size(F.filter(F.split(text_col, " "), lambda x: x != ""))
            .cast("long")
            .alias("n_tok"),
        ).filter(F.col("n_tok") > 0)
        prior = [b for b in _committed(state_dir) if b < bid]
        if prior:
            st = spark.read.parquet(
                os.path.join(state_dir, "state", f"batch={max(prior)}")
            )
        else:
            st = spark.createDataFrame([], _STATE_SCHEMA)
        joined = base.join(F.broadcast(st), "shard", "left")

        def pack(pdf):
            pdf = pdf.sort_values("doc_id").reset_index(drop=True)
            carried = pdf["open_bin"].notna().any()
            b = int(pdf["open_bin"].iloc[0]) if carried else 0
            fill = int(pdf["fill"].iloc[0]) if carried else 0
            bins = []
            for t in pdf["n_tok"]:
                if fill > 0 and fill + t > pack_l:
                    b += 1
                    fill = 0
                bins.append(b)
                fill += t
            out = pdf[["shard", "doc_id", "n_tok"]].copy()
            out["bin_id"] = bins
            # the shard's post-batch state rides every row; readers
            # project it off, the state writer distincts it
            out["open_bin"] = b
            out["fill"] = fill
            return out

        packed_path = os.path.join(state_dir, "reports", f"batch={bid}")
        joined.groupBy("shard").applyInPandas(pack, _PACKED_SCHEMA).write.mode(
            "overwrite"
        ).parquet(packed_path)
        rep = spark.read.parquet(packed_path)
        batch_state = rep.select("shard", "open_bin", "fill").distinct()
        carried = st.join(batch_state.select("shard"), "shard", "left_anti")
        batch_state.unionByName(carried).write.mode("overwrite").parquet(
            os.path.join(state_dir, "state", f"batch={bid}")
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


def read_assignments(spark: SparkSession, state_dir: str) -> DataFrame:
    """All bin assignments from COMMITTED batches (the exactly-once view)."""
    seen = _committed(state_dir)
    if not seen:
        return spark.createDataFrame(
            [], "shard bigint, doc_id bigint, n_tok bigint, bin_id bigint"
        )
    return spark.read.parquet(
        *[os.path.join(state_dir, "reports", f"batch={b}") for b in seen]
    ).select(*_ASSIGN_COLS)
