"""Incremental aggregate maintenance + streaming upsert: refreshing from
slices must equal recomputing from scratch, under any slicing."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mongo_to_parquet_spark.operators import incremental as inc
from mongo_to_parquet_spark.sources.catalog import load_table


def _direct(df, keys, measures):
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(F.col(m).cast("decimal(38,6)")).alias(f"sum_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def _as_dict(rows, keys):
    return {tuple(r[k] for k in keys): {c: r[c] for c in r.asDict() if c not in keys} for r in rows}


def test_three_slice_refresh_equals_direct_agg(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    keys, measures = ["o_orderstatus"], ["o_totalprice"]
    state_dir = str(tmp_path / "state")
    # slice by year — unequal sizes, arbitrary order
    slices = [
        orders.filter(F.year("o_orderdate") <= 1994),
        orders.filter(F.year("o_orderdate").between(1995, 1996)),
        orders.filter(F.year("o_orderdate") >= 1997),
    ]
    for s in slices:
        final = inc.refresh_agg_state(spark, state_dir, s, keys, measures)
    want = _as_dict(_direct(orders, keys, measures).collect(), keys)
    got = _as_dict(final.collect(), keys)
    assert got == want
    # every refresh left a readable version; latest is the answer
    assert inc._versions(state_dir) == [1, 2, 3]
    re_read = _as_dict(inc.read_agg_state(spark, state_dir).collect(), keys)
    assert re_read == want


def test_snapshot_derives_avg(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    state_dir = str(tmp_path / "state")
    st = inc.refresh_agg_state(spark, state_dir, orders, ["o_orderstatus"], ["o_totalprice"])
    snap = {r["o_orderstatus"]: r for r in inc.state_snapshot(st, ["o_totalprice"]).collect()}
    want = {
        r["o_orderstatus"]: r
        for r in orders.groupBy("o_orderstatus")
        .agg(F.avg("o_totalprice").alias("avg"))
        .collect()
    }
    for k, r in snap.items():
        assert r["avg_o_totalprice"] == pytest.approx(want[k]["avg"], rel=1e-9)


def test_merge_is_slice_order_invariant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    keys, measures = ["event_type"], ["value"]
    a = inc.partial_agg_state(ev.filter(F.col("user_id") % 2 == 0), keys, measures)
    b = inc.partial_agg_state(ev.filter(F.col("user_id") % 2 == 1), keys, measures)
    ab = _as_dict(inc.merge_agg_states(a, b, keys, measures).collect(), keys)
    ba = _as_dict(inc.merge_agg_states(b, a, keys, measures).collect(), keys)
    assert ab == ba  # decimal sums: exact, order-independent


def test_stream_merge_upsert_latest_wins_and_replays_safely(spark, tmp_path):
    import time

    from mongo_to_parquet_spark.streaming.export import stream_merge_upsert

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    base = dt.datetime(2024, 1, 1)

    def mk(uid, seq, v):
        return Row(user_id=uid, seq=seq, ts=base + dt.timedelta(minutes=seq), v=v)

    def run():
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream_merge_upsert(stream, state, ckpt, keys=["user_id"], seq_col="seq")
        q.awaitTermination(120)
        q.stop()

    # batch 1: two users, u1 twice in ONE batch (max seq wins inside batch)
    spark.createDataFrame([mk(1, 1, "a"), mk(1, 2, "b"), mk(2, 1, "x")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    from mongo_to_parquet_spark.operators.incremental import _versions

    def snapshot():
        import os

        v = _versions(state)[-1]
        return {
            r["user_id"]: (r["seq"], r["v"])
            for r in spark.read.parquet(os.path.join(state, f"v={v}")).collect()
        }

    assert snapshot() == {1: (2, "b"), 2: (1, "x")}

    # batch 2: u1 newer row wins; u2 OLDER row must NOT regress the state;
    # u3 inserts
    time.sleep(1.1)
    spark.createDataFrame([mk(1, 5, "c"), mk(2, 0, "stale"), mk(3, 1, "new")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    run()
    assert snapshot() == {1: (5, "c"), 2: (1, "x"), 3: (1, "new")}

    # re-run with nothing new: checkpoint makes it a no-op
    run()
    assert snapshot() == {1: (5, "c"), 2: (1, "x"), 3: (1, "new")}


def test_stream_refresh_converges_to_batch_agg(spark, sf_dir, tmp_path):
    """Streaming materialized view: replaying events as a file stream and
    folding each micro-batch into the agg state ends exactly at the
    direct batch aggregate (additive decimal state, any slicing)."""
    from mongo_to_parquet_spark.streaming import windows as sw

    state = str(tmp_path / "mv_state")
    ckpt = str(tmp_path / "mv_ckpt")
    stream = sw.replay_events(spark, sf_dir)
    q = inc.stream_refresh_agg_state(
        stream, state, ckpt, keys=["event_type"], measures=["value"]
    )
    q.awaitTermination(180)
    q.stop()
    ev = load_table(spark, sf_dir, "events")
    want = _as_dict(_direct(ev, ["event_type"], ["value"]).collect(), ["event_type"])
    got = _as_dict(inc.read_agg_state(spark, state).collect(), ["event_type"])
    assert got == want
    # one state version per non-empty micro-batch
    assert len(inc._versions(state)) >= 2
