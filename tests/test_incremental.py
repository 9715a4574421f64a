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
            F.count(F.col(m)).alias(f"cnt_{m}"),
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


def test_orphan_version_is_never_read_as_state(spark, sf_dir, tmp_path):
    """A v=N directory without its commit marker (crashed mid-write) must
    be skipped by readers and numbered past by the next refresh — never
    picked up as the latest state."""
    orders = load_table(spark, sf_dir, "orders")
    keys, measures = ["o_orderstatus"], ["o_totalprice"]
    state_dir = str(tmp_path / "state")
    inc.refresh_agg_state(spark, state_dir, orders.limit(100), keys, measures)

    # simulate a crashed refresh: parquet written, marker never landed
    import os

    orphan = os.path.join(state_dir, "v=2")
    inc.partial_agg_state(orders.limit(1), keys, measures).write.parquet(orphan)
    assert inc._versions(state_dir) == [1]  # orphan invisible to readers
    v1 = _as_dict(inc.read_agg_state(spark, state_dir).collect(), keys)
    assert v1 == _as_dict(_direct(orders.limit(100), keys, measures).collect(), keys)

    # next refresh writes PAST the orphan (v=3), never merging from it
    inc.refresh_agg_state(spark, state_dir, orders.limit(100), keys, measures)
    assert inc._versions(state_dir) == [1, 3]
    got = _as_dict(inc.read_agg_state(spark, state_dir).collect(), keys)
    want = _as_dict(
        _direct(orders.limit(100).unionAll(orders.limit(100)), keys, measures).collect(),
        keys,
    )
    assert got == want


def test_replayed_batch_id_is_skipped(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-applying a committed batch id must
    be a no-op instead of double-counting the additive state."""
    ev = load_table(spark, sf_dir, "events").limit(500)
    keys, measures = ["event_type"], ["value"]
    state_dir = str(tmp_path / "state")
    assert inc.apply_stream_batch(state_dir, ev, 0, keys, measures) is True
    once = _as_dict(inc.read_agg_state(spark, state_dir).collect(), keys)
    # replay of batch 0 (crash between state commit and checkpoint commit)
    assert inc.apply_stream_batch(state_dir, ev, 0, keys, measures) is False
    assert _as_dict(inc.read_agg_state(spark, state_dir).collect(), keys) == once
    assert inc.last_batch_id(state_dir) == 0
    # the NEXT batch still applies
    assert inc.apply_stream_batch(state_dir, ev, 1, keys, measures) is True
    assert inc.last_batch_id(state_dir) == 1


def test_snapshot_avg_ignores_nulls(spark):
    """avg = sum / non-null count — AVG semantics when measures have nulls
    (sum skips nulls; dividing by n_rows would dilute the average)."""
    df = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("a", 20.0), ("b", None)],
        "k string, m double",
    )
    st = inc.partial_agg_state(df, ["k"], ["m"])
    snap = {r["k"]: r for r in inc.state_snapshot(st, ["m"]).collect()}
    assert snap["a"]["avg_m"] == pytest.approx(15.0)  # not 10.0 (= 30/3)
    assert snap["a"]["n_rows"] == 3 and snap["a"]["cnt_m"] == 2
    assert snap["b"]["avg_m"] is None  # all-null key: NULL, not an error


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


def test_time_travel_reads_named_version_and_rejects_orphans(spark, sf_dir, tmp_path):
    import os

    d = str(tmp_path / "tt")
    ev = load_table(spark, sf_dir, "events").limit(200)
    s1, s2 = ev.limit(100), ev.subtract(ev.limit(100))
    inc.refresh_agg_state(spark, d, s1, ["event_type"], ["value"])
    inc.refresh_agg_state(spark, d, s2, ["event_type"], ["value"])
    latest = inc.read_agg_state(spark, d)
    v1 = inc.read_agg_state(spark, d, version=1)
    # v=1 holds only the first slice's rows; latest holds both
    assert v1.agg(F.sum("n_rows")).first()[0] == 100
    assert latest.agg(F.sum("n_rows")).first()[0] == 200
    # an uncommitted orphan version is not addressable
    os.makedirs(os.path.join(d, "v=9"), exist_ok=True)
    with pytest.raises(ValueError):
        inc.read_agg_state(spark, d, version=9)
    with pytest.raises(ValueError):
        inc.read_agg_state(spark, d, version=3)


def test_prune_versions_keeps_latest_and_drops_orphans(spark, sf_dir, tmp_path):
    import os

    d = str(tmp_path / "vac")
    ev = load_table(spark, sf_dir, "events").limit(150)
    for i in range(3):
        inc.refresh_agg_state(
            spark, d, ev.limit(50 * (i + 1)), ["event_type"], ["value"]
        )
    os.makedirs(os.path.join(d, "v=7"), exist_ok=True)  # crashed-write orphan
    before = inc.read_agg_state(spark, d).collect()
    deleted = inc.prune_versions(d, keep_last=1)
    assert set(deleted) == {1, 2, 7}
    # the surviving state is exactly the pre-vacuum latest
    after = inc.read_agg_state(spark, d).collect()
    assert sorted(map(str, after)) == sorted(map(str, before))
    # keep_last is clamped: even 0 keeps the newest committed version
    assert inc.prune_versions(d, keep_last=0) == []
    assert inc.read_agg_state(spark, d) is not None
