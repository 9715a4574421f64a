"""Round-7 adversarial self-review tests (SURVEY §7 lesson 12): the
round-6 verdict named three paths whose fixtures can't trip their edge
cases — the FS double-LN weight path, KMV overlap set algebra on
degenerate source layouts, and the curriculum quartile cuts on
duplicate-heavy NLL distributions. Each test builds a DEGENERATE corpus
as a throwaway parquet dir and runs the DECLARED query fn against the
DuckDB oracle on the same files — the parity harness shape, pointed at
inputs the driver fixtures never produce."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mongo_to_parquet_spark.queries import oracle_sql, queries

QS = queries()
OS = oracle_sql()


def _duck(tmpdir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmpdir}/{t}.parquet'")
    return con


def _rows(df):  # order-insensitive, float-tolerant row comparison
    out = []
    for r in df:
        out.append(
            tuple(
                round(v, 4) if isinstance(v, float) else v
                for v in r
            )
        )
    return sorted(out, key=str)


def test_link_fs_constant_and_all_distinct_fields(spark, tmp_path):
    """Degenerate FS inputs: f1 CONSTANT (u₁ = 1 ⇒ raw wd1 = LN(0)) and
    f2 all-distinct (u₂ = 0 ⇒ raw wa2 = LN(x/0)). Unclamped, the engines
    DIVERGE here — DuckDB errors on LN(0) and NULLs double-÷0 while Spark
    NULLs LN(0) and runs IEEE ÷0 to ±Inf. The [1, C(n,2)−1] clamp must
    give FINITE, identical scores from both engines."""
    d = str(tmp_path)
    n = 30
    pd.DataFrame(
        {
            "c_custkey": range(1, n + 1),
            "c_name": [f"c{i}" for i in range(1, n + 1)],
            "c_nationkey": [i % 3 for i in range(1, n + 1)],
            "c_acctbal": [i * 1000.0 for i in range(1, n + 1)],
            "c_mktsegment": ["SAME"] * n,
        }
    ).to_parquet(f"{d}/customer.parquet")
    for key in ("q_link_fs", "q_link_fs_snm"):
        got = QS[key](spark, d).collect()
        want = _duck(d, ["customer"]).execute(OS[key]).fetchall()
        assert len(got) == 20
        for r in got:
            assert r["fs_score"] is not None and math.isfinite(r["fs_score"])
        assert _rows(got) == _rows(want)


def test_overlap_sources_single_source_and_null_text(spark, tmp_path):
    """Single-source corpus ⇒ no pairs ⇒ empty result from BOTH engines;
    then a two-source corpus where one source is SMALLER than the sketch
    k (m < k exact path) and carries a NULL text row (the h-not-null
    mirror fixed this round) must agree engine-for-engine."""
    d = str(tmp_path)
    one = pd.DataFrame({"source": ["a"] * 100, "text": [f"t{i}" for i in range(100)]})
    one.to_parquet(f"{d}/documents.parquet")
    assert QS["q_overlap_sources"](spark, d).collect() == []
    assert _duck(d, ["documents"]).execute(OS["q_overlap_sources"]).fetchall() == []

    texts_a = [f"t{i}" for i in range(100)]
    small = ["t0", "t1", "t2", None, "only-in-b"]  # 4 distinct hashes < k=64
    two = pd.DataFrame(
        {
            "source": ["a"] * 100 + ["b"] * len(small),
            "text": texts_a + small,
        }
    )
    two.to_parquet(f"{d}/documents.parquet")
    got = QS["q_overlap_sources"](spark, d).collect()
    want = _duck(d, ["documents"]).execute(OS["q_overlap_sources"]).fetchall()
    assert len(got) == 1 and _rows(got) == _rows(want)
    # the small source's 3 shared + 1 own hash all land in the union pool
    assert got[0]["jaccard_x10000"] > 0


def test_pack_curriculum_duplicate_heavy_nll(spark, tmp_path):
    """All-identical documents ⇒ every doc has the SAME fixed-point NLL ⇒
    all three quartile cut ranks land on one tied value ⇒ exactly one
    bucket holding the whole corpus — identically in both engines (the
    (v > cut) bucket rule sends ties low, never splitting a tie run)."""
    d = str(tmp_path)
    pd.DataFrame(
        {"doc_id": range(1, 41), "text": ["alpha beta gamma alpha"] * 40}
    ).to_parquet(f"{d}/documents.parquet")
    got = QS["q_pack_curriculum"](spark, d).collect()
    spark.catalog.clearCache()  # the query persists its scored relation
    want = _duck(d, ["documents"]).execute(OS["q_pack_curriculum"]).fetchall()
    assert len(got) == 1 and got[0]["bucket"] == 1 and got[0]["n_docs"] == 40
    assert _rows(got) == _rows(want)
