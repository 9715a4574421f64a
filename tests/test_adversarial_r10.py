"""Round-10 adversarial self-review tests (SURVEY §7 standing
discipline), targeting the newest machinery: the BFD oracle-side bin
bound (round-9 verdict item 6 — the guard now exists on BOTH engines),
the new artifact-serve twins, the exact-substring span cutter, IVF
multi-assignment, and the layout drift gate."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mongo_to_parquet_spark.queries import oracle_sql, queries

QS = queries()
OR = oracle_sql()


def _docs(tmpdir, texts, langs=None, ids=None):
    ids = ids or list(range(1, len(texts) + 1))
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": texts,
            "lang": langs or ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{tmpdir}/documents.parquet")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_bfd_oracle_guard_fires_at_boundary(spark, tmp_path):
    """Round-9 verdict item 6: the oracle tie-encode (L-fill)*4096+j used
    to wrap SILENTLY at >= 4096 open bins while only the Spark kernel
    raised. The oracle now carries the same bound as a CASE ... error()
    branch at the exact append that would wrap: 4095 bins agree with the
    kernel row-for-row, 4096 refuses on BOTH engines."""
    text = " ".join(["w"] * 128)  # n_tok = _PACK_L: every doc opens a bin

    def corpus(n):
        d = str(tmp_path / f"bfdo{n}")
        os.makedirs(d)
        _docs(d, [text] * n, ids=[8 * (i + 1) for i in range(n)])
        return d

    ok_dir = corpus(4095)
    oracle_rows = {
        r[1]: r[3]
        for r in _duck(ok_dir).execute(OR["q_pack_bfd"]).fetchall()
    }
    spark_rows = {
        r["doc_id"]: r["bin_id"]
        for r in QS["q_pack_bfd"](spark, ok_dir).collect()
    }
    assert oracle_rows == spark_rows and len(oracle_rows) == 4095

    bad_dir = corpus(4096)
    with pytest.raises(Exception, match="open bins per shard"):
        _duck(bad_dir).execute(OR["q_pack_bfd"]).fetchall()
    with pytest.raises(Exception, match="open bins per shard"):
        QS["q_pack_bfd"](spark, bad_dir).collect()
