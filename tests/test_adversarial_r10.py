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


def _naive_exact_substr(docs: dict, L: int) -> dict:
    """Independent brute-force ExactSubstr: hash every L-window, keep
    first global occurrence, remove covered positions of later ones."""
    first = {}
    for did in sorted(docs):
        toks = docs[did]
        for p in range(len(toks) - L + 1):
            first.setdefault(tuple(toks[p : p + L]), (did, p))
    out = {}
    for did in sorted(docs):
        toks = docs[did]
        starts = [
            p
            for p in range(len(toks) - L + 1)
            if first[tuple(toks[p : p + L])] != (did, p)
        ]
        removed = set()
        for p in starts:
            removed.update(range(p, p + L))
        spans, prev = 0, None
        for p in starts:
            if prev is None or p > prev + L:
                spans += 1
            prev = p
        kept = [t for i, t in enumerate(toks) if i not in removed]
        out[did] = (len(toks), spans, len(removed), " ".join(kept))
    return out


def test_exact_substr_matches_naive_scan(spark):
    """Property check (round-9 verdict item 2): the distributed
    windows→min-keeper→interval-merge pipeline equals a brute-force
    Python suffix scan on a small-alphabet corpus engineered for heavy
    cross-document and self-overlapping repeats — for BOTH the plain-span
    and the sha256 shuffle-key forms."""
    import random

    from mongo_to_parquet_spark.operators.dedup import exact_substr_dedup

    rng = random.Random(42)
    alpha = ["a", "b", "c"]
    corpus: dict[int, list[str]] = {}
    motif = [rng.choice(alpha) for _ in range(9)]
    for did in range(1, 31):
        n = rng.randint(1, 40)
        toks = [rng.choice(alpha) for _ in range(n)]
        if did % 3 == 0 and n > 12:  # plant the shared motif mid-doc
            at = rng.randint(0, n - 10)
            toks[at : at + 9] = motif
        if did % 7 == 0:  # degenerate self-repetition run
            toks = ["a"] * n
        corpus[did] = toks
    corpus[31] = list(corpus[3])  # full-doc duplicate
    corpus[32] = []  # empty doc
    L = 4
    # tokenize the naive side EXACTLY like both engines: split(' ') of the
    # joined text ('' -> [''], one empty token — not zero tokens)
    want = _naive_exact_substr(
        {d: " ".join(t).split(" ") for d, t in corpus.items()}, L
    )
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in corpus.items()], "doc_id long, text string"
    )
    for hk in (False, True):
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["n_cut_spans"],
                r["n_removed"],
                r["cleaned_text"],
            )
            for r in exact_substr_dedup(docs, min_tokens=L, hash_key=hk).collect()
        }
        assert got == want, f"hash_key={hk}"


def test_exact_substr_degenerate_corpus_parity(spark, tmp_path):
    """Lesson-28 degenerate-corpus parity for the declared key: docs
    shorter than L, a doc that is ENTIRELY a duplicate (empty remainder),
    and misaligned (offset-shifted) repeats that the fixed-grid
    q_dedup_span would miss — Spark and the DuckDB oracle agree."""
    base = " ".join(f"tok{i}" for i in range(25))
    texts = [
        "short doc",                       # < L: untouched
        base,                              # first occurrence: kept whole
        base,                              # exact duplicate: fully removed
        "lead in words " + base,           # offset repeat: suffix removed
        base + " trailing unique tail",    # prefix repeat
    ]
    d = str(tmp_path / "xsub")
    os.makedirs(d)
    _docs(d, texts)
    got = {
        r["doc_id"]: (r["n_removed"], r["cleaned_text"])
        for r in QS["q_dedup_exact_substr"](spark, d).collect()
    }
    assert got[1] == (0, "short doc")
    assert got[2][0] == 0 and got[2][1] == base
    assert got[3] == (25, "")
    assert got[4] == (25, "lead in words")
    assert got[5] == (25, "trailing unique tail")
    oracle = {
        r[0]: (r[3], r[4])
        for r in _duck(d).execute(OR["q_dedup_exact_substr"]).fetchall()
    }
    assert oracle == got


def test_ann_multi_assignment_invariants(spark, sf_dir):
    """Round-9 verdict item 3 (soft assignment): at every n_probe,
    overlap=2 recall dominates overlap=1; at MATCHED candidate volume
    (overlap=2 @ n_probe=p vs overlap=1 @ n_probe=2p — both scan ~the
    same rows), multi-assignment is within sampling noise of deep
    probing (it WINS at sf0.01: 7187 vs 6875 bp at ~3950 candidates; at
    sf0.001's 16-probe sample it ties within 4pp); and the 90%-recall
    operating point exists on the curve (overlap=2, n_probe=8 — 9062 bp
    at BOTH fixture scales)."""
    rows = {
        (r["overlap"], r["n_probe"]): (r["recall_bp"], r["n_cand"])
        for r in QS["q_ann_tuning"](spark, sf_dir).collect()
    }
    for p in (1, 2, 4, 8):
        assert rows[(2, p)][0] >= rows[(1, p)][0], p
        # storage x2 => candidate rows ~x2 at fixed n_probe (never less)
        assert rows[(2, p)][1] >= rows[(1, p)][1], p
    for p in (1, 2, 4):
        matched = rows[(1, 2 * p)]
        soft = rows[(2, p)]
        assert abs(soft[1] - matched[1]) <= 0.1 * matched[1], p  # ~same cost
        assert soft[0] >= matched[0] - 400, p  # recall >= deep-probe - 4pp
    assert rows[(2, 8)][0] >= 9000  # the 90% operating point (sf0.01: 90.6%)


def test_ivf_layout_overlap_prunes_and_dedups(spark, sf_dir, tmp_path):
    """A multi-assignment layout still partition-prunes (the cell IN
    filter reaches PartitionFilters), serves each candidate ONCE despite
    double indexing, and ivf_append inherits the layout's overlap from
    its marker. The overlap layout's top-k can only improve on (never
    lose to) the single-assignment layout's at the same n_probe."""
    from mongo_to_parquet_spark.operators.similarity import (
        build_ivf_layout,
        ivf_append,
        ivf_topk_from_layout,
        layout_current,
        read_layout_meta,
    )
    from mongo_to_parquet_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    outs = {}
    for ov in (1, 2):
        d = str(tmp_path / f"ivf_ov{ov}")
        build_ivf_layout(emb, d, n_cells=8, overlap=ov)
        meta = read_layout_meta(d)
        assert meta["overlap"] == ov and meta["family"] == "ivf"
        assert layout_current(d, {"n_cells": 8, "overlap": ov})
        assert not layout_current(d, {"n_cells": 16})
        got = ivf_topk_from_layout(
            spark, d, list(probe), k=10, n_probe=2, exclude_id=7
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "cell" in plan
        rows = got.collect()
        ids = [r["vec_id"] for r in rows]
        assert len(ids) == len(set(ids)) == 10  # deduped, full k
        outs[ov] = rows
    # same probe, same n_probe: the overlap layout reaches a superset of
    # cells' vectors, so its kth-best sim is >= the single layout's
    assert outs[2][-1]["sim"] >= outs[1][-1]["sim"]
    # append through the overlap layout: new vector lands in 2 cells
    d2 = str(tmp_path / "ivf_ov2")
    new = spark.createDataFrame(
        [(9001, list(probe))],
        "vec_id bigint, embedding array<float>",
    )
    ivf_append(new, d2)
    dup = (
        spark.read.parquet(f"{d2}/vectors")
        .filter(F.col("vec_id") == 9001)
        .collect()
    )
    assert len(dup) == 2 and sorted(r["ark"] for r in dup) == [1, 2]
    # ...and the probe now finds it exactly once, at sim 1.0
    top = ivf_topk_from_layout(spark, d2, list(probe), k=3, n_probe=1).collect()
    assert [r["vec_id"] for r in top].count(9001) == 1
    # vec 7 itself (the probe source, sim 1.0, lower id) legitimately
    # outranks the appended copy — both must sit at the top at sim 1.0
    assert [r["vec_id"] for r in top[:2]] == [7, 9001]
    assert top[1]["sim"] == 1.0


def test_ann_drift_gate_trips_on_drifted_corpus(spark, tmp_path):
    """Round-9 verdict item 4: an artificially drifted corpus — base
    slice clustered tightly on coordinate axes (the geometry the frozen
    centroids were built for), delta appends a dense off-axis cluster
    whose members scatter across cells — must trip the rebuild signal,
    and Spark must agree with the DuckDB oracle on the drifted corpus.
    On the REAL fixture (same-distribution appends) the flag stays off."""
    import numpy as np

    from mongo_to_parquet_spark.queries.retrieval import (
        ORACLE as RET_O,
        QUERIES as RET_Q,
    )

    dim = 8
    rows = []
    base_ids = [i for i in range(1, 120) if i % 4 != 0]
    # 16 lowest base ids = the centroids: two scales per axis
    for j, vid in enumerate(base_ids[:16]):
        v = np.zeros(dim, dtype=np.float32)
        v[j % dim] = 10.0 + (j // dim) * 0.1
        rows.append((vid, v))
    # 9 more base points per axis (11 total each): every base probe's
    # full top-10 lives on its own axis, i.e. in one probed cell —
    # build-time recall is perfect
    for j, vid in enumerate(base_ids[16:88]):
        v = np.zeros(dim, dtype=np.float32)
        v[j % dim] = 8.0 + 0.01 * j
        rows.append((vid, v))
    # delta (ids % 4 == 0): a tight off-axis cluster; each member is
    # nudged toward a DIFFERENT axis, so the frozen quantizer scatters
    # mutual nearest neighbors across all 8 cells while a probe can
    # only read 4
    for j, vid in enumerate(range(4, 4 * 49, 4)):
        v = np.full(dim, 5.0, dtype=np.float32)
        v[j % dim] += 3.0 + 0.001 * j
        rows.append((vid, v))
    pd.DataFrame(
        {
            "vec_id": np.array([r[0] for r in rows], dtype="int64"),
            "embedding": [r[1] for r in rows],
            "label": np.zeros(len(rows), dtype="int32"),
        }
    ).to_parquet(f"{tmp_path}/embeddings.parquet")
    got = RET_Q["q_ann_drift"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet'"
    )
    want = con.execute(RET_O["q_ann_drift"]).fetchall()[0]
    assert tuple(r) == tuple(want)
    assert r["recall_build_bp"] >= 9000   # the layout WAS good at build
    assert r["drift_bp"] > 500 and r["rebuild"]  # ...and is stale now


def test_bigram_lm_backoff_floor_and_unseen_accounting(spark, tmp_path):
    """A delta doc made of entirely novel tokens must score at exactly
    the uniform floor: every bigram unseen (n12=0) with unseen context
    (n1=0) gives P = 0.5/(0.5·V) = 1/V, so nll2 = round(ln V, 4) and
    n_unseen = n_bigrams — pinned against the oracle on a corpus where
    the arithmetic is checkable by hand."""
    import math

    base = "a b c a b"           # base bigrams: ab, bc, ca, ab -> V = {b,c,a} = 3
    texts = [base, base, base, "x y z x"]  # doc_id 4 (delta): all novel
    d = str(tmp_path / "blm")
    os.makedirs(d)
    _docs(d, texts)
    got = {
        r["doc_id"]: (r["nll2"], r["n_bigrams"], r["n_unseen"])
        for r in QS["q_logprob_bigram"](spark, d).collect()
    }
    # V = 3 distinct continuations in the base LM; the novel doc's 3
    # bigrams all hit the unseen-context floor 1/3
    assert got[4] == (round(math.log(3.0), 4), 3, 3)
    assert got[1][2] == 0  # base doc: every bigram seen
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in _duck(d).execute(OR["q_logprob_bigram"]).fetchall()
    }
    assert oracle == got
    # serve twin agrees (cold store under tmp corpus dir)
    import shutil

    from mongo_to_parquet_spark.operators import tokenizer

    shutil.rmtree(tokenizer.artifact_dir(d, "bigram_lm"), ignore_errors=True)
    served = {
        r["doc_id"]: (r["nll2"], r["n_bigrams"], r["n_unseen"])
        for r in QS["q_logprob_bigram_artifact"](spark, d).collect()
    }
    assert served == got


def test_exact_substr_index_parquet_round_trip(spark, sf_dir, tmp_path):
    """The first-occurrence index survives a parquet round-trip
    unchanged (decimal keys included), and the incremental clean run
    from the LOADED index equals the in-memory one — the persistence
    half of the daily-crawl contract."""
    from pyspark.sql import functions as F

    from mongo_to_parquet_spark.operators.dedup import (
        exact_substr_incremental,
        exact_substr_index,
    )
    from mongo_to_parquet_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 4 != 0)
    delta = d.filter(F.col("doc_id") % 4 == 0)
    idx = exact_substr_index(base)
    p = str(tmp_path / "xsub_idx")
    idx.write.parquet(p)
    loaded = spark.read.parquet(p)
    assert sorted(map(tuple, idx.collect())) == sorted(
        map(tuple, loaded.collect())
    )
    mem = sorted(map(tuple, exact_substr_incremental(delta, idx).collect()))
    disk = sorted(map(tuple, exact_substr_incremental(delta, loaded).collect()))
    assert mem == disk and len(mem) > 0
