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
