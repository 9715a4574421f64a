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


def test_chunk_and_pack_degenerate_docs(spark, tmp_path):
    """Degenerate chunk/pack inputs the fixtures never produce: empty
    text, whitespace-only text (splits to only '' tokens), a 1-token doc,
    docs at exactly L and L+1 tokens, and a giant 3L+5-token doc. Both
    engines must drop the token-less docs, clamp the tail slice, and
    agree row-for-row; the giant doc must span sequences (concat) and sit
    alone in its bin (greedy)."""
    d = str(tmp_path)
    L_CHUNK, L_PACK = 32, 128
    texts = {
        1: "",
        2: "   ",
        3: "one",
        4: " ".join(f"w{i}" for i in range(L_CHUNK)),       # exactly one chunk
        5: " ".join(f"w{i}" for i in range(L_CHUNK + 1)),   # 2 chunks, tail of 1
        6: " ".join(f"g{i}" for i in range(3 * L_PACK + 5)),  # spans >3 seqs
        9: "a  b",  # double space -> '' token filtered
    }
    pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    ).to_parquet(f"{d}/documents.parquet")
    con = _duck(d, ["documents"])
    for key in ("q_chunk_fixed", "q_pack_concat", "q_pack_greedy"):
        got = QS[key](spark, d).collect()
        want = con.execute(OS[key]).fetchall()
        assert _rows(got) == _rows(want), key
        ids = {r["doc_id"] for r in got}
        assert 1 not in ids and 2 not in ids, key  # token-less docs dropped
    chunks = {
        (r["doc_id"], r["chunk_id"]): r["n_tokens"]
        for r in QS["q_chunk_fixed"](spark, d).collect()
    }
    assert chunks[(4, 0)] == L_CHUNK and (4, 1) not in chunks
    assert chunks[(5, 0)] == L_CHUNK and chunks[(5, 1)] == 1
    concat = {r["doc_id"]: r for r in QS["q_pack_concat"](spark, d).collect()}
    assert concat[6]["last_seq"] - concat[6]["first_seq"] >= 3  # giant doc spans
    greedy = {r["doc_id"]: r for r in QS["q_pack_greedy"](spark, d).collect()}
    bins = {}
    for r in greedy.values():
        bins.setdefault((r["shard"], r["bin_id"]), []).append(r["doc_id"])
    assert bins[(greedy[6]["shard"], greedy[6]["bin_id"])] == [6]  # loner bin


def test_mine_bitext_degenerate_lang_layouts(spark, tmp_path):
    """Degenerate bitext inputs: a corpus with NO target-lang docs must
    yield zero pairs from BOTH engines (empty-side cross join); then a
    1×1 corpus (one en, one fr doc) — the margin denominator collapses
    to the pair's own similarity twice, so margin == 1.0 exactly, which
    the strict > 10000 filter drops in BOTH engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    rng = np.random.RandomState(7)

    def write(langs):
        n = len(langs)
        pd.DataFrame(
            {
                "doc_id": range(n),
                "text": ["t"] * n,
                "lang": langs,
                "source": ["s"] * n,
                "n_chars": [1] * n,
            }
        ).to_parquet(f"{d}/documents.parquet")
        emb = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [rng.rand(8).astype("float32") for _ in range(n)],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        )
        pq.write_table(emb, f"{d}/embeddings.parquet")

    write(["en", "en", "de"])  # no fr at all
    got = QS["q_mine_bitext"](spark, d).collect()
    spark.catalog.clearCache()
    want = _duck(d, ["documents", "embeddings"]).execute(OS["q_mine_bitext"]).fetchall()
    assert got == [] and want == []

    write(["en", "fr"])  # 1x1: margin exactly 1.0, strictly-greater drops it
    got = QS["q_mine_bitext"](spark, d).collect()
    spark.catalog.clearCache()
    want = _duck(d, ["documents", "embeddings"]).execute(OS["q_mine_bitext"]).fetchall()
    assert _rows(got) == _rows(want) == []


def test_shuffle_epoch_single_doc(spark, tmp_path):
    """A 1-doc corpus: each epoch is the identity permutation (rank 1),
    identically in both engines — the bucket-offset path must not lose
    the row when 255 of 256 buckets are empty."""
    d = str(tmp_path)
    pd.DataFrame(
        {"doc_id": [42], "text": ["solo"], "lang": ["en"],
         "source": ["s"], "n_chars": [4]}
    ).to_parquet(f"{d}/documents.parquet")
    got = sorted(
        (r["epoch"], r["doc_id"], r["rank"])
        for r in QS["q_shuffle_epoch"](spark, d).collect()
    )
    want = sorted(
        (r[0], r[1], r[3])
        for r in _duck(d, ["documents"]).execute(OS["q_shuffle_epoch"]).fetchall()
    )
    assert got == [(0, 42, 1), (1, 42, 1)] and want == got


def test_partition_apply_all_identical_keys(spark, tmp_path):
    """All rows share ONE key ⇒ all 15 boundaries collapse onto it ⇒
    every row lands in the last bucket (bucket 15), identically in both
    engines — the tie-run behavior of bucket = |{boundaries ≤ key}|."""
    d = str(tmp_path)
    pd.DataFrame(
        {"l_orderkey": [7] * 40, "l_partkey": range(40), "l_suppkey": [1] * 40,
         "l_quantity": [1.0] * 40, "l_extendedprice": [1.0] * 40,
         "l_discount": [0.0] * 40, "l_tax": [0.0] * 40,
         "l_returnflag": ["N"] * 40, "l_linestatus": ["O"] * 40}
    ).to_parquet(f"{d}/lineitem.parquet")
    got = QS["q_partition_apply"](spark, d).collect()
    spark.catalog.clearCache()  # q_partition_bounds persists its census
    want = _duck(d, ["lineitem"]).execute(OS["q_partition_apply"]).fetchall()
    assert _rows(got) == _rows(want)
    assert len(got) == 1 and got[0]["bucket"] == 15 and got[0]["n_rows"] == 40


def test_bpe_curve_degenerate_corpora(spark, tmp_path):
    """Degenerate BPE-curve inputs found by this review: a token-less
    corpus (Spark crashed on int(None) while DuckDB emitted k+1 NULL
    rows), an only-single-char corpus (total = the constant alone), and
    a corpus whose training runs DRY before k merges (both engines must
    truncate the curve at the last real merge)."""
    cases = {
        "tokenless": (["", "  ", ""], [(0, 0)]),
        "singles": (["a b c", "x y", "z"], [(0, 6)]),
        "dry2": (["ab ab ab", "cd cd"], [(0, 10), (1, 7), (2, 5)]),
    }
    for name, (texts, want) in cases.items():
        d = str(tmp_path / name)
        import os

        os.makedirs(d)
        pd.DataFrame(
            {"doc_id": range(1, len(texts) + 1), "text": texts,
             "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
             "n_chars": [len(t) for t in texts]}
        ).to_parquet(f"{d}/documents.parquet")
        got = sorted(
            (r["n_merges"], r["total_subwords"])
            for r in QS["q_bpe_curve"](spark, d).collect()
        )
        spark.catalog.clearCache()  # the curve persists its census
        duck = sorted(
            tuple(r) for r in _duck(d, ["documents"]).execute(OS["q_bpe_curve"]).fetchall()
        )
        assert got == duck == want, name


def test_text_normalize_messy_inputs(spark, tmp_path):
    """The normalizer on inputs the fixtures never contain: mixed case,
    punctuation runs, tabs/newlines, unicode (lowered then swept by the
    ASCII class), leading/trailing junk, and an empty string — both
    engines and a python replay must agree, and superficial variants of
    the same sentence must collapse to ONE norm_hash."""
    import hashlib
    import re

    texts = {
        1: "Hello, World!!",
        2: "hello world",
        3: "  hello\t\nWORLD  ",
        4: "h3llo.. w0rld",
        5: "Crème brûlée & π ≈ 3.14159",
        6: "",
        7: "!!!???",
    }
    d = str(tmp_path)
    pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values()),
         "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
         "n_chars": [len(t) for t in texts.values()]}
    ).to_parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_chars_raw"], r["n_chars_norm"],
                      r["n_tokens_norm"], r["norm_hash"])
        for r in QS["q_text_normalize"](spark, d).collect()
    }
    want_duck = {
        r[0]: tuple(r[1:])
        for r in _duck(d, ["documents"]).execute(OS["q_text_normalize"]).fetchall()
    }
    assert got == want_duck
    for doc_id, text in texts.items():
        norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
        toks = [t for t in norm.split(" ") if t]
        assert got[doc_id] == (
            len(text), len(norm), len(toks),
            hashlib.md5(norm.encode()).hexdigest(),
        ), doc_id
    # variants 1/2/3 are the same sentence after normalization
    assert got[1][3] == got[2][3] == got[3][3]
    assert got[6][3] == got[7][3]  # both normalize to the empty string


def test_eval_mrr_no_relevant_anywhere(spark, tmp_path):
    """Every vector gets a UNIQUE label ⇒ no probe has any relevant
    candidate ⇒ first_rk = 0 for all, n_hit = 0, mrr = 0 — the COALESCE
    branch both engines must take identically."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    rng = np.random.RandomState(3)
    n = 30
    emb = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [rng.rand(8).astype("float32") for _ in range(n)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(range(n), pa.int32()),  # all distinct
        }
    )
    pq.write_table(emb, f"{d}/embeddings.parquet")
    [got] = QS["q_eval_mrr"](spark, d).collect()
    [want] = _duck(d, ["embeddings"]).execute(OS["q_eval_mrr"]).fetchall()
    assert (got["n_probes"], got["n_hit"], got["mrr_x2520"]) == (4, 0, 0)
    assert tuple(got) == want
