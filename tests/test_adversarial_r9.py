"""Round-9 adversarial self-review tests (SURVEY §7 standing
discipline), targeting the newest machinery: the forced-bitset vocab
guard, the BFD bin-count bound at its boundary, the ANN tuning curve's
invariants, tiny-sample LSH tuning (exact side empty), WordPiece tie
cascades on symmetric corpora, and loud failure on non-monotone
streaming arrival."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mongo_to_parquet_spark.queries import queries

QS = queries()


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


def test_forced_bitset_with_oversized_vocab_raises(spark):
    """strategy='bitset' with a vocabulary past the mask cap used to
    build a TRUNCATED literal dictionary whose missing shingles silently
    dropped bits (wrong similarities) — now it refuses (round-8
    ADVICE #1)."""
    from mongo_to_parquet_spark.operators.dedup import jaccard_pairs

    texts = [
        " ".join(f"tok{i}_{j}" for j in range(300)) for i in range(3)
    ]  # 900 distinct tokens >> 512 cap
    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="bitset strategy requires"):
        jaccard_pairs(docs, 0.5, strategy="bitset")
    # auto-routing on the same corpus must still work (vocab > cap
    # routes away from bitset)
    assert jaccard_pairs(docs, 0.5).count() == 0


def test_bfd_bin_bound_enforced_at_boundary(spark, tmp_path):
    """The BFD kernel's 4096-open-bins bound (the oracle tie-encode
    limit) raises — and raises under `python -O` too, since round 8
    swapped the bare assert for ValueError. 4095 single-doc bins in one
    shard passes; 4096 refuses."""
    text = " ".join(["w"] * 128)  # n_tok = _PACK_L: every doc opens a bin

    def corpus(n):
        d = str(tmp_path / f"bfd{n}")
        os.makedirs(d)
        # doc_id % 8 == 0 -> all land in shard 0
        _docs(d, [text] * n, ids=[8 * (i + 1) for i in range(n)])
        return d

    ok = QS["q_pack_bfd"](spark, corpus(4095)).collect()
    assert len(ok) == 4095
    assert max(r["bin_id"] for r in ok) == 4094
    with pytest.raises(Exception, match="open bins per shard"):
        QS["q_pack_bfd"](spark, corpus(4096)).collect()


def test_ann_tuning_curve_invariants(spark, sf_dir):
    """recall and candidate volume are non-decreasing in n_probe (a
    superset of probed cells can only add candidates and recall), and
    every recall is a sane basis-point value — per overlap level (the
    round-10 multi-assignment extension; its own invariants live in
    test_adversarial_r10)."""
    all_rows = [
        (r["overlap"], r["n_probe"], r["hits"], r["recall_bp"], r["n_cand"])
        for r in QS["q_ann_tuning"](spark, sf_dir).collect()
    ]
    for ov in (1, 2):
        rows = sorted(t[1:] for t in all_rows if t[0] == ov)
        assert [p for p, *_ in rows] == [1, 2, 4, 8]
        for (p1, h1, r1, c1), (p2, h2, r2, c2) in zip(rows, rows[1:]):
            assert h2 >= h1 and r2 >= r1 and c2 > c1, (ov, p1, p2)
        assert all(0 <= r <= 10000 for _, _, r, _ in rows)
        assert rows[-1][1] > 0  # at n_probe=8 of 16 cells, SOME overlap


def test_lsh_tuning_sample_too_small_is_empty_both_engines(spark, sf_dir):
    """sample_frac so small the content-addressed sample selects NO doc:
    the exact side is empty and both engines agree on zero rows (the
    round-8 verdict's frac edge case) — not an error, not a divergence."""
    from mongo_to_parquet_spark.queries.llm import _lsh_tuning_sql

    frac = 1e-13
    rows = QS["q_lsh_tuning"](spark, sf_dir, sample_frac=frac).collect()
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracle = con.execute(_lsh_tuning_sql(frac)).fetchall()
    assert rows == [] and oracle == []


def test_wordpiece_tie_cascade_on_symmetric_corpus(spark, tmp_path):
    """A corpus built so the first likelihood argmax TIES symmetrically
    ('ab' vs 'ba' have identical cnt and identical cx*cy): the (score
    desc, x, y) tie rule must cascade identically through all merges in
    both engines — pinned query-vs-oracle on throwaway parquet."""
    from mongo_to_parquet_spark.queries.curation import ORACLE as CUR_O

    cases = {
        "sym": ["ab ba ab ba", "ba ab", "ab ba"],
        # palindromic words: every adjacent pair appears with its mirror
        "mirror": ["aba bab aba", "bab aba bab"],
        # all pairs distinct with equal counts: pure (x, y) ordering
        "flat": ["ab cd ef", "gh ij kl"],
    }
    for name, texts in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        _docs(d, texts)
        got = sorted(
            tuple(r)
            for r in QS["q_wordpiece_pipeline"](spark, d).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(CUR_O["q_wordpiece_pipeline"]).fetchall()
        )
        assert got == want and got, name


def test_stream_assembly_rejects_non_monotone_arrival(spark, sf_dir, tmp_path):
    """The documented monotone-arrival contract is now ENFORCED: a batch
    whose min doc_id is at or below the committed max fails the stream
    loudly (quietly keeping the earlier larger-id copy would silently
    diverge from the batch pipeline), and nothing from the offending
    batch commits."""
    import time

    import numpy as np

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.streaming import assembly as sa
    from mongo_to_parquet_spark.streaming import decontaminate as sdc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    evp = str(tmp_path / "eval_grams")
    sdc.eval_gram_table(docs.filter(F.col("doc_id") % 97 == 0), evp)

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    pdf = docs.toPandas().sort_values("doc_id")
    halves = np.array_split(pdf, 2)
    t0 = time.time() - 100
    # REVERSED arrival: high doc_ids first, low doc_ids second
    for i, part in enumerate((halves[1], halves[0])):
        p = os.path.join(src, f"slice-{i}.parquet")
        part.to_parquet(p, index=False)
        os.utime(p, (t0 + i, t0 + i))

    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sa.stream_assembly(stream, evp, state, str(tmp_path / "ck"))
    with pytest.raises(Exception, match="non-monotone arrival"):
        q.awaitTermination(300)
        if q.exception() is not None:
            raise q.exception()
    from mongo_to_parquet_spark.streaming import state as sst

    assert sst.ledger_ids(state) == [0]  # batch 1 never committed


def test_media_header_parser_handles_foreign_and_truncated_bytes(spark):
    """The parser's production contract: blobs that are NOT one of the
    known containers (foreign magic, truncated header, empty) classify
    as 'unknown' with NULL dimensions — never a crash, never a
    misparse; and a truncated PNG (magic intact, header cut) still
    dispatches as png with NULL width (substring past the end is empty
    -> conv(NULL-ish) stays NULL)."""
    from mongo_to_parquet_spark.operators.multimodal import (
        parse_media_header,
        synth_media,
    )

    docs = spark.createDataFrame(
        [(2, "hello world"), (3, "audio bytes")], "doc_id long, text string"
    )
    real = synth_media(docs)
    junk = spark.createDataFrame(
        [
            (100, bytearray(b"GIF89a not a png")),
            (101, bytearray(b"")),
            (102, bytearray(b"\x89PNG\r\n\x1a\x08 wrong last magic byte")),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: (
            r["media_type"],
            r["width"],
            r["height"],
            r["channels"],
            r["sample_rate"],
        )
        for r in parse_media_header(real.unionByName(junk)).collect()
    }
    assert got[2] == ("png", 1 + 2 % 1024, 1 + (2 // 7) % 768, None, None)
    assert got[3] == ("wav", None, None, 1 + (3 // 3) % 2, 8000 * (1 + 3 % 5))
    assert got[100][0] == "unknown" and got[100][1:] == (None,) * 4
    assert got[101][0] == "unknown"
    assert got[102][0] == "unknown"  # 8-byte magic must match exactly
    # truncated-after-magic png: dispatches png, width NULL (no bytes)
    trunc = spark.createDataFrame(
        [(103, bytearray(bytes.fromhex("89504E470D0A1A0A") + b"xx"))],
        "doc_id long, payload binary",
    )
    [r] = parse_media_header(trunc).collect()
    assert r["media_type"] == "png" and r["width"] is None


def test_monotone_guard_survives_marker_vacuum(spark, sf_dir, tmp_path):
    """The enforcement's state (the committed max doc_id) rides ledger
    markers, which vacuum DELETES at or below the compaction watermark —
    the carry through the compaction marker must keep the guard armed:
    after compact+vacuum, a regressing batch still fails loudly."""
    import time

    import numpy as np

    from mongo_to_parquet_spark.sources.catalog import load_table
    from mongo_to_parquet_spark.streaming import assembly as sa
    from mongo_to_parquet_spark.streaming import decontaminate as sdc
    from mongo_to_parquet_spark.streaming import state as sst

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    evp = str(tmp_path / "eval_grams")
    sdc.eval_gram_table(docs.filter(F.col("doc_id") % 97 == 0), evp)

    src = str(tmp_path / "src")
    os.makedirs(src)
    pdf = docs.toPandas().sort_values("doc_id")
    halves = np.array_split(pdf, 2)
    t0 = time.time() - 100
    p0 = os.path.join(src, "slice-0.parquet")
    halves[0].to_parquet(p0, index=False)
    os.utime(p0, (t0, t0))

    state = str(tmp_path / "state")

    def run(ck):
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = sa.stream_assembly(stream, evp, state, ck)
        q.awaitTermination(300)
        return q

    run(str(tmp_path / "ck"))
    mx = int(halves[0]["doc_id"].max())
    assert sst.marker_field(state, "max_doc_id") == mx

    sa.compact_assembly_state(spark, state)
    assert sst.ledger_ids(state) == []  # markers vacuumed...
    assert sst.marker_field(state, "max_doc_id") == mx  # ...carry survives

    # a REGRESSING batch after the vacuum must still be rejected
    p1 = os.path.join(src, "slice-1.parquet")
    halves[0].head(50).to_parquet(p1, index=False)  # same low ids again
    os.utime(p1, (t0 + 1, t0 + 1))
    with pytest.raises(Exception, match="non-monotone arrival"):
        run(str(tmp_path / "ck"))


def test_ann_tuning_on_corpus_smaller_than_cells_and_probes(spark, tmp_path):
    """q_ann_tuning on a 5-vector corpus — fewer vectors than cells (16)
    and probes (16): both engines degrade identically (every vector is a
    centroid AND a probe; exact top-10 truncates to 4 neighbors), pinned
    query-vs-oracle on throwaway parquet."""
    import duckdb
    import numpy as np

    from mongo_to_parquet_spark.queries.retrieval import (
        ORACLE as RET_O,
        QUERIES as RET_Q,
    )

    rng = [
        [float((i * 7 + j * 3) % 11) / 11.0 for j in range(8)] for i in range(5)
    ]
    pd.DataFrame(
        {
            "doc_id": range(5),  # unused, mirrors fixture shape loosely
            "vec_id": np.arange(5, dtype="int64"),
            "embedding": [np.array(v, dtype="float32") for v in rng],
            "label": np.arange(5, dtype="int32"),
        }
    )[["vec_id", "embedding", "label"]].to_parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = sorted(
        tuple(r) for r in RET_Q["q_ann_tuning"](spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(RET_O["q_ann_tuning"]).fetchall())
    assert got == want and len(got) == 8  # 4 n_probe points × 2 overlaps
    # overlap=1, n_probe=1: every probe is alone in its own cell -> ZERO
    # candidates; the point must still appear with hits=0/n_cand=0 (a
    # LEFT-joined curve, not a silently dropped row)
    assert got[0] == (1, 1, 0, 0, 0)
    # with every vector probed and ≥ half the (5) cells scanned at p=8,
    # recall must saturate at the top point of BOTH overlap curves
    assert got[3][3] == 10000 and got[-1][3] == 10000  # recall_bp at p=8
