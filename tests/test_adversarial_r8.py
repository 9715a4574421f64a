"""Round-8 adversarial self-review tests (SURVEY §7 standing discipline):
degenerate inputs the driver fixtures can't produce, run through the
DECLARED query fn against the DuckDB oracle on throwaway parquet dirs —
the parity-harness shape pointed at hostile corpora."""

from __future__ import annotations

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


def _docs(tmpdir, texts, langs=None):
    pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": langs or ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{tmpdir}/documents.parquet")


def test_bpe_pipeline_early_stopping_corpora(spark, tmp_path):
    """Corpora whose BPE training runs DRY before k=8 merges (round-7
    advice): the oracle's CROSS JOIN over m_1..m_8 used to yield ZERO
    rows when any m_i was empty while the Spark side kept emitting
    per-language rows. With LEFT JOIN + chr(1)-sentinel replaces, both
    engines truncate at the last real merge identically."""
    import os

    cases = {
        # 2 merges then dry: ab,cd fully merged → m3..m8 empty
        "dry2": (["ab ab ab", "cd cd"], {"en": (2, 5, 5)}),
        # zero merges possible: only single-char words
        "singles": (["a b c", "x y"], {"en": (2, 5, 5)}),
        # token-less corpus: no words at all, apply must still count docs
        "tokenless": (["", "  "], {"en": (2, 0, 0)}),
    }
    for name, (texts, want) in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        _docs(d, texts)
        got = {
            r["lang"]: (r["n_docs"], r["n_words"], r["n_subwords"])
            for r in QS["q_bpe_pipeline"](spark, d).collect()
        }
        duck = {
            r[0]: (r[1], r[2], r[3])
            for r in _duck(d, ["documents"])
            .execute(OS["q_bpe_pipeline"])
            .fetchall()
        }
        assert got == duck == want, name


def test_unigram_degenerate_corpora(spark, tmp_path):
    """Lesson-28 sweep for the unigram tokenizer keys: corpora the
    fixtures never produce, run through the DECLARED query fns against
    their oracles. Cases: token-less docs (empty census: train and
    pipeline emit ZERO rows in both engines — unlike q_bpe_pipeline,
    zero-word docs drop out of the unigram accounting by contract),
    single-char-only words (empty seed: vocab = characters, k = word
    length), a word beyond the 32-char cap (excluded from census AND
    apply in both engines), and a two-word 'spark'/'customer' corpus —
    the exact shape that reproduced DuckDB 1.0.0's list_reduce
    row-result reuse when the backtrace lambda had an identity branch
    (the fold now runs exactly k piece steps; see _uni_pieces_sql)."""
    import os

    long_w = "x" * 33
    cases = {
        "tokenless": ["", "  "],
        "singles": ["a b c", "x y"],
        "capped": [f"{long_w} abc abc", "abc ab"],
        "sparkcust": ["spark customer spark", "customer spark park cust"],
    }
    for name, texts in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        _docs(d, texts)
        con = _duck(d, ["documents"])
        for key in ("q_unigram_train", "q_unigram_pipeline"):
            got = sorted(tuple(r) for r in QS[key](spark, d).collect())
            want = sorted(tuple(r) for r in con.execute(OS[key]).fetchall())
            assert got == want, (name, key, got, want)
        if name == "tokenless":
            assert not QS["q_unigram_train"](spark, d).collect()
        if name == "capped":
            pieces = {r["piece"] for r in QS["q_unigram_train"](spark, d).collect()}
            assert "x" not in pieces  # the 33-char word never enters the census


def test_pack_bfd_degenerate_corpora(spark, tmp_path):
    """Lesson-28 sweep for q_pack_bfd/q_pack_eff: oversized docs (n_tok >
    L=128 — bin alone, overflow is truncation not padding), exact-fit
    boundaries (fill + t == L must fit), and a flood of size-1 docs
    backfilling earlier bins — run through query vs oracle on throwaway
    corpora."""
    import os

    w = lambda n: " ".join(["tok"] * n)  # noqa: E731
    cases = {
        # doc_ids chosen % 8 == 0 so everything lands in ONE shard and
        # the placement order is fully exercised
        "oversized": [w(200), w(100), w(28), w(128)],
        "exactfit": [w(64), w(64), w(64), w(63), w(1)],
        "backfill": [w(120)] + [w(1)] * 30,
    }
    for name, texts in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        import pandas as pd

        pd.DataFrame(
            {
                "doc_id": [8 * (i + 1) for i in range(len(texts))],
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ).to_parquet(f"{d}/documents.parquet")
        con = _duck(d, ["documents"])
        for key in ("q_pack_bfd", "q_pack_eff"):
            got = sorted(tuple(r) for r in QS[key](spark, d).collect())
            want = sorted(tuple(r) for r in con.execute(OS[key]).fetchall())
            assert got == want, (name, key, got, want)
        if name == "oversized":
            bins = {
                r["doc_id"]: r["bin_id"] for r in QS["q_pack_bfd"](spark, d).collect()
            }
            # the 200-tok doc is alone in its bin; 100+28 and 128 pack tight
            by_bin = {}
            for did, b in bins.items():
                by_bin.setdefault(b, []).append(did)
            assert [8] in by_bin.values()  # oversized loner


def test_langid_ngram_degenerate_corpora(spark, tmp_path):
    """Lesson-28 sweep for q_text_langid_ngram: a single-language corpus
    (argmax trivially that language), single-char words (padding keeps
    them featureful: '_a_'), and a doc of only whitespace (no rows for
    it) — query vs oracle on throwaway corpora."""
    import os

    cases = {
        "onelang": (["aaa bbb aaa", "bbb aaa"], ["en", "en"]),
        "tinywords": (["a b a", "b a b"], ["en", "de"]),
        "blank": (["   ", "word word word"], ["fr", "es"]),
    }
    for name, (texts, langs) in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        _docs(d, texts, langs)
        con = _duck(d, ["documents"])
        got = sorted(tuple(r) for r in QS["q_text_langid_ngram"](spark, d).collect())
        want = sorted(tuple(r) for r in con.execute(OS["q_text_langid_ngram"]).fetchall())
        assert got == want, (name, got, want)
        if name == "onelang":
            assert got == [("en", "en", 2)]
        if name == "blank":
            assert {g[0] for g in got} == {"es"}  # the blank doc emits nothing


def test_wordpiece_pipeline_early_stopping_corpora(spark, tmp_path):
    """The shared apply tail (_merge_apply_sql) must keep its
    early-stopping behavior for the WordPiece family too: corpora whose
    training runs dry before k merges truncate identically in both
    engines (the LEFT JOIN + chr(1)-sentinel convention q_bpe_pipeline
    was fixed with)."""
    import os

    cases = {
        "dry2": ["ab ab ab", "cd cd"],
        "singles": ["a b c", "x y"],
        "tokenless": ["", "  "],
    }
    for name, texts in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        _docs(d, texts)
        con = _duck(d, ["documents"])
        for key in ("q_wordpiece_train", "q_wordpiece_pipeline"):
            got = sorted(tuple(r) for r in QS[key](spark, d).collect())
            want = sorted(tuple(r) for r in con.execute(OS[key]).fetchall())
            assert got == want, (name, key, got, want)


def test_jaccard_wide_bitset_boundaries(spark, tmp_path):
    """Lesson-28 sweep for the widened bitset path: vocab exactly 64
    (scalar-long form), exactly 65 (first 2-word corpus), a wide corpus
    containing EMPTY docs (all-zero masks must drop, like every other
    path), and bit 63 / bit 64 occupancy across the word boundary —
    each compared against the explode path on the same corpus."""
    from pyspark.sql import Row

    from mongo_to_parquet_spark.operators import dedup

    def pairs(df, **kw):
        return sorted(
            (r.doc1, r.doc2, r.jaccard)
            for r in dedup.jaccard_pairs(df, 0.5, **kw).collect()
        )

    for vocab_n in (64, 65, 130):
        rows = [
            Row(doc_id=i, text=" ".join(f"w{j:03d}" for j in range(i, vocab_n)))
            for i in range(6)
        ] + [Row(doc_id=99, text="")]
        df = spark.createDataFrame(rows)
        got = pairs(df)  # router: bitset (scalar at 64, wide beyond)
        want = pairs(df, strategy="explode")
        assert got == want and got, vocab_n
        assert not any(99 in (a, b) for a, b, _ in got)  # empty doc dropped
