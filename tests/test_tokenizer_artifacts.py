"""Tokenizer artifact store (operators/tokenizer.py) — the round-8
verdict's #1: train→persist→apply-from-artifact must equal train→apply
inline, the store must honor the incremental.py durability contract
(commit markers, orphan skip), and the oracle must be able to read the
SAME stored artifact parquet and reproduce the apply."""

from __future__ import annotations

import os
import shutil

import duckdb
import pandas as pd
import pytest

from mongo_to_parquet_spark.operators import tokenizer
from mongo_to_parquet_spark.queries import curation
from mongo_to_parquet_spark.queries.curation import (
    _BPE_TRAIN_K,
    _merge_apply_sql,
    _tok_art_dir,
)

QS = curation.QUERIES

MERGES = [
    (1, "a", "b", "ab", 7),
    (2, "ab", "c", "abc", 4),
    (3, "x", "·y", "x·y", 2),  # non-alnum pair: literals must survive
]


def _corpus(tmpdir, texts, langs=None):
    pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": langs or ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{tmpdir}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_artifact_round_trip_and_versioning(spark, tmp_path):
    art = str(tmp_path / "bpe")
    v1 = tokenizer.save_artifact(spark, MERGES, art, "bpe", meta={"k": 3})
    assert v1 == 1
    assert tokenizer.load_merges(spark, art, "bpe") == [
        (x, y) for _, x, y, _, _ in MERGES
    ]
    assert tokenizer.artifact_meta(art, v1)["k"] == 3
    # a second save is a NEW version; latest wins
    v2 = tokenizer.save_artifact(spark, MERGES[:1], art, "bpe")
    assert v2 == 2 and tokenizer.latest_version(art) == 2
    assert tokenizer.load_merges(spark, art, "bpe") == [("a", "b")]
    # explicit version = time travel to the first table
    assert tokenizer.load_artifact(spark, art, "bpe", version=1).count() == 3


def test_artifact_family_mismatch_refused(spark, tmp_path):
    art = str(tmp_path / "wp")
    tokenizer.save_artifact(
        spark, [m + (100,) for m in MERGES], art, "wordpiece"
    )
    with pytest.raises(ValueError, match="trained as 'wordpiece'"):
        tokenizer.load_merges(spark, art, "bpe")
    with pytest.raises(ValueError, match="unknown tokenizer family"):
        tokenizer.save_artifact(spark, MERGES, art, "charbpe")


def test_orphan_versions_skipped_and_empty_store_raises(spark, tmp_path):
    art = str(tmp_path / "orphan")
    with pytest.raises(ValueError, match="no committed"):
        tokenizer.load_artifact(spark, art, "bpe")
    v1 = tokenizer.save_artifact(spark, MERGES, art, "bpe")
    # simulate a crashed write: v=2 parquet lands, marker never renamed
    spark.createDataFrame(MERGES[:1], tokenizer.SCHEMAS["bpe"]).write.parquet(
        os.path.join(art, "v=2")
    )
    assert tokenizer.latest_version(art) == v1  # orphan invisible
    assert len(tokenizer.load_merges(spark, art, "bpe")) == 3
    # the next save writes PAST the orphan, never reuses v=2
    assert tokenizer.save_artifact(spark, MERGES, art, "bpe") == 3
    with pytest.raises(ValueError, match="not committed"):
        tokenizer.load_artifact(spark, art, "bpe", version=2)


def test_train_once_apply_twice_equals_retrain(spark, tmp_path):
    """The serving contract: cold run trains+persists, warm run serves
    the stored artifact without retraining, and both equal the inline
    train+apply pipeline — for all three families."""
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    _corpus(
        d,
        ["abab abab cdcd", "abab xyxy xyxy", "cdcd cdcd abab q"],
        langs=["en", "de", "en"],
    )
    for art_key, inline_key, family in (
        ("q_bpe_apply_artifact", "q_bpe_pipeline", "bpe"),
        ("q_wordpiece_apply_artifact", "q_wordpiece_pipeline", "wordpiece"),
        ("q_unigram_apply_artifact", "q_unigram_pipeline", "unigram"),
    ):
        # the store is keyed by corpus-dir basename and persists across
        # pytest runs -- start each family from an empty store
        shutil.rmtree(_tok_art_dir(d, family), ignore_errors=True)
        want = _rows(QS[inline_key](spark, d))
        cold = _rows(QS[art_key](spark, d))
        art = _tok_art_dir(d, family)
        v_after_cold = tokenizer.latest_version(art)
        warm = _rows(QS[art_key](spark, d))
        assert cold == want and warm == want, art_key
        # the warm run must NOT have trained a new version
        assert tokenizer.latest_version(art) == v_after_cold, art_key


def test_stale_config_artifact_is_retrained(spark, tmp_path):
    """An artifact trained under a different k is stale, not servable:
    the query must retrain (new version) instead of applying it."""
    d = str(tmp_path / "corpus2")
    os.makedirs(d)
    _corpus(d, ["abab abab", "abab cd"])
    art = _tok_art_dir(d, "bpe")
    shutil.rmtree(art, ignore_errors=True)  # store persists across runs
    tokenizer.save_artifact(
        spark, [(1, "zz", "zz", "zzzz", 1)], art, "bpe", meta={"k": 1}
    )
    got = _rows(QS["q_bpe_apply_artifact"](spark, d))
    assert tokenizer.latest_version(art) == 2  # retrained past the stale v1
    meta = tokenizer.artifact_meta(art, 2)
    assert meta["k"] == _BPE_TRAIN_K
    assert got == _rows(QS["q_bpe_pipeline"](spark, d))


def test_oracle_reads_the_same_stored_artifact(spark, tmp_path):
    """The literal serving parity: DuckDB reads the artifact PARQUET the
    Spark side persisted (not a retrained twin) and applies it through
    the shared apply tail — both engines tokenize from one stored
    table."""
    d = str(tmp_path / "corpus3")
    os.makedirs(d)
    _corpus(d, ["abab abab cdcd", "abab zz", "cdcd cdcd e"])
    shutil.rmtree(_tok_art_dir(d, "bpe"), ignore_errors=True)
    got = {
        r["lang"]: (r["n_docs"], r["n_words"], r["n_subwords"])
        for r in QS["q_bpe_apply_artifact"](spark, d).collect()
    }
    art = _tok_art_dir(d, "bpe")
    v = tokenizer.latest_version(art)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    con.execute(
        "CREATE VIEW merges AS SELECT * FROM "
        f"read_parquet('{art}/v={v}/*.parquet')"
    )
    ms = ",\n".join(
        f"m{i} AS (SELECT x, y FROM merges WHERE rank = {i})"
        for i in range(1, _BPE_TRAIN_K + 1)
    )
    sql = "WITH " + ms + _merge_apply_sql(_BPE_TRAIN_K)
    oracle = {
        r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert got == oracle and got  # non-empty and identical


def test_tokenizer_eval_reconciles_with_pipelines(spark, sf_dir):
    """q_tokenizer_eval's per-language (n_words, n_subwords) must equal
    each family's own pipeline totals — the report cannot drift from the
    pipelines it summarizes (round-8 verdict #5's done-criterion)."""
    ev = {
        (r["family"], r["lang"]): (r["n_words"], r["n_subwords"])
        for r in QS["q_tokenizer_eval"](spark, sf_dir).collect()
    }
    assert len(ev) == 15  # 3 families x 5 langs on the fixture
    for family, key in (
        ("bpe", "q_bpe_pipeline"),
        ("wordpiece", "q_wordpiece_pipeline"),
        ("unigram", "q_unigram_pipeline"),
    ):
        for r in QS[key](spark, sf_dir).collect():
            assert ev[(family, r["lang"])] == (
                r["n_words"],
                r["n_subwords"],
            ), (family, r["lang"])
    # sanity on the derived metrics: fertility >= 1 word->piece, coverage
    # within [0, 10000], and the unigram vocab (trained to compress)
    # covers SOMETHING
    rows = QS["q_tokenizer_eval"](spark, sf_dir).collect()
    for r in rows:
        assert r["fertility_bp"] >= 10000 or r["n_words"] == 0
        assert 0 <= r["coverage_bp"] <= 10000
    assert any(
        r["coverage_bp"] > 0 for r in rows if r["family"] == "unigram"
    )


def test_langid_artifact_serves_without_retraining(spark, sf_dir):
    """The langid weight table round-trips through the store and serves
    identically to the inline train+score; a warm store is not
    retrained. (The store's 4th family — the classifier's langs×1024
    table broadcasts from parquet, never entering the driver.)"""
    from mongo_to_parquet_spark.queries.llm import QUERIES as LLM_Q

    art = tokenizer.artifact_dir(sf_dir, "langid")
    shutil.rmtree(art, ignore_errors=True)
    want = _rows(LLM_Q["q_text_langid_ngram"](spark, sf_dir))
    cold = _rows(LLM_Q["q_langid_apply_artifact"](spark, sf_dir))
    v = tokenizer.latest_version(art)
    warm = _rows(LLM_Q["q_langid_apply_artifact"](spark, sf_dir))
    assert cold == want and warm == want
    assert tokenizer.latest_version(art) == v  # served, not retrained
    meta = tokenizer.artifact_meta(art, v)
    assert meta["family"] == "langid" and meta["buckets"] == 1024


def test_prune_artifacts_keeps_serving_version(spark, tmp_path):
    """Version retention: prune_artifacts deletes superseded versions
    (and orphans) while the newest committed version keeps serving —
    the artifact store's growth is bounded like the incremental state
    it reuses."""
    art = str(tmp_path / "bpe")
    for i in range(3):
        tokenizer.save_artifact(spark, MERGES[: i + 1], art, "bpe")
    spark.createDataFrame(MERGES[:1], tokenizer.SCHEMAS["bpe"]).write.parquet(
        os.path.join(art, "v=9")
    )  # orphan
    deleted = tokenizer.prune_artifacts(art, keep_last=1)
    assert sorted(deleted) == [1, 2, 9]
    assert tokenizer.latest_version(art) == 3
    assert len(tokenizer.load_merges(spark, art, "bpe")) == 3
    with pytest.raises(ValueError, match="not committed"):
        tokenizer.load_artifact(spark, art, "bpe", version=1)


def test_stream_fed_census_retrain_equals_batch_training(spark, sf_dir, tmp_path):
    """The census state is STREAM-FED through incremental.apply_stream_batch
    (batch-id replay guard) and training from the drained state equals
    batch training over the same corpus — the q_bpe_retrain_incremental
    docstring's claim, pinned end to end with a replayed batch that must
    NOT double-count."""
    from pyspark.sql import functions as F

    from mongo_to_parquet_spark.operators import incremental
    from mongo_to_parquet_spark.queries.curation import (
        _bpe_census,
        _bpe_train_from_census,
        _bpe_train_merges,
    )
    from mongo_to_parquet_spark.sources.catalog import load_table

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "documents").select("doc_id", "text").repartition(
        3
    ).write.parquet(src)
    sd = str(tmp_path / "census_state")

    def spelled(df):
        return (
            df.select(F.explode(F.split("text", " ")).alias("w"))
            .filter(F.length("w") >= 2)
            .selectExpr(
                "array_join(transform(sequence(1, length(w)),"
                " i -> substring(w, i, 1)), '·') AS sym"
            )
        )

    def fold(batch_df, batch_id):
        incremental.apply_stream_batch(sd, spelled(batch_df), batch_id, ["sym"], [])

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", str(tmp_path / "ck")
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)
    # replay guard: re-applying an already-folded batch is a no-op
    last = incremental.last_batch_id(sd)
    some = spark.read.parquet(src).limit(5)
    assert incremental.apply_stream_batch(sd, spelled(some), last, ["sym"], []) is False

    st = incremental.read_agg_state(spark, sd)
    census = st.select("sym", F.col("n_rows").cast("long").alias("wc"))
    want_census = sorted(
        (r["sym"], r["wc"])
        for r in _bpe_census(spark, sf_dir).collect()
    )
    got_census = sorted((r["sym"], r["wc"]) for r in census.collect())
    assert got_census == want_census
    assert _bpe_train_from_census(census) == _bpe_train_merges(spark, sf_dir)


def test_tokenizer_eval_degenerate_corpora(spark, tmp_path):
    """q_tokenizer_eval on hostile corpora, query vs oracle: a language
    whose docs are token-less drops out of the report in BOTH engines;
    an entirely token-less corpus yields zero rows in both."""
    import duckdb

    from mongo_to_parquet_spark.queries.curation import ORACLE as CUR_O

    cases = {
        "empty_lang": (["abab abab", "", "  "], ["en", "zz", "zz"]),
        "tokenless": (["", "  ", ""], None),
        "single_char_words": (["a b c", "a a"], None),
    }
    for name, (texts, langs) in cases.items():
        d = str(tmp_path / name)
        os.makedirs(d)
        _corpus(d, texts, langs=langs)
        for fam in ("bpe", "wordpiece", "unigram"):
            shutil.rmtree(_tok_art_dir(d, fam), ignore_errors=True)
        got = _rows(QS["q_tokenizer_eval"](spark, d))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.execute(CUR_O["q_tokenizer_eval"]).fetchall()
        )
        assert got == want, name
        if name == "tokenless":
            assert got == []
        if name == "empty_lang":
            assert all(r[1] == "en" for r in got), name  # zz absent


def test_dsir_artifact_serves_without_retraining(spark, sf_dir):
    """The DSIR integer-stats artifact serves identically to the inline
    train+select; a warm store is not retrained, and the stored table is
    pure integers (no float crosses the store)."""
    art = tokenizer.artifact_dir(sf_dir, "dsir")
    shutil.rmtree(art, ignore_errors=True)
    want = _rows(QS["q_select_dsir"](spark, sf_dir))
    cold = _rows(QS["q_dsir_apply_artifact"](spark, sf_dir))
    v = tokenizer.latest_version(art)
    warm = _rows(QS["q_dsir_apply_artifact"](spark, sf_dir))
    assert cold == want and warm == want
    assert tokenizer.latest_version(art) == v
    stored = tokenizer.load_artifact(spark, art, "dsir")
    assert all(t == "bigint" for _, t in stored.dtypes)


def test_logprob_and_oov_artifacts_serve_without_retraining(spark, sf_dir):
    """Round-10 (verdict r9 #1): the unigram-freq and top-k-vocab
    artifacts serve identically to the inline train+score keys; a warm
    store is not retrained, and both stored tables are (string, bigint)
    — no float crosses either store."""
    from mongo_to_parquet_spark.queries import llm

    for fam, inline_key, serve_key in (
        ("unigram_freq", "q_text_logprob", "q_logprob_apply_artifact"),
        ("oov_vocab", "q_text_oov", "q_oov_apply_artifact"),
    ):
        art = tokenizer.artifact_dir(sf_dir, fam)
        shutil.rmtree(art, ignore_errors=True)
        want = _rows(llm.QUERIES[inline_key](spark, sf_dir))
        cold = _rows(llm.QUERIES[serve_key](spark, sf_dir))
        v = tokenizer.latest_version(art)
        warm = _rows(llm.QUERIES[serve_key](spark, sf_dir))
        assert cold == want and warm == want, fam
        assert tokenizer.latest_version(art) == v, fam
        stored = tokenizer.load_artifact(spark, art, fam)
        assert [t for _, t in stored.dtypes] == ["string", "bigint"], fam


def test_kmeans_artifact_serves_without_retraining(spark, sf_dir):
    """The stored k×d centroid table reproduces the trainer's final
    assignment report exactly, and serving from a warm store runs no
    training round (version is stable)."""
    art = tokenizer.artifact_dir(sf_dir, "kmeans")
    shutil.rmtree(art, ignore_errors=True)
    want = _rows(QS["q_embed_kmeans"](spark, sf_dir))
    cold = _rows(QS["q_kmeans_apply_artifact"](spark, sf_dir))
    v = tokenizer.latest_version(art)
    warm = _rows(QS["q_kmeans_apply_artifact"](spark, sf_dir))
    assert cold == want and warm == want
    assert tokenizer.latest_version(art) == v
    # k=4 clusters × 64 dims — the bounded-driver-pick contract
    assert tokenizer.load_artifact(spark, art, "kmeans").count() == 4 * 64


def test_pca_artifact_projection_matches_component(spark, sf_dir):
    """The stored component IS q_embed_pca's declared output, and the
    served projection equals a from-scratch projection onto that same
    component (store round-trip is bit-exact for the rounded doubles)."""
    from pyspark.sql import functions as F

    from mongo_to_parquet_spark.queries import retrieval
    from mongo_to_parquet_spark.sources.catalog import load_table

    art = tokenizer.artifact_dir(sf_dir, "pca")
    shutil.rmtree(art, ignore_errors=True)
    comp_rows = _rows(retrieval.QUERIES["q_embed_pca"](spark, sf_dir))
    served = _rows(retrieval.QUERIES["q_pca_apply_artifact"](spark, sf_dir))
    stored = _rows(tokenizer.load_artifact(spark, art, "pca"))
    assert stored == comp_rows  # artifact == the declared component table
    comp = {pos: c for pos, c, _ in comp_rows}
    dims = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    )
    lit_comp = spark.createDataFrame(
        [(p, c) for p, c in comp.items()], "pos int, component double"
    )
    want = _rows(
        dims.join(F.broadcast(lit_comp), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(
                    (F.col("val") * F.col("component")).cast("decimal(38,18)")
                ).cast("double"),
                4,
            ).alias("pca_score")
        )
    )
    assert served == want
