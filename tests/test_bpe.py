"""BPE trainer + distributed apply (datapipe/bpe.py): the classic
Sennrich merge sequence, python/Spark/DuckDB three-way segmentation
parity, Spark-trained round trip, and the document tokenizer twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import bpe
from sjot_spark.datapipe.tokenize import pretokenize


def test_sennrich_merge_sequence():
    """The canonical subword-nmt example: counts {low:5, lower:2,
    newest:6, widest:3} must learn (e,s), (es,t), (l,o), (lo,w) —
    hand-derivable pair counts with the documented tie-break."""
    m = bpe.train_merges_from_counts(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    assert m == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    assert bpe.segment_py("lowest", m) == ["low", "est"]


def test_trainer_determinism_and_stop():
    counts = {"ab": 3, "ba": 3, "abab": 1}
    # tie between several count-3 pairs -> lexicographically smallest
    m = bpe.train_merges_from_counts(counts, 10, min_pair_count=2)
    assert m[0] == ("a", "b")
    # min_pair_count stops the loop before n_merges is exhausted
    assert len(m) < 10
    assert m == bpe.train_merges_from_counts(counts, 10, min_pair_count=2)


def test_segment_three_way_parity(spark):
    """python, Spark Column expression, and DuckDB SQL segment
    byte-identically — the property the contract oracle rests on."""
    merges = bpe.default_merges()
    words = [" the", "the", " of", " tokenization", "don't", "'s",
             " 12345", "aaaaa", " aaaaaaaaab", "x", " !!??", " héllo",
             "mixedCASE", " ing", "running", " And", "THE"]
    py = {w: bpe.segment_py(w, merges) for w in words}

    sdf = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = {
        r.w: list(r.toks)
        for r in sdf.select(
            "w", bpe.bpe_segment_expr(F.col("w"), merges).alias("toks")
        ).collect()
    }
    assert got_spark == py

    con = duckdb.connect()
    con.execute("create table w(w varchar)")
    con.executemany("insert into w values (?)", [(w,) for w in words])
    got_duck = {
        w: toks
        for w, toks in con.execute(
            f"select w, {bpe.segment_sql('w', merges)} from w").fetchall()
    }
    assert got_duck == py


def test_spark_trained_round_trip(spark):
    """Train on real documents via the Spark pair-count path; every
    pre-token's segmentation must concatenate back to the Ġ-mapped
    pre-token (BPE never loses or invents characters)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe.train_bpe(docs, n_merges=60, max_word_types=5000,
                           min_count=1)
    assert len(merges) > 10  # real corpus yields a real merge table

    clean = F.replace(F.col("text"), F.lit(bpe.SEP), F.lit(""))
    pre = docs.select(F.explode(pretokenize(clean)).alias("w")).distinct()
    seg = pre.select(
        "w", bpe.bpe_segment_expr(F.col("w"), merges).alias("toks"))
    bad = seg.where(
        F.array_join("toks", "")
        != F.replace(F.col("w"), F.lit(" "), F.lit(bpe.SPACE_MARK))
    ).count()
    assert bad == 0
    # and merges actually compress: tokens < characters overall
    tot = seg.select(
        F.sum(F.size("toks")).alias("t"),
        F.sum(F.length("w")).alias("c")).collect()[0]
    assert tot.t < tot.c


def test_tokenize_documents_bpe_shape_and_order(spark):
    """The document tokenizer twin: input_hint schema, in-document
    token order preserved, vocab ids for in-vocab tokens and offset
    md5 ids for OOV (the two id spaces never collide)."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_merges_from_counts(counts, 4)
    vocab = bpe.vocab_from_merges(counts, merges)
    df = spark.createDataFrame(
        [("d1", "lowest newest", "s1"), ("d2", "zzz low", "s1"),
         ("d3", "", "s2")],
        "doc_id string, text string, source string")
    out = bpe.tokenize_documents_bpe(df, merges, vocab=vocab)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "tokens", "n_tok", "source"]
    rows = {r.doc_id: r for r in out.collect()}
    vid = {s: i for i, s in enumerate(vocab)}
    # d1: 'lowest' -> low est ; ' newest' -> Ġ n ew est (order matters)
    d1 = rows["d1"]
    assert d1.tokens[:2] == [vid["low"], vid["est"]]
    assert len(d1.tokens) == d1.n_tok
    # every d1 token is in-vocab except the Ġ/n/ew pieces that are in
    # vocab too only if trained; OOV ids sit past len(vocab)
    assert all(t >= 0 for t in d1.tokens)
    d2 = rows["d2"]  # 'zzz' is all-OOV single chars -> ids >= len(vocab)
    assert any(t >= len(vocab) for t in d2.tokens)
    assert rows["d3"].n_tok == 0 and rows["d3"].tokens == []


def test_pathological_run_is_engine_consistent():
    """Beyond the 8-pass fixpoint bound all implementations still
    agree with each other (same passes); pin that with a 200-char run."""
    merges = [("a", "a")]
    w = "a" * 200
    py = bpe.segment_py(w, merges)
    con = duckdb.connect()
    got = con.execute(
        f"select {bpe.segment_sql(bpe._sql_quote(w), merges)}"
    ).fetchone()[0]
    assert got == py
    assert "".join(py) == w
