"""Skew utilities, bucketed co-located joins, MultiSink fan-out, text ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beast_spark.functions.text import bpe_token_count, detect_lang
from beast_spark.operators.skew import salted_join, two_stage_agg
from beast_spark.sources.bucketing import assert_no_shuffle_join, write_bucketed
from beast_spark.streaming.ingest import ProtoIngest
from beast_spark.streaming.sink import MultiException, MultiSink, WarehouseSink
from tests.fixtures import KAFKA_DDL, TEST_SCHEMA, kafka_rows


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 10000).withColumn("k", (F.col("id") % 3).cast("int"))
    small = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k int, tag string")
    plain = big.join(small, "k").groupBy("tag").count()
    salted = salted_join(big, small, "k").groupBy("tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right_and_full(spark):
    """right/full would emit unmatched small-side keys salt× (ADVICE r1)."""
    big = spark.range(0, 10).withColumn("k", F.col("id").cast("int"))
    small = spark.createDataFrame([(0, "x")], "k int, tag string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_join(big, small, "k", how=how)


def test_salted_left_join_keeps_unmatched_big_rows(spark):
    big = spark.createDataFrame([(0,), (1,), (7,)], "k int")
    small = spark.createDataFrame([(0, "x"), (1, "y")], "k int, tag string")
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", how="left")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_winnow_short_doc_yields_empty_fingerprints(spark):
    """size(hashes) < window must give [] — not a negative-sequence error."""
    from beast_spark.functions.text import shingle_hashes, tokens, winnow_from_hashes

    df = (
        spark.createDataFrame(
            [(1, "only three words here"), (2, "a much longer document " * 5)],
            "id int, text string",
        )
        .withColumn("toks", tokens("text"))
        .withColumn("hashes", shingle_hashes(F.col("toks"), n=4))
        .withColumn("fp", winnow_from_hashes(F.col("hashes"), window=4))
    )
    rows = {r.id: r.fp for r in df.collect()}
    assert rows[1] == []
    assert len(rows[2]) > 0


def test_two_stage_agg_matches_plain(spark):
    df = spark.range(0, 5000).withColumn("k", (F.col("id") % 4).cast("int"))
    plain = df.groupBy("k").agg(F.sum("id").alias("total"), F.count(F.lit(1)).alias("n"))
    staged = two_stage_agg(
        df,
        ["k"],
        partial_aggs=[F.sum("id").alias("s"), F.count(F.lit(1)).alias("c")],
        final_aggs=[F.sum("s").alias("total"), F.sum("c").cast("long").alias("n")],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, staged.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/bkt'")
        spark.catalog.setCurrentDatabase("bkt")
        a = spark.range(0, 10000).withColumn("v", F.col("id") * 2)
        b = spark.range(0, 10000).withColumn("w", F.col("id") * 3)
        write_bucketed(a, "bkt.ta", "id", n_buckets=8)
        write_bucketed(b, "bkt.tb", "id", n_buckets=8)
        joined = spark.table("bkt.ta").join(spark.table("bkt.tb"), "id")
        assert_no_shuffle_join(spark, joined)  # co-located: zero Exchange
        assert joined.count() == 10000
        # negative control: a non-bucketed side must shuffle
        plain = spark.table("bkt.ta").join(spark.range(0, 10000), "id")
        with pytest.raises(AssertionError):
            assert_no_shuffle_join(spark, plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt.ta")
        spark.sql("DROP TABLE IF EXISTS bkt.tb")
        spark.catalog.setCurrentDatabase("default")


def test_multisink_fanout_and_error_collection(spark, tmp_path):
    df = spark.createDataFrame(kafka_rows(3), KAFKA_DDL)
    valid, invalid = ProtoIngest(TEST_SCHEMA).apply(df)
    s1 = WarehouseSink(table_path=str(tmp_path / "wh1"), dlq_path=str(tmp_path / "dlq1"))
    s2 = WarehouseSink(table_path=str(tmp_path / "wh2"), dlq_path=str(tmp_path / "dlq2"))
    MultiSink([s1, s2]).push(valid, invalid)
    assert spark.read.parquet(str(tmp_path / "wh1")).count() == 3
    assert spark.read.parquet(str(tmp_path / "wh2")).count() == 3

    class Exploding(WarehouseSink):
        def _write_valid(self, df):
            raise IOError("sink down")

    from beast_spark.config import RetrySettings

    fast = RetrySettings(max_push_attempts=1, backoff_initial_ms=1)
    bad = Exploding(table_path=str(tmp_path / "whx"), retry=fast)
    ok = WarehouseSink(table_path=str(tmp_path / "wh3"))
    with pytest.raises(MultiException):
        MultiSink([bad, ok]).push(valid)
    # surviving sink still received the batch (all sinks attempted)
    assert spark.read.parquet(str(tmp_path / "wh3")).count() == 3


def test_detect_lang_on_constructed_samples(spark):
    rows = [
        (1, "the cat sat on the mat and it was happy with this"),
        (2, "el perro y el gato en la casa de los abuelos son felices"),
        (3, "le chien et le chat sont dans la maison pour la nuit"),
        (4, "der hund und die katze sind nicht in dem haus mit der maus"),
        (5, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r.lang for r in df.select("id", detect_lang("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und"}


def test_bpe_token_count(spark):
    df = spark.createDataFrame([(1, "hello world42 foo-bar!")], "id int, text string")
    # tokens: hello | world | 42 | foo | - | bar | !  → 7
    assert df.select(bpe_token_count("text").alias("n")).first().n == 7


def test_stratified_threshold_matches_rank_and_is_bucket_invariant(spark, sf_dir):
    """Quantile-threshold stratified sampling (VERDICT r3 #5): the
    threshold cut must select the EXACT set the full-stratum rank window
    selects, for any bucket granularity — bucket_bits=1 makes nearly the
    whole stratum the boundary bucket (degenerates toward the rank
    formulation), 12 gives 4096 buckets (the scale shape where only
    ~1/4096 of a stratum is ever sorted)."""
    from pyspark.sql.window import Window

    from beast_spark.functions.hashing import md5_long
    from beast_spark.operators.sampling import stratified_sample_threshold
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id")
    h = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":samp")))

    w_rank = Window.partitionBy("lang").orderBy("_h", "doc_id")
    w_all = Window.partitionBy("lang")
    ranked = (
        d.withColumn("_h", h)
        .select(
            "lang",
            "doc_id",
            F.row_number().over(w_rank).alias("rk"),
            F.count(F.lit(1)).over(w_all).alias("n"),
        )
        .filter(F.col("rk") <= F.ceil(F.col("n") * 0.1))
    )
    expect = {(r.lang, r.doc_id) for r in ranked.collect()}
    assert expect  # non-degenerate probe

    for bits in (1, 4, 12):
        picked = stratified_sample_threshold(
            d, "lang", "doc_id", h, frac=0.1, bucket_bits=bits
        )
        got = {(r.lang, r.doc_id) for r in picked.collect()}
        assert got == expect, f"bucket_bits={bits} selected a different set"


def test_sequence_packing_shard_count_invariants(spark, sf_dir):
    """VERDICT r3 #6: n_shards is a parameter (each shard sorts
    1/n_shards of the corpus). Global accounting — total docs and total
    token mass — must be IDENTICAL for any shard count; within each run
    the per-shard pack layout must be internally consistent (contiguous
    pack ids; straddles bounded by the shard's internal chunk
    boundaries)."""
    from collections import defaultdict

    from beast_spark.queries.datapipe import sequence_packing
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    totals = set()
    for shards in (1, 4, 16):
        rows = sequence_packing(d, "doc_id", "text", seq_len=2048, n_shards=shards).collect()
        totals.add((sum(r.n_docs for r in rows), sum(r.pack_tokens for r in rows)))
        per_shard = defaultdict(list)
        for r in rows:
            per_shard[r.shard].append(r)
        assert set(per_shard) <= set(range(shards))
        for shard_rows in per_shard.values():
            pack_ids = sorted(r.pack_id for r in shard_rows)
            # every pack a doc STARTS in; contiguous from 0 (a doc starts in
            # pack p only after packs 0..p-1 were filled by earlier docs)
            assert pack_ids == list(range(len(pack_ids)))
            shard_tokens = sum(r.pack_tokens for r in shard_rows)
            n_boundaries = max(0, (shard_tokens - 1)) // 2048
            assert sum(r.n_straddle for r in shard_rows) <= n_boundaries
    assert len(totals) == 1  # doc/token totals are shard-count invariant
