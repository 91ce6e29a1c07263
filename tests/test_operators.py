"""Unit tests for custom operators: as-of join, multimodal plumbing."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from beast_spark.operators.asof import asof_join
from beast_spark.operators.multimodal import attach_media_meta, decode_features, sample_frames


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(15), "c"), (3, _ts(1), "d")],
        "uid long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(18), 200.0), (2, _ts(1), 300.0), (4, _ts(0), 999.0)],
        "uid long, ts timestamp, val double",
    )
    out = asof_join(left, right, on="uid", left_ts="ts", right_ts="ts", right_cols=["ts", "val"])
    rows = {r.ev: (r.ts_right, r.val_right) for r in out.collect()}
    assert rows["a"] == (_ts(5), 100.0)
    assert rows["b"] == (_ts(18), 200.0)
    assert rows["c"] == (_ts(1), 300.0)
    assert rows["d"] == (None, None)  # no right row precedes → NULLs (left join)
    assert out.count() == 4


def test_asof_join_inclusive_tie(spark):
    """Equal timestamps match (DuckDB ASOF l.ts >= r.ts semantics)."""
    left = spark.createDataFrame([(1, _ts(10), "x")], "uid long, ts timestamp, ev string")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "uid long, ts timestamp, val double")
    out = asof_join(left, right, on="uid", left_ts="ts", right_ts="ts", right_cols=["val"])
    assert out.first().val_right == 7.0


def test_media_meta_and_features(spark):
    df = spark.createDataFrame(
        [(1, b"hello world"), (2, b"hello world"), (3, b"other"), (4, None)],
        "media_id long, content binary",
    )
    meta = attach_media_meta(df)
    rows = {r.media_id: r for r in meta.collect()}
    assert rows[1].content_len == 11
    assert rows[1].content_sha == rows[2].content_sha  # exact media dedup key
    assert rows[1].content_sha != rows[3].content_sha

    feats = decode_features(meta, dims=8)
    frows = {r.media_id: r.features for r in feats.collect()}
    assert frows[1] == frows[2]  # deterministic fake codec
    assert frows[1] != frows[3]
    assert len(frows[1]) == 8
    assert frows[4] is None  # null passthrough

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_features(df, strict=True).collect()


def test_ppm_codec_roundtrip_and_header_tolerance():
    """Real netpbm codec: encode→decode identity; spec-mandated comment
    and whitespace tolerance; malformed input rejection."""
    from beast_spark.operators.multimodal import decode_image, encode_ppm

    px = bytes(range(48))  # 4x4 RGB
    raw = encode_ppm(4, 4, px, channels=3)
    assert decode_image(raw) == (3, 4, 4, px)
    gray = encode_ppm(8, 2, bytes(range(16)))
    assert decode_image(gray) == (1, 8, 2, bytes(range(16)))
    # comments + arbitrary whitespace in header (netpbm spec)
    commented = b"P5 # a comment\n# another\n  8\t2 # dims\n255\n" + bytes(range(16))
    assert decode_image(commented) == (1, 8, 2, bytes(range(16)))
    import pytest as _pytest

    for bad in (b"JFIF....", b"P5\n4 4\n65535\n" + bytes(32), b"P6\n4 4\n255\n" + bytes(3)):
        with _pytest.raises(ValueError):
            decode_image(bad)


def test_resize_image_nearest_exact_grid():
    from beast_spark.operators.multimodal import decode_image, encode_ppm, resize_image_nearest

    # 4x4 gradient -> 2x2 picks pixels (0,0),(2,0),(0,2),(2,2)
    src = encode_ppm(4, 4, bytes(range(16)))
    _, w, h, px = decode_image(resize_image_nearest(src, 2, 2))
    assert (w, h) == (2, 2) and list(px) == [0, 2, 8, 10]
    # upscale replicates source pixels
    small = encode_ppm(2, 1, bytes([7, 9]))
    _, w, h, px = decode_image(resize_image_nearest(small, 4, 1))
    assert list(px) == [7, 7, 9, 9]


def test_bmp_codec_roundtrip_padding_and_row_order():
    """Real BMP codec: encode→decode identity through the bottom-up/BGR/
    4-byte-pad on-disk layout; top-down (negative height) variant; and
    rejection of non-24bpp / compressed / truncated files."""
    import struct

    from beast_spark.operators.multimodal import decode_bmp, decode_image, encode_bmp

    # 3x2 RGB with distinct bytes — row length 9 forces a real 3-byte pad
    px = bytes(range(18))
    raw = encode_bmp(3, 2, px)
    assert decode_image(raw) == (3, 3, 2, px)  # dispatches on "BM" magic
    stride = 12  # (9 + 3) & ~3
    assert len(raw) == 54 + stride * 2
    # on-disk raster: LAST pixel row first (bottom-up), BGR within pixels
    assert raw[54:57] == bytes([11, 10, 9])  # px row 1 (y=1) first pixel, B,G,R
    assert raw[54 + stride : 54 + stride + 3] == bytes([2, 1, 0])

    # top-down variant (negative height) decodes to the same pixels
    top_down = bytearray(raw)
    struct.pack_into("<i", top_down, 22, -2)
    rows = [raw[54 + stride : 54 + stride + 9], raw[54 : 54 + 9]]  # swap rows
    top_down[54 : 54 + 9] = rows[0]
    top_down[54 + stride : 54 + stride + 9] = rows[1]
    assert decode_bmp(bytes(top_down)) == (3, 3, 2, px)

    import pytest as _pytest

    bad_bpp = bytearray(raw)
    struct.pack_into("<H", bad_bpp, 28, 8)
    compressed = bytearray(raw)
    struct.pack_into("<I", compressed, 30, 1)  # BI_RLE8
    for bad in (b"BMxx", bytes(bad_bpp), bytes(compressed), raw[:-4]):
        with _pytest.raises(ValueError):
            decode_bmp(bad)


def test_resize_preserves_bmp_format():
    from beast_spark.operators.multimodal import decode_image, encode_bmp, resize_image_nearest

    src = encode_bmp(4, 4, bytes(range(48)))
    out = resize_image_nearest(src, 2, 2)
    assert out[:2] == b"BM"  # BMP in → BMP out
    channels, w, h, px = decode_image(out)
    # picks source pixels (0,0),(2,0),(0,2),(2,2) → byte offsets 0,6,24,30
    assert (channels, w, h) == (3, 2, 2)
    assert list(px) == list(bytes(range(48))[0:3] + bytes(range(48))[6:9]
                            + bytes(range(48))[24:27] + bytes(range(48))[30:33])


def test_media_codec_roundtrip_properties():
    """Property-based: encode→decode is the identity for ALL dims/content
    on every real codec (netpbm, BMP incl. pad widths, WAV incl. multi-
    channel) — the hypothesis sweep covers the stride/pad edge cases a
    hand-picked geometry can miss."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from beast_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9), st.integers(1, 3), st.data())
    def roundtrip_images(w, h, ch, data):
        if ch == 2:
            ch = 1  # netpbm/BMP are 1- or 3-channel
        px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch)))
        assert decode_image(encode_ppm(w, h, px, channels=ch)) == (ch, w, h, px)
        if ch == 3:
            assert decode_bmp(encode_bmp(w, h, px)) == (3, w, h, px)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 3), st.integers(1, 40), st.data())
    def roundtrip_wav(ch, frames, data):
        n = ch * frames
        s = data.draw(st.lists(st.integers(-32768, 32767), min_size=n, max_size=n))
        assert decode_wav(encode_wav(8000, ch, s)) == (ch, 8000, frames, s)

    roundtrip_images()
    roundtrip_wav()


def test_wav_codec_roundtrip_chunk_walk_and_rejection():
    """Real WAV codec: encode→decode identity; RIFF chunk-walk tolerance
    (extra LIST chunk, odd-size padding); non-PCM/truncated rejection."""
    import struct

    from beast_spark.operators.multimodal import decode_wav, encode_wav

    samples = [0, 1000, -1000, 32767, -32768, 5]
    raw = encode_wav(8000, 2, samples)
    assert decode_wav(raw) == (2, 8000, 3, samples)

    # insert an odd-size LIST chunk between fmt and data (spec: pad to even)
    fmt_end = raw.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    tolerant = raw[:fmt_end] + extra + raw[fmt_end:]
    tolerant = tolerant[:4] + struct.pack("<I", len(tolerant) - 8) + tolerant[8:]
    assert decode_wav(tolerant) == (2, 8000, 3, samples)

    import pytest as _pytest

    float_fmt = bytearray(raw)
    struct.pack_into("<H", float_fmt, raw.index(b"fmt ") + 8, 3)  # IEEE float
    for bad in (b"RIFFxxxx", b"OggS....", bytes(float_fmt), raw[:-3]):
        with _pytest.raises(ValueError):
            decode_wav(bad)


def test_audio_stats_real_path_and_strict(spark):
    """WAV content takes the REAL codec path under strict; non-audio
    content yields NULL stats non-strict / raises strict."""
    from beast_spark.operators.multimodal import audio_stats, encode_wav

    wav = encode_wav(1000, 1, [100, -200, 300, 0])
    df = spark.createDataFrame(
        [(1, wav), (2, b"not audio"), (3, None)], "media_id long, content binary"
    )
    rows = {r.media_id: r for r in audio_stats(df).collect()}
    r = rows[1]
    assert (r.channels, r.sample_rate, r.n_frames, r.duration_ms) == (1, 1000, 4, 4.0)
    assert (r.peak, r.sum_sq, r.first_s, r.last_s) == (300, 100 * 100 + 200 * 200 + 300 * 300, 100, 0)
    assert r.zero_cross == 2  # 100→-200 and -200→300 flip sign; 300→0 does not
    assert rows[2].peak is None and rows[3].peak is None

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        audio_stats(df, strict=True).collect()


def test_decode_features_real_path_for_netpbm(spark):
    """netpbm content must take the REAL codec path even under strict,
    and emit decoded-pixel stats, not fake sha256 features."""
    from beast_spark.operators.multimodal import decode_features, encode_ppm

    img = encode_ppm(2, 2, bytes([10, 20, 30, 40]))
    df = spark.createDataFrame([(1, img), (2, None)], "media_id long, content binary")
    rows = {r.media_id: r.features for r in decode_features(df, dims=8, strict=True).collect()}
    assert rows[1] == [1.0, 2.0, 2.0, 25.0, 10.0, 40.0, 10.0, 40.0]
    assert rows[2] is None  # null passthrough


def test_resize_media_real_codec_for_netpbm(spark):
    from beast_spark.operators.multimodal import decode_image, encode_ppm, resize_media

    img = encode_ppm(4, 4, bytes(range(16)))
    df = spark.createDataFrame([(1, img)], "media_id long, content binary")
    out = resize_media(df, target_w=2, target_h=2, strict=True).collect()[0]
    channels, w, h, px = decode_image(bytes(out.resized))
    assert (channels, w, h) == (1, 2, 2) and list(px) == [0, 2, 8, 10]


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, bytes(range(100)))], "media_id long, content binary")
    frames = sample_frames(df, n_frames=4)
    rows = frames.orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2, 3]
    assert all(len(r.frame_bytes) == 25 for r in rows)
    assert rows[0].frame_bytes == bytes(range(25))
    assert rows[3].frame_bytes == bytes(range(75, 100))


def test_exact_percentiles_matches_builtin(spark, sf_dir):
    """Counts-based distributed percentiles == percentile() to 1e-9
    (same ANSI interpolation), including duplicate-heavy columns."""
    from pyspark.sql import functions as F

    from beast_spark.operators.percentiles import exact_percentiles
    from beast_spark.sources.tables import load_table

    l = load_table(spark, sf_dir, "lineitem")
    mine = {
        r.l_returnflag: (r.p25, r.p50, r.p99)
        for r in exact_percentiles(
            l, ["l_returnflag"], "l_quantity", {"p25": 0.25, "p50": 0.5, "p99": 0.99}
        ).collect()
    }
    ref = {
        r.l_returnflag: (r.p25, r.p50, r.p99)
        for r in l.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("p25"),
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert mine.keys() == ref.keys()
    for k in mine:
        for a, b in zip(mine[k], ref[k]):
            assert abs(a - b) < 1e-9


def test_multiprobe_lsh_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe must (a) be a superset of single-probe's candidates,
    (b) recall at least as many of the exact top-10 (q38 ground truth),
    and here strictly more — the corpus is small enough that bit-flip
    probes matter."""
    from beast_spark.operators.similarity import (
        brute_force_topk,
        hyperplanes_md5,
        lsh_topk,
    )
    from beast_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    planes = hyperplanes_md5(64, 6)
    exact = {r.vec_id for r in brute_force_topk(e, q, k=10).collect()}
    single = {r.vec_id for r in lsh_topk(e, q, dims=64, k=500, planes=planes).collect()}
    multi = {
        r.vec_id
        for r in lsh_topk(e, q, dims=64, k=500, planes=planes, probes=7).collect()
    }
    assert single <= multi
    assert len(exact & multi) >= len(exact & single)
    assert len(multi) > len(single)


def test_lsh_neardup_pairs_subset_of_exact_with_equal_scores(spark, sf_dir):
    """Bucketed near-dup pairs must be a SUBSET of the exact all-pairs
    result (same threshold), with identical cos_sim for every pair it
    reports — LSH may lose recall, never invent or mis-score a pair."""
    from beast_spark.functions.vectors import dot, norm
    from beast_spark.operators.similarity import hyperplanes_md5, lsh_neardup_pairs
    from beast_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.vec1, r.vec2): r.cos_sim
        for r in lsh_neardup_pairs(
            e, dims=64, threshold=0.3, planes=hyperplanes_md5(64, 4)
        ).collect()
    }
    assert got, "threshold 0.3 over 16 buckets must produce pairs on this corpus"
    a = e.select(F.col("vec_id").alias("vec1"), F.col("embedding").alias("v1"),
                 norm(F.col("embedding")).alias("n1"))
    b = e.select(F.col("vec_id").alias("vec2"), F.col("embedding").alias("v2"),
                 norm(F.col("embedding")).alias("n2"))
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    exact = {
        (r.vec1, r.vec2): r.cos_sim
        for r in a.join(F.broadcast(b), F.col("vec1") < F.col("vec2"))
        .select("vec1", "vec2", (F.floor(cos * 1e6 + F.lit(0.5)) / 1e6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.3)
        .collect()
    }
    for p, c in got.items():
        assert p in exact and exact[p] == c


def test_minhash_lsh_recall_and_estimate_bound_vs_exact(spark, sf_dir):
    """Quality invariants of the LSH approximation against exact ground
    truth (q35's jaccard_pairs): strong near-dups (exact J >= 0.5) must
    be recalled by the banding, and for every reported pair the MinHash
    estimate must be within 0.3 of the exact Jaccard (k=16 -> sd of the
    estimate is sqrt(J(1-J)/16) <= 0.125; 0.3 ~ 2.4 sigma, deterministic
    for this fixed corpus)."""
    from beast_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc1, r.doc2): r.jaccard
        for r in jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    got = {
        (r.doc1, r.doc2): r.est_jaccard
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", k=16, bands=8, threshold=0.2, hash_family="md5"
        ).collect()
    }
    strong = {p for p, j in exact.items() if j >= 0.5}
    assert strong, "fixture corpus must contain strong near-dups"
    missed = strong - set(got)
    assert not missed, f"LSH missed strong pairs: {missed}"
    for p, est in got.items():
        assert abs(est - exact.get(p, 0.0)) <= 0.3, (p, est, exact.get(p))
    # both hash families report the same STRONG pairs (family-agnostic op)
    got_xxh = {
        (r.doc1, r.doc2)
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", k=16, bands=8, threshold=0.2, hash_family="xxh"
        ).collect()
    }
    assert strong <= got_xxh


def test_exact_percentiles_ignores_nulls(spark):
    """NULL values must not enter n or the rank math — same as
    percentile() / quantile_cont (ADVICE r1: NULL group inflated n)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.percentiles import exact_percentiles

    df = spark.createDataFrame(
        [("a", v) for v in [1.0, None, 2.0, None, 3.0, 4.0]], "k string, v double"
    )
    got = exact_percentiles(df, ["k"], "v", {"p50": 0.5}).collect()[0].p50
    ref = df.groupBy("k").agg(F.expr("percentile(v, 0.5)").alias("p")).collect()[0].p
    assert abs(got - ref) < 1e-9 and abs(got - 2.5) < 1e-9


def test_exact_percentiles_all_null_group_surfaces_null(spark):
    """A group whose values are ALL NULL must appear with a NULL
    percentile — same row set as percentile()/quantile_cont (ADVICE r2:
    the NULL filter silently dropped such groups)."""
    from beast_spark.operators.percentiles import exact_percentiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)], "k string, v double"
    )
    rows = {r.k: r.p50 for r in exact_percentiles(df, ["k"], "v", {"p50": 0.5}).collect()}
    assert rows == {"a": 2.0, "b": None}


def test_exact_percentiles_null_key_group_keeps_value(spark):
    """groupBy groups NULL keys; percentile() returns a value for the
    NULL-key group. The all-NULL-group key join must be null-safe or the
    NULL-keyed group's computed percentile silently becomes NULL
    (ADVICE r3: eqNullSafe)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.percentiles import exact_percentiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0), (None, 30.0)],
        "k string, v double",
    )
    rows = {r.k: r.p50 for r in exact_percentiles(df, ["k"], "v", {"p50": 0.5}).collect()}
    ref = {
        r.k: r.p
        for r in df.groupBy("k").agg(F.expr("percentile(v, 0.5)").alias("p")).collect()
    }
    assert rows == ref == {"a": 2.0, None: 20.0}


def test_incremental_minhash_equals_full_recompute(spark, sf_dir):
    """Incremental dedup exactness: for an 80/20 corpus split,
    pairs(full) == pairs(existing 80) ∪ incremental(20 vs 80) — the
    nightly-append contract that lets a 100 TB corpus keep a signature
    table instead of re-shingling everything."""
    from pyspark.sql import functions as F

    from beast_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 5 == 0)
    kw = dict(k=16, bands=8, threshold=0.2, hash_family="md5")

    def pairset(df_pairs):
        return {(r.doc1, r.doc2, r.est_jaccard) for r in df_pairs.collect()}

    full = pairset(minhash_lsh_pairs(d, "doc_id", "text", **kw))
    existing = pairset(minhash_lsh_pairs(old, "doc_id", "text", **kw))
    old_sigs = minhash_signatures(old, "doc_id", "text", k=16, hash_family="md5")
    new_sigs, inc = incremental_minhash_pairs(old_sigs, new, "doc_id", "text", **kw)
    assert existing | pairset(inc) == full
    assert existing.isdisjoint(pairset(inc))  # no re-found old pairs
    # returned signatures are exactly the increment's (union-ready)
    assert new_sigs.count() == minhash_signatures(
        new, "doc_id", "text", k=16, hash_family="md5"
    ).count()


def test_indexed_incremental_equals_full_and_never_shuffles_corpus(spark, sf_dir, tmp_path):
    """The persisted band/bucket index path (VERDICT r3 #1): same pair
    set as the re-banding incremental path AND the full recompute
    restricted to new-doc pairs — while the corpus side (the bucketed
    index scan → semi-join filter → per-bucket aggregation) runs with
    ZERO shuffle Exchange, so an append costs O(increment) not
    O(corpus)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.dedup import (
        band_signatures,
        existing_bucket_docs,
        incremental_minhash_pairs,
        incremental_minhash_pairs_indexed,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from beast_spark.sources.bucketing import write_bucketed
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 5 == 0)
    kw = dict(k=16, bands=8, threshold=0.2, hash_family="md5")

    old_sigs = minhash_signatures(old, "doc_id", "text", k=16, hash_family="md5")
    spark.sql("DROP TABLE IF EXISTS beast_test_lsh_index")
    write_bucketed(
        band_signatures(old_sigs, k=16, bands=8, hash_family="md5"),
        "beast_test_lsh_index",
        ["band", "bucket"],
        n_buckets=8,
        path=str(tmp_path / "index"),
    )
    index = spark.table("beast_test_lsh_index")

    def pairset(df_pairs):
        return {(r.doc1, r.doc2, r.est_jaccard) for r in df_pairs.collect()}

    new_sigs, new_bands, inc_idx = incremental_minhash_pairs_indexed(
        index, old_sigs, new, "doc_id", "text", **kw
    )
    _, inc_rebanded = incremental_minhash_pairs(old_sigs, new, "doc_id", "text", **kw)
    assert pairset(inc_idx) == pairset(inc_rebanded)

    full = pairset(minhash_lsh_pairs(d, "doc_id", "text", **kw))
    existing = pairset(minhash_lsh_pairs(old, "doc_id", "text", **kw))
    assert existing | pairset(inc_idx) == full
    assert existing.isdisjoint(pairset(inc_idx))

    # returned bands are union-ready: appending them to the index makes
    # the NEXT increment see exactly the banding a full rebuild would
    rebuilt = band_signatures(
        minhash_signatures(d, "doc_id", "text", k=16, hash_family="md5"),
        k=16,
        bands=8,
        hash_family="md5",
    )
    appended = index.select("doc_id", "band", "bucket").unionByName(
        new_bands.select("doc_id", "band", "bucket")
    )
    assert {tuple(r) for r in appended.collect()} == {tuple(r) for r in rebuilt.collect()}

    # the corpus side of the probe: bucketed scan → broadcast semi-join
    # → groupBy, with NO shuffle Exchange anywhere. The touched-bucket
    # set is materialized to a local frame first so the plan under test
    # is exactly the corpus side (in the composed operator the only hash
    # Exchanges are increment-side: the touched distinct + pair distinct).
    touched = new_bands.select("band", "bucket").distinct()
    local_touched = spark.createDataFrame(touched.collect(), touched.schema)
    ex = existing_bucket_docs(index, local_touched)
    plan = ex._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "beast_test_lsh_index" in plan  # it IS the bucketed index scan
    spark.sql("DROP TABLE IF EXISTS beast_test_lsh_index")


def test_kmeans_lite_monotone_and_deterministic(spark, sf_dir):
    """Lloyd rounds must not increase quantization error, and the fixed
    init + fixed iterations must be bit-reproducible across runs."""
    from beast_spark.operators.similarity import ivf_inertia, kmeans_lite
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    c0 = kmeans_lite(e, k=4, iters=0)
    c2 = kmeans_lite(e, k=4, iters=2)
    err0 = ivf_inertia(e, c0)
    err2 = ivf_inertia(e, c2)
    assert err2 <= err0 + 1e-9

    again = kmeans_lite(e, k=4, iters=2)
    a = {r.cid: list(r.cvec) for r in c2.collect()}
    b = {r.cid: list(r.cvec) for r in again.collect()}
    assert a.keys() == b.keys()
    for cid in a:
        assert a[cid] == b[cid]


def test_resize_media_contract(spark):
    """Resize stub: deterministic fake bytes, null passthrough, dims set."""
    from beast_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, b"x" * 5000), (2, None)], "media_id long, content binary"
    )
    out = {r.media_id: r for r in resize_media(df, 64, 64).collect()}
    assert out[1].resized_w == 64 and out[1].resized_h == 64
    assert 0 < len(out[1].resized) <= 16
    assert out[2].resized is None
    # determinism
    again = {r.media_id: r for r in resize_media(df, 64, 64).collect()}
    assert bytes(again[1].resized) == bytes(out[1].resized)


def test_scd2_from_changelog_islands(spark):
    """A,A,B,A collapses to three intervals; a value returning later
    opens a NEW interval (SCD2, not distinct-value history)."""
    from datetime import datetime

    from beast_spark.operators.scd import scd2_from_changelog

    rows = [
        (1, 10, datetime(2024, 1, 1), "A"),
        (1, 11, datetime(2024, 1, 2), "A"),
        (1, 12, datetime(2024, 1, 3), "B"),
        (1, 13, datetime(2024, 1, 4), "A"),
        (2, 20, datetime(2024, 1, 1), "C"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, ts timestamp, v string")
    out = scd2_from_changelog(df, ["k"], "v", ["ts", "seq"])
    got = sorted(
        (r.k, r.attr_value, r.valid_from, r.valid_to, r.n_rows, r.is_current)
        for r in out.collect()
    )
    assert got == [
        (1, "A", datetime(2024, 1, 1), datetime(2024, 1, 3), 2, False),
        (1, "A", datetime(2024, 1, 4), None, 1, True),
        (1, "B", datetime(2024, 1, 3), datetime(2024, 1, 4), 1, False),
        (2, "C", datetime(2024, 1, 1), None, 1, True),
    ]
    # exactly one current row per key
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_single_exchange(spark):
    """All three window passes share one hash exchange on the key."""
    from datetime import datetime

    from beast_spark.operators.scd import scd2_from_changelog

    df = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1), "A")], "k long, seq long, ts timestamp, v string"
    )
    plan = scd2_from_changelog(df, ["k"], "v", ["ts", "seq"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_merge_upsert_semantics(spark):
    from beast_spark.operators.scd import merge_upsert

    target = spark.createDataFrame(
        [(1, 5, "old"), (2, 5, "keep")], "k long, seq long, v string"
    )
    updates = spark.createDataFrame(
        [(1, 5, "new"), (3, 1, "insert")], "k long, seq long, v string"
    )
    out = {r.k: r.v for r in merge_upsert(target, updates, ["k"], ["seq"]).collect()}
    # full tie on (k=1, seq=5): update side wins; unmatched key 3 inserted
    assert out == {1: "new", 2: "keep", 3: "insert"}


def test_merge_upsert_latest_wins_not_source(spark):
    """A stale update must NOT clobber a newer target row."""
    from beast_spark.operators.scd import merge_upsert

    target = spark.createDataFrame([(1, 9, "newer")], "k long, seq long, v string")
    updates = spark.createDataFrame([(1, 3, "stale")], "k long, seq long, v string")
    out = {r.k: r.v for r in merge_upsert(target, updates, ["k"], ["seq"]).collect()}
    assert out == {1: "newer"}


def test_scd2_increment_equals_full_rebuild(spark, sf_dir):
    """pairs(full) == pairs(old)+increment across several cutoffs,
    including merge-with-open-interval and brand-new-key cases."""
    from beast_spark.operators.scd import scd2_apply_increment, scd2_from_changelog
    from beast_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    args = dict(
        key_cols=["o_custkey"],
        attr_col="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
    )
    full = {tuple(r) for r in scd2_from_changelog(o, **args).collect()}
    for cutoff in ["1996-06-15", "2000-01-01"]:
        c = F.lit(cutoff).cast("timestamp")
        hist = scd2_from_changelog(o.filter(F.col("o_orderdate") < c), **args)
        inc = scd2_apply_increment(hist, o.filter(F.col("o_orderdate") >= c), **args)
        got = {tuple(r) for r in inc.collect()}
        assert got == full, f"cutoff {cutoff}: {len(got ^ full)} differing rows"


def test_scd2_increment_history_side_never_shuffles(spark, sf_dir, tmp_path):
    """With history persisted (the production shape), the history side —
    scan → broadcast anti/semi joins against the touched-key set →
    open/closed split — must plan ZERO shuffle Exchange: the
    O(increment) contract. The touched-key set is materialized to a
    local frame first so the plan under test is exactly the history side
    (in the composed operator the only hash Exchanges carry the
    increment: the touched distinct + the rebuilt window)."""
    from beast_spark.operators.scd import scd2_from_changelog, scd2_split_history
    from beast_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    args = dict(
        key_cols=["o_custkey"],
        attr_col="o_orderpriority",
        order_cols=["o_orderdate", "o_orderkey"],
    )
    c = F.lit("1998-01-01").cast("timestamp")
    hpath = str(tmp_path / "hist")
    scd2_from_changelog(o.filter(F.col("o_orderdate") < c), **args).write.parquet(hpath)
    history = spark.read.parquet(hpath)

    touched = o.filter(F.col("o_orderdate") >= c).select("o_custkey").distinct()
    local_touched = spark.createDataFrame(touched.collect(), touched.schema)
    for part in scd2_split_history(history, local_touched, ["o_custkey"]):
        plan = part._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "BroadcastHashJoin" in plan or "Broadcast" in plan, plan


def test_weighted_systematic_sample_contract(spark, sf_dir):
    """Each shard yields its k_s picks with pick_idx covering 1..k_s
    when no row outweighs a step; heavy rows collapse to ONE pick."""
    from beast_spark.operators.sampling import weighted_systematic_sample
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    out = weighted_systematic_sample(d, "doc_id", "n_chars", k=48, shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pick_idx)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, idxs in by_shard.items():
        # doc weights are tiny vs the per-shard step here, so every
        # boundary lands in a distinct row: exactly 12 picks, idx 1..12
        assert sorted(idxs) == list(range(1, 13)), (shard, sorted(idxs))

    # determinism
    again = weighted_systematic_sample(d, "doc_id", "n_chars", k=48, shards=4).collect()
    assert {(r.doc_id, r.pick_idx) for r in again} == {
        (r.doc_id, r.pick_idx) for r in out
    }


def test_weighted_sample_heavy_row_collapses(spark):
    """A row spanning several boundaries is picked once (P<=1 cap)."""
    from beast_spark.operators.sampling import weighted_systematic_sample

    rows = [(1, 1000), (2, 1), (3, 1), (4, 1)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_systematic_sample(df, "doc_id", "w", k=4, shards=1).collect()
    ids = [r.doc_id for r in out]
    assert ids.count(1) == 1  # heavy row once, not 4 times
    assert len(ids) == len(set(ids))


def test_leakage_free_split_keeps_neardups_together(spark, sf_dir):
    """Every LSH near-dup pair must land in the SAME split — the
    property a per-document hash split cannot guarantee."""
    from beast_spark.queries import all_queries
    from beast_spark.operators.dedup import minhash_lsh_pairs
    from beast_spark.sources.tables import load_table

    split = {
        r.doc_id: r.split
        for r in all_queries()["q118_leakage_free_split"].fn(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=8, threshold=0.35, hash_family="md5"
    ).collect()
    assert pairs, "test corpus should contain near-dups"
    for p in pairs:
        assert split[p.doc1] == split[p.doc2], (p.doc1, p.doc2)
    # and the split is still roughly 80/10/10 over all docs
    from collections import Counter

    frac = Counter(split.values())
    n = sum(frac.values())
    assert 0.6 < frac["train"] / n < 0.95


# ---------------------------------------------------------------------------
# Incremental rollup maintenance (operators/rollup.py)
# ---------------------------------------------------------------------------


def _rollup_rows(df):
    return sorted(
        (r.day, r.event_type, r.n_rows, r.sum_cents)
        for r in df.select("day", "event_type", "n_rows", "sum_cents").collect()
    )


@pytest.mark.parametrize("cutoff", ["2024-01-05", "2024-01-15", "2024-01-25"])
def test_incremental_rollup_matches_full(spark, sf_dir, cutoff):
    """merge(rollup(base), rollup(inc)) == rollup(all), exactly."""
    from beast_spark.operators.rollup import daily_rollup, merge_rollups
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    full = daily_rollup(e, ["event_type"], "ts", "value")
    base = daily_rollup(e.filter(F.col("ts") < cutoff), ["event_type"], "ts", "value")
    inc = daily_rollup(e.filter(F.col("ts") >= cutoff), ["event_type"], "ts", "value")
    assert _rollup_rows(merge_rollups(base, inc)) == _rollup_rows(full)


def test_incremental_rollup_merge_is_associative(spark, sf_dir):
    """Applying increments one at a time == batching them — any append
    schedule converges to the same table."""
    from beast_spark.operators.rollup import daily_rollup, merge_rollups
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    cuts = ["2024-01-10", "2024-01-20"]
    a = daily_rollup(e.filter(F.col("ts") < cuts[0]), ["event_type"], "ts", "value")
    b = daily_rollup(
        e.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ["event_type"],
        "ts",
        "value",
    )
    c = daily_rollup(e.filter(F.col("ts") >= cuts[1]), ["event_type"], "ts", "value")
    one_at_a_time = merge_rollups(merge_rollups(a, b), c)
    batched = merge_rollups(a, merge_rollups(b, c))
    full = daily_rollup(e, ["event_type"], "ts", "value")
    assert _rollup_rows(one_at_a_time) == _rollup_rows(batched) == _rollup_rows(full)


def test_merge_rollups_rejects_schema_drift(spark):
    from beast_spark.operators.rollup import merge_rollups

    a = spark.createDataFrame([("d", "t", 1, 100)], "day string, event_type string, n_rows long, sum_cents long")
    b = spark.createDataFrame([("d", 1, 100)], "day string, n_rows long, sum_cents long")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_rollups(a, b)


# ---------------------------------------------------------------------------
# Mergeable HLL sketch profiling (operators/sketches.py)
# ---------------------------------------------------------------------------


def test_sketch_merge_within_error_bound(spark, sf_dir):
    """Slice-merged estimate tracks the exact distinct within 3 sigma,
    and appending a slice to a persisted sketch table == resketching."""
    from beast_spark.operators.sketches import hll_rse, merged_distinct, sketch_by_slice
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    slices = sketch_by_slice(e, [day], "user_id")
    est, n_slices, n_rows = merged_distinct(slices).collect()[0]
    exact = e.select("user_id").distinct().count()
    assert n_rows == e.count()
    assert n_slices == e.select(day).distinct().count()
    assert abs(est - exact) <= 3 * hll_rse() * max(exact, 1)

    # Append path: sketch ONLY the tail slice, union with the existing
    # sketch table — same estimate invariant, history never rescanned.
    cut = "2024-01-20"
    old = sketch_by_slice(e.filter(F.col("ts") < cut), [day], "user_id")
    new = sketch_by_slice(e.filter(F.col("ts") >= cut), [day], "user_id")
    est2 = merged_distinct(old.unionByName(new)).collect()[0][0]
    assert abs(est2 - exact) <= 3 * hll_rse() * max(exact, 1)


# ---------------------------------------------------------------------------
# Distributed global row numbering (operators/rowids.py)
# ---------------------------------------------------------------------------


def test_with_row_ids_matches_global_window(spark, sf_dir):
    from pyspark.sql.window import Window

    from beast_spark.operators.rowids import with_row_ids
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    got = {
        (r.row_id, r.doc_id)
        for r in with_row_ids(d, ["lang", "doc_id"]).collect()
    }
    want = {
        (r.row_id, r.doc_id)
        for r in d.select(
            F.row_number().over(Window.orderBy("lang", "doc_id")).cast("long").alias("row_id"),
            "doc_id",
        ).collect()
    }
    assert got == want


def test_with_row_ids_partitioning_invariant(spark, sf_dir):
    """Same sequence regardless of input partitioning or partition count."""
    from beast_spark.operators.rowids import with_row_ids
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    base = sorted(
        (r.row_id, r.doc_id) for r in with_row_ids(d, ["doc_id"]).collect()
    )
    shuffled = d.repartition(13)
    for n in (1, 4, 32):
        got = sorted(
            (r.row_id, r.doc_id)
            for r in with_row_ids(shuffled, ["doc_id"], num_partitions=n).collect()
        )
        assert got == base


def test_with_row_ids_requires_order_cols(spark):
    from beast_spark.operators.rowids import with_row_ids

    with pytest.raises(ValueError, match="order_cols"):
        with_row_ids(spark.range(3), [])


# ---------------------------------------------------------------------------
# Hierarchy flattening by pointer doubling (operators/hierarchy.py)
# ---------------------------------------------------------------------------


def test_flatten_hierarchy_chain_and_forest(spark):
    from beast_spark.operators.hierarchy import flatten_hierarchy

    # a 21-deep chain (worst case for per-level loops) plus a second root
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 21)] + [(100, None), (101, 100)]
    nodes = spark.createDataFrame(rows, "id long, parent long")
    got = {(r.id, r.root_id, r.depth) for r in flatten_hierarchy(nodes, "id", "parent").collect()}
    want = {(i, 0, i) for i in range(21)} | {(100, 100, 0), (101, 100, 1)}
    assert got == want


def test_flatten_hierarchy_rounds_are_logarithmic(spark):
    """Pointer doubling must converge in O(log depth) rounds — a
    64-deep chain resolves within 8 rounds, where a per-level loop
    would need 64."""
    from beast_spark.operators.hierarchy import flatten_hierarchy

    rows = [(0, None)] + [(i, i - 1) for i in range(1, 65)]
    nodes = spark.createDataFrame(rows, "id long, parent long")
    out = flatten_hierarchy(nodes, "id", "parent", max_rounds=8)
    assert {(r.id, r.depth) for r in out.collect()} == {(i, i) for i in range(65)}


def test_flatten_hierarchy_rejects_cycles_and_dangling_parents(spark):
    """Malformed forests raise instead of returning silently wrong rows:
    a cycle never reaches the self-loop fixed point (round-exhaustion
    probe), a dangling parent would drop its subtree at the first join
    (upfront anti-join probe)."""
    import pytest

    from beast_spark.operators.hierarchy import flatten_hierarchy

    cycle = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 2), (9, None)], "id long, parent long"
    )
    with pytest.raises(ValueError, match="cycle"):
        flatten_hierarchy(cycle, "id", "parent", max_rounds=6).collect()

    dangling = spark.createDataFrame(
        [(0, None), (1, 0), (2, 77)], "id long, parent long"
    )
    with pytest.raises(ValueError, match="dangling"):
        flatten_hierarchy(dangling, "id", "parent")


def test_flatten_hierarchy_rejects_power_of_two_cycles(spark):
    """Cycles whose length divides 2^k stabilize `anc` under pointer
    doubling (anc returns to itself once 2^k % cycle_len == 0), so an
    anc-only probe would see convergence and return wrong rows. The
    probe also compares depth — which keeps doubling inside any cycle —
    so these must raise like any other cycle."""
    import pytest

    from beast_spark.operators.hierarchy import flatten_hierarchy

    # self-parent: cycle of length 1 — anc fixed from round 0
    selfloop = spark.createDataFrame([(5, 5)], "id long, parent long")
    with pytest.raises(ValueError, match="cycle"):
        flatten_hierarchy(selfloop, "id", "parent", max_rounds=6).collect()

    # 2-cycle: anc returns to self every round after the first
    two = spark.createDataFrame([(1, 2), (2, 1)], "id long, parent long")
    with pytest.raises(ValueError, match="cycle"):
        flatten_hierarchy(two, "id", "parent", max_rounds=6).collect()

    # 4-cycle attached beneath a healthy forest
    mixed = spark.createDataFrame(
        [(0, None), (1, 0), (10, 13), (11, 10), (12, 11), (13, 12)],
        "id long, parent long",
    )
    with pytest.raises(ValueError, match="cycle"):
        flatten_hierarchy(mixed, "id", "parent", max_rounds=8).collect()


def test_export_sharded_is_partitioning_invariant(spark, sf_dir, tmp_path):
    """Shard membership must be a function of the DATA (total order +
    shard size), not of the input partitioning."""
    from beast_spark.operators.rowids import export_sharded
    from beast_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def shards(path, src):
        n = export_sharded(src, ["doc_id"], 64, path)
        out = spark.read.parquet(path)
        got = {
            r.shard: r.ids
            for r in out.groupBy("shard")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .collect()
        }
        return n, got

    n1, a = shards(str(tmp_path / "a"), d)
    n2, b = shards(str(tmp_path / "b"), d.repartition(17))
    assert n1 == n2 and a == b
    total = sum(len(v) for v in a.values())
    assert total == d.count()
    full = [len(a[k]) for k in sorted(a)[:-1]]
    assert all(sz == 64 for sz in full)  # every shard but the last is full


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment 1.0,
    Jaccard far below any dedup threshold."""
    from beast_spark.operators.dedup import containment_pairs, jaccard_pairs

    quote = "alpha beta gamma delta epsilon"
    longdoc = "x" + "".join(f" w{i}" for i in range(60)) + " " + quote
    d = spark.createDataFrame([(1, quote), (2, longdoc)], "doc_id long, text string")
    cont = containment_pairs(d, "doc_id", "text", n=3, threshold=0.8).collect()
    assert len(cont) == 1
    assert (cont[0].inner_doc, cont[0].outer_doc, cont[0].containment) == (1, 2, 1.0)
    assert jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4).count() == 0


def test_misra_gries_bound_on_skewed_data(spark):
    """Heavy hitters survive, estimates are lower bounds, and the
    under-count stays within n/(k+1) — on data whose cardinality (5005)
    far exceeds the k=32 counters."""
    from beast_spark.operators.sketches import misra_gries_topk

    heavies = [(f"hh{i}",) for i in range(5) for _ in range(1000)]
    tail = [(f"w{j}",) for j in range(5000)]
    df = spark.createDataFrame(heavies + tail, "w string").repartition(8)
    n = df.count()
    k = 32
    est = {r.item: r.est_count for r in misra_gries_topk(df, "w", k).collect()}
    true = {f"hh{i}": 1000 for i in range(5)}
    for item, t in true.items():
        assert item in est, f"heavy hitter {item} evicted"
        assert est[item] <= t
        assert t - est[item] <= n / (k + 1)


def test_indexed_embedding_increment_equals_full_and_never_shuffles_corpus(
    spark, sf_dir, tmp_path
):
    """The q98 discipline on the embedding side (VERDICT r4 #6): the
    persisted (bucket, id, vector, norm) index gives the increment the
    exact new-pair set of a full q85 recompute — pairs(full) ==
    pairs(existing) ∪ pairs(increment), disjointly — while the corpus
    side (bucketed scan → broadcast semi-join → broadcast pair join)
    runs with ZERO shuffle Exchange."""
    from pyspark.sql import functions as F

    from beast_spark.operators.similarity import (
        embedding_lsh_index,
        hyperplanes_md5,
        incremental_lsh_neardup_pairs_indexed,
        lsh_neardup_pairs,
    )
    from beast_spark.sources.bucketing import write_bucketed
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    old = e.filter(F.col("vec_id") % 5 != 0)
    new = e.filter(F.col("vec_id") % 5 == 0)
    planes = hyperplanes_md5(64, 6)
    thr = 0.3  # lower than q164's so the local SF yields a real pair set

    spark.sql("DROP TABLE IF EXISTS beast_test_emb_index")
    write_bucketed(
        embedding_lsh_index(old, planes),
        "beast_test_emb_index",
        ["bucket"],
        n_buckets=8,
        path=str(tmp_path / "emb_index"),
    )
    index = spark.table("beast_test_emb_index")

    def pairset(df):
        return {(r.vec1, r.vec2, r.cos_sim) for r in df.collect()}

    new_idx, inc = incremental_lsh_neardup_pairs_indexed(
        index, new, dims=64, threshold=thr, planes=planes
    )
    inc_set = pairset(inc)
    full = pairset(lsh_neardup_pairs(e, dims=64, threshold=thr, planes=planes))
    existing = pairset(lsh_neardup_pairs(old, dims=64, threshold=thr, planes=planes))
    assert existing | inc_set == full
    assert existing.isdisjoint(inc_set)
    assert inc_set  # non-degenerate: the increment really found pairs

    # appending the returned index rows reproduces the full rebuild's index
    appended = index.select("vec_id", "bucket").unionByName(
        new_idx.select("vec_id", "bucket")
    )
    rebuilt = embedding_lsh_index(e, planes).select("vec_id", "bucket")
    assert {tuple(r) for r in appended.collect()} == {
        tuple(r) for r in rebuilt.collect()
    }

    # corpus side: ZERO shuffle Exchange. Rebuild exactly the new-vs-
    # existing subplan (the only part that touches the corpus) with the
    # increment localized — bucketed index scan → broadcast semi-join on
    # touched buckets → broadcast pair join. No Exchange anywhere in it.
    local_idx = spark.createDataFrame(new_idx.collect(), new_idx.schema)
    t = new_idx.select("bucket").distinct()
    touched = spark.createDataFrame(t.collect(), t.schema)
    ex = index.join(F.broadcast(touched), "bucket", "left_semi")
    probe = ex.join(F.broadcast(local_idx.select("bucket", "vec_id", "nrm")), "bucket")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "beast_test_emb_index" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    spark.sql("DROP TABLE IF EXISTS beast_test_emb_index")


def test_indexed_increment_never_self_pairs_on_overlapping_reappend(spark):
    """An id present in BOTH the index and the increment (an
    overlapping re-append) must not emit a (x, x) pair with
    cos_sim 1.0 (round-5 ADVICE)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.similarity import (
        embedding_lsh_index,
        hyperplanes_md5,
        incremental_lsh_neardup_pairs_indexed,
    )

    rows = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(20)]
    ddl = "vec_id long, embedding array<double>"
    full = spark.createDataFrame(rows, ddl)
    planes = hyperplanes_md5(8, 4)
    index = embedding_lsh_index(full, planes)
    # re-send rows 0..9, all already indexed
    _, pairs = incremental_lsh_neardup_pairs_indexed(
        index,
        spark.createDataFrame(rows[:10], ddl),
        dims=8,
        threshold=0.0,
        planes=planes,
    )
    assert pairs.filter(F.col("vec1") == F.col("vec2")).count() == 0


def test_multitable_increment_equals_full_rebuild(spark, sf_dir):
    """The multi-table (OR-amplified) incremental form: pairs(full, L
    tables) == pairs(existing) ∪ pairs(increment), disjointly — the
    production-recall config of the incremental/streaming near-dup path
    (the single-table config q172 measures at ~7% pair recall)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.similarity import (
        embedding_multitable_postings,
        incremental_multitable_neardup_pairs,
        lsh_multitable_neardup_pairs,
        multitable_planes,
    )
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    old = e.filter(F.col("vec_id") % 5 != 0)
    new = e.filter(F.col("vec_id") % 5 == 0)
    tables = multitable_planes(64, 8, 75)
    thr = 0.3

    def pairset(df):
        return {(r.vec1, r.vec2, r.cos_sim) for r in df.collect()}

    ex_post = embedding_multitable_postings(old, tables)
    from beast_spark.functions.vectors import norm

    ex_vec = old.select("vec_id", "embedding").withColumn(
        "nrm", norm(F.col("embedding"))
    )
    new_post, new_vec, inc = incremental_multitable_neardup_pairs(
        ex_post, ex_vec, new, dims=64, threshold=thr, tables=tables
    )
    inc_set = pairset(inc)
    full = pairset(lsh_multitable_neardup_pairs(e, dims=64, threshold=thr, tables=tables))
    existing = pairset(
        lsh_multitable_neardup_pairs(old, dims=64, threshold=thr, tables=tables)
    )
    assert existing | inc_set == full
    assert existing.isdisjoint(inc_set)
    assert inc_set  # non-degenerate

    # appending the returned postings reproduces the full rebuild's index
    appended = ex_post.unionByName(new_post)
    rebuilt = embedding_multitable_postings(e, tables)
    assert appended.count() == rebuilt.count()
    assert appended.exceptAll(rebuilt).count() == 0
    new_post.unpersist()
    new_vec.unpersist()


def test_range_bucket_join_matches_theta_and_avoids_nested_loop(spark):
    """range_bucket_join == the naive theta join on arbitrary data
    (including intervals LONGER than the bucket width — replication
    covers every overlapped bucket, pairs still meet exactly once), and
    the plan is an equi join on the manufactured bucket key, never a
    BroadcastNestedLoopJoin/CartesianProduct."""
    from pyspark.sql import functions as F

    from beast_spark.operators.rangejoin import range_bucket_join

    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(80)], "pid long, v long"
    )
    ivs = spark.createDataFrame(
        [(j, (j * 13) % 90, (j * 13) % 90 + (j % 4) * 6) for j in range(40)],
        "iid long, lo long, hi long",
    )
    got = {
        (r.pid, r.iid)
        for r in range_bucket_join(pts, ivs, "v", "lo", "hi", bucket_width=5).collect()
    }
    want = {
        (r.pid, r.iid)
        for r in pts.join(
            ivs, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert got == want and got

    plan = (
        range_bucket_join(pts, ivs, "v", "lo", "hi", bucket_width=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_point_in_interval_counts_matches_theta_count(spark):
    """point_in_interval_counts == count-aggregated naive theta join on
    arbitrary data, INCLUDING the edge rows the prefix-sum form must get
    right: intervals with no matching point (count 0), lo > hi (empty
    BETWEEN -> 0), a null bound (matches nothing -> 0), null points
    (never counted), bounds outside the observed point range, and
    duplicate point values. Plan stays broadcast-equi: no
    BroadcastNestedLoopJoin/CartesianProduct, intervals side unshuffled."""
    from pyspark.sql import functions as F

    from beast_spark.operators.rangejoin import point_in_interval_counts

    pts = spark.createDataFrame(
        [(i, i * 7 % 50) for i in range(80)] + [(900, None), (901, 13)],
        "pid long, v long",
    )
    ivs = spark.createDataFrame(
        [(j, (j * 13) % 90 - 10, (j * 13) % 90 - 10 + (j % 5) * 4) for j in range(40)]
        + [(100, 30, 20), (101, None, 5), (102, 5, None), (103, -500, 500)],
        "iid long, lo long, hi long",
    )
    got = {
        (r.iid, r.n)
        for r in point_in_interval_counts(pts, ivs, "v", "lo", "hi", "n").collect()
    }
    want_matched = {
        r.iid: r.n
        for r in pts.join(
            ivs, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        )
        .groupBy("iid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {(r.iid, want_matched.get(r.iid, 0)) for r in ivs.collect()}
    assert got == want and any(n > 0 for _, n in got)
    assert (100, 0) in got and (101, 0) in got and (102, 0) in got
    assert (103, 81) in got  # every non-null point, incl. duplicates

    plan = (
        point_in_interval_counts(pts, ivs, "v", "lo", "hi", "n")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The interval lookups must be broadcast EQUI joins; the only
    # nested-loop allowed is the 1-row x 1-row bounds crossJoin (the
    # registry-wide policy: broadcast-size non-equi is fine, a
    # CartesianProduct never is).
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_point_in_interval_counts_no_points(spark):
    """Empty points side: every interval counts 0 (the dim collapses to
    the query-key range and every prefix sum is 0)."""
    from beast_spark.operators.rangejoin import point_in_interval_counts

    pts = spark.createDataFrame([], "pid long, v long")
    ivs = spark.createDataFrame([(1, 2, 8), (2, -3, -1)], "iid long, lo long, hi long")
    rows = point_in_interval_counts(pts, ivs, "v", "lo", "hi", "n").collect()
    assert {(r.iid, r.n) for r in rows} == {(1, 0), (2, 0)}


def test_repeated_span_removal_semantics(spark):
    """Hand-built corpus pins the span algebra: cross-doc duplicate run
    flagged at any offset, self-repeating doc fully cleaned, unique doc
    untouched, overlapping flagged windows merged into ONE span."""
    from beast_spark.operators.quality import repeated_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h x y z"),       # 'a..h' also in doc 2
            (2, "q a b c d e f g h w"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),  # unique
            (4, "r r r r r r r r r r r r"),     # self-repeat: all covered
            (5, "a b c d e f g h i j k l m n o p"),  # 'a..h' + shifted dups of
            #    doc6's 'i..p' -> two windows merging via overlap with 'b..i'?
            (6, "z1 i j k l m n o p z2"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_spans, r.n_removed, r.n_tokens) for r in
           repeated_span_stats(docs).collect()}
    assert got[3] == (0, 0, 9)
    assert got[4] == (1, 12, 12)          # everything removed
    assert got[1] == (1, 8, 11)
    assert got[2] == (1, 8, 10)
    # doc5: windows [1..8] ('a..h') and [9..16] ('i..p') both flagged,
    # adjacent but NOT overlapping -> spans merge check: i=9 > prev_end=8
    # keeps them as TWO spans covering everything
    assert got[5] == (2, 16, 16)
    # empty cleaned text hashes like md5("")
    full = {r.doc_id: r.cleaned_hash for r in repeated_span_stats(docs).collect()}
    import hashlib
    assert full[4] == hashlib.md5(b"").hexdigest()
    assert full[5] == hashlib.md5(b"").hexdigest()


def test_quantized_codes_roundtrip_matches_dequantized_form(spark, sf_dir):
    """dequantize(quantize_codes(x)) must equal scalar_quantize_dequantized(x)
    bit-for-bit: one canonical dequantized form for storage, scoring,
    and oracles."""
    from beast_spark.operators.similarity import (
        dequantize_codes,
        quantization_params,
        quantize_codes,
        scalar_quantize_dequantized,
    )
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    params = quantization_params(e)
    want = {
        r.vec_id: tuple(r.dqvec)
        for r in scalar_quantize_dequantized(e, params).collect()
    }
    codes = quantize_codes(e, params)
    got = {
        r.vec_id: tuple(r.dqvec)
        for r in dequantize_codes(codes, params).collect()
    }
    assert got == want
    # codes really are int8-ranged
    import pyspark.sql.functions as SF

    mx = codes.select(SF.explode("codes").alias("c")).agg(
        SF.min("c").alias("lo"), SF.max("c").alias("hi")
    ).collect()[0]
    assert -128 <= mx.lo <= mx.hi <= 127


def test_quantized_index_increment_equals_full_and_shrinks_storage(
    spark, sf_dir, tmp_path
):
    """The q164 exactness contract on the QUANTIZED index — pairs_q(full)
    == pairs_q(existing) ∪ pairs_q(increment) under a FROZEN codebook —
    plus the storage claim: the TINYINT-coded index parquet must be
    well under half the raw-vector index's size."""
    import os

    from pyspark.sql import functions as F

    from beast_spark.operators.similarity import (
        dequantize_codes,
        embedding_lsh_index,
        embedding_lsh_index_quantized,
        hyperplanes_md5,
        incremental_lsh_neardup_pairs_quantized,
        lsh_neardup_pairs,
        quantization_params,
        quantize_codes,
    )
    from beast_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    old = e.filter(F.col("vec_id") % 5 != 0)
    new = e.filter(F.col("vec_id") % 5 == 0)
    planes = hyperplanes_md5(64, 6)
    thr = 0.3
    params = quantization_params(e)  # frozen over the FULL corpus

    qindex = embedding_lsh_index_quantized(old, planes, params)
    qindex.write.parquet(str(tmp_path / "qidx"))
    qindex = spark.read.parquet(str(tmp_path / "qidx"))

    def pairset(df):
        return {(r.vec1, r.vec2, r.cos_sim) for r in df.collect()}

    new_idx, inc = incremental_lsh_neardup_pairs_quantized(
        qindex, params, new, dims=64, threshold=thr, planes=planes
    )
    inc_set = pairset(inc)

    # the full/existing reference sets: q85's operator over the
    # canonical dequantized vectors (same planes, same threshold)
    def dq_pairs(src):
        dq = dequantize_codes(quantize_codes(src, params), params).select(
            "vec_id", F.col("dqvec").alias("embedding")
        )
        return pairset(lsh_neardup_pairs(dq, dims=64, threshold=thr, planes=planes))

    full = dq_pairs(e)
    existing = dq_pairs(old)
    assert existing | inc_set == full
    assert existing.isdisjoint(inc_set)
    assert inc_set
    new_idx.unpersist()

    # storage: quantized index well under half the raw index
    embedding_lsh_index(old, planes).write.parquet(str(tmp_path / "rawidx"))

    def dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(str(p))
            for f in fs
        )

    ratio = dir_bytes(tmp_path / "qidx") / dir_bytes(tmp_path / "rawidx")
    assert ratio < 0.5, ratio


def test_multitable_increment_corpus_probe_never_shuffles(spark, tmp_path):
    """The multi-table index's corpus-side probe — bucketed postings
    scan → broadcast semi-join on touched (t, bucket) keys → broadcast
    join of the increment postings — must run with ZERO shuffle
    Exchange, like the single-table form (the bucketed layout is what
    makes a nightly append O(increment + touched buckets) at scale)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.similarity import (
        embedding_multitable_postings,
        multitable_planes,
    )
    from beast_spark.sources.bucketing import write_bucketed

    rows = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(40)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    inc = spark.createDataFrame(rows[30:], "vec_id long, embedding array<double>")
    tables = multitable_planes(8, 4, 6)

    spark.sql("DROP TABLE IF EXISTS beast_test_mt_postings")
    write_bucketed(
        embedding_multitable_postings(corpus, tables),
        "beast_test_mt_postings",
        ["t", "bucket"],
        n_buckets=8,
        path=str(tmp_path / "mt_postings"),
    )
    postings = spark.table("beast_test_mt_postings")

    # the exact corpus-touching subplan of incremental_multitable_
    # neardup_pairs, with the increment localized (as the broadcast
    # sides are at runtime)
    new_post_local = spark.createDataFrame(
        embedding_multitable_postings(inc, tables).collect(), "vec_id long, t int, bucket long"
    )
    touched = spark.createDataFrame(
        new_post_local.select("t", "bucket").distinct().collect(), "t int, bucket long"
    )
    ex = postings.join(F.broadcast(touched), ["t", "bucket"], "left_semi")
    probe = ex.join(
        F.broadcast(new_post_local.select("t", "bucket", F.col("vec_id").alias("_nid"))),
        ["t", "bucket"],
    ).filter(F.col("vec_id") != F.col("_nid"))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "beast_test_mt_postings" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    spark.sql("DROP TABLE IF EXISTS beast_test_mt_postings")


def test_gopher_gate_rules_fire_individually(spark):
    """Each gopher_signals rule rejects exactly its own pathology, and
    pass_all is their conjunction."""
    from beast_spark.operators.quality import gopher_signals

    good = (
        "the quick brown fox jumps over a lazy dog while seven wizards "
        "brew strong coffee under bright moonlight near quiet rivers and "
        "tall mountains during early autumn mornings with gentle winds"
    )  # 31 distinct tokens, 3 stopwords, mean length ~5
    docs = [
        (1, good.strip()),
        (2, "the of short"),  # word count < 20
        (3, ("a " + "internationalization " * 30 + "the of").strip()),  # mean len > 10
        (4, ("the of " + "x " * 40).strip()),  # top token 'x' > 20%
        (5, ("the of " + "b b b c c d " * 6).strip()),  # unique ratio < 0.3
        (6, " ".join(f"word{i}" for i in range(25))),  # no stopwords
    ]
    sig = gopher_signals(
        spark.createDataFrame(docs, "doc_id long, text string")
    ).collect()
    by = {r.doc_id: r for r in sig}
    assert by[1].pass_all
    assert not by[2].ok_word_count and by[2].ok_stopwords
    assert not by[3].ok_mean_word_len and by[3].ok_word_count
    assert not by[4].ok_top_token and by[4].ok_word_count
    assert not by[5].ok_unique_ratio and by[5].ok_top_token is not None
    assert not by[6].ok_stopwords and by[6].ok_unique_ratio
    for d in range(2, 7):
        assert not by[d].pass_all


def test_repetition_signals_total_under_pushed_predicate(spark):
    """Regression for the q169 crash: a consumer that FILTERS on
    dup_trigram_frac gets that predicate pushed down and its trigram
    subtree subexpression-hoisted ABOVE the size>=3 conjunct in the
    combined Filter — so the trigram expression must be TOTAL.
    Unguarded, sequence(1, size-2) descends on a 1-token doc and
    element_at(i+2) throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT under
    ANSI. The single-token doc here reproduces the crash shape; the
    assert is simply that the composition evaluates and keeps exactly
    the long repetitive doc."""
    from beast_spark.operators.quality import repetition_signals

    docs = spark.createDataFrame(
        [(1, "x"), (2, "a b"), (3, ("w1 w2 w3 " * 10 + "w1 w2 w3").strip())],
        "doc_id long, text string",
    )
    rep = repetition_signals(docs).select("doc_id", "dup_trigram_frac")
    # The join + filter mirrors q169's `g` stage: the predicate is pushed
    # through the join into repetition_signals' subtree.
    out = (
        docs.join(rep, "doc_id")
        .filter(F.col("dup_trigram_frac") >= 0.5)
        .select("doc_id")
        .collect()
    )
    assert [r.doc_id for r in out] == [3]


def test_gopher_gate_is_single_map_stage(spark, sf_dir):
    """The gate must stay a pure scan-side predicate: no Exchange, no
    BatchEvalPython, no explode-induced generator in the plan."""
    from beast_spark.operators.quality import gopher_signals

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        gopher_signals(d, keep_cols=("source",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for banned in ("Exchange", "BatchEvalPython", "Generate"):
        assert banned not in plan, plan


def test_stft8_power_matches_numpy_fft(spark):
    """The unrolled JVM DFT must be a REAL Fourier transform, not just
    self-consistent with its oracle: compare against numpy's rfft power
    on deterministic int16 signals (tolerance: rounding to 2 decimals
    happens Spark-side; numpy and the exact-twiddle expansion agree to
    ~1e-9 relative)."""
    import numpy as np

    from beast_spark.operators.multimodal import stft8_power

    rows = [
        (i, [((i * 31 + k * 17) % 200 - 100) * 50 for k in range(16)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "media_id long, samples array<int>")
    got = {
        (r.media_id, r.frame, r.bin): r.power
        for r in stft8_power(df).collect()
    }
    assert len(got) == 20 * 2 * 5  # 16 samples -> 2 frames x 5 bins
    for i, s in rows:
        for f in range(2):
            spec = np.fft.rfft(np.array(s[f * 8 : (f + 1) * 8], dtype=float))
            for m in range(5):
                want = abs(spec[m]) ** 2
                assert abs(got[(i, f, m)] - want) <= max(1e-6 * want, 0.01), (
                    i, f, m, got[(i, f, m)], want,
                )


def test_stft8_power_drops_trailing_partial_frame(spark):
    from beast_spark.operators.multimodal import stft8_power

    df = spark.createDataFrame(
        [(1, list(range(13)))], "media_id long, samples array<int>"
    )
    out = stft8_power(df).collect()
    assert {r.frame for r in out} == {0}  # 13 samples -> one full frame
    assert len(out) == 5


def test_stft8_power_short_and_empty_clips_emit_zero_frames(spark):
    """Sub-frame-length clips must yield NO frames (the documented
    contract), not a crash: Spark's sequence(0, -1) is the DESCENDING
    [0, -1], so an ungated frame index emits a partial frame 0 and an
    out-of-range frame -1 (element_at index error under ANSI)."""
    from beast_spark.operators.multimodal import stft8_power

    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, []), (3, list(range(8)))],
        "media_id long, samples array<int>",
    )
    out = stft8_power(df).collect()
    assert {r.media_id for r in out} == {3}
    assert len(out) == 5


def test_pq_codebook_vectors_encode_to_themselves(spark, sf_dir):
    """A codebook-member vector's nearest sub-centroid in every
    subspace is its own subvector (distance 0, tie-break can't bite
    since any tie would also be distance 0 → lowest code wins and the
    distance stays exact) — the PQ analogue of 'centroids quantize to
    themselves', which any slicing/off-by-one bug breaks."""
    from pyspark.sql import functions as F

    from beast_spark.operators.similarity import pq_codebooks, pq_codes

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cb = pq_codebooks(e, dims=64)
    codes = pq_codes(e.filter(F.col("vec_id") < 16), cb, dims=64).collect()
    assert len(codes) == 16 * 8
    mismatch = [r for r in codes if r.code > r.vec_id]
    assert not mismatch, mismatch[:5]  # own subvector (or an exact-tie lower id)


def test_pq_adc_scan_broadcasts_lut_and_never_shuffles_codes(spark, sf_dir):
    """The ADC scan is the memory-bound hot loop: the Q×m×n_codes LUT
    must broadcast onto the codes scan — no shuffle of the corpus-sized
    codes side below the join (the per-(query,vec) sum may shuffle its
    own aggregate rows above it)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.similarity import (
        pq_adc_lut,
        pq_adc_topk,
        pq_codebooks,
        pq_codes,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cb = pq_codebooks(e, dims=64)
    codes = pq_codes(e, cb, dims=64)
    lut = pq_adc_lut(e.filter(F.col("vec_id") < 3), cb, dims=64)
    plan = (
        pq_adc_topk(codes, lut, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    streamed = plan.split("BroadcastHashJoin")[-1].split("BroadcastExchange")[0]
    assert "Exchange" not in streamed, streamed


def test_hashed_doc_vectors_shape_and_contract(spark):
    """Fixed dims, identical text -> identical vector, sub-n-token docs
    absent, and the vector is the signed bucket-count of the DISTINCT
    shingle set (a repeated shingle contributes once)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.dedup import hashed_doc_vectors

    docs = [
        (1, "a b c d e"),
        (2, "a b c d e"),          # identical -> identical vector
        (3, "a b c a b c a b c"),  # repeated shingles collapse (distinct)
        (4, "x y"),                # < 3 tokens -> absent
    ]
    out = {
        r.doc_id: r.embedding
        for r in hashed_doc_vectors(
            spark.createDataFrame(docs, "doc_id long, text string"), dims=16
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert all(len(v) == 16 for v in out.values())
    assert out[1] == out[2]
    # doc 3 has distinct shingles {a b c, b c a, c a b}: total mass 3
    assert sum(abs(x) for x in out[3]) <= 3
    assert any(x != 0 for x in out[3])


def test_bpe_train_matches_canonical_walkthrough(spark):
    """The Sennrich low/lower/newest/widest example: merge order and
    final segmentations are the published walkthrough's (e+s, es+t,
    l+o, lo+w, e+w, ew+est), pinning stats weighting, tie-breaks, and
    the greedy fold in one shot."""
    from beast_spark.operators.bpe import bpe_train

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    merges, vocab = bpe_train(
        spark.createDataFrame([(text,)], "text string"), n_merges=6
    )
    got = [(m.left, m.right, m.pair_count) for m in merges]
    assert got == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "w", 6),
        ("ew", "est", 6),
    ]
    segs = {r.word: r.syms for r in vocab.collect()}
    vocab.unpersist()
    assert segs == {
        "low": ["low"],
        "lower": ["low", "e", "r"],
        "newest": ["n", "ewest"],
        "widest": ["w", "i", "d", "est"],
    }


def test_bpe_merge_fold_greedy_nonoverlap(spark):
    """Overlapping runs merge left-to-right without overlap, and raw
    selection stats may exceed merged occurrences (the documented
    run-overlap gap)."""
    from pyspark.sql import functions as F

    from beast_spark.operators.bpe import bpe_merge_fold, bpe_train

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(bpe_merge_fold(F.col("syms"), "a", "a").alias("m")).first().m
    assert out == ["aa", "a"]

    merges, vocab = bpe_train(
        spark.createDataFrame([("aaa aaa",)], "text string"), n_merges=1
    )
    vocab.unpersist()
    assert merges[0].pair_count == 4  # overlap-inclusive selection stat
    assert merges[0].merged == 2  # one non-overlapping merge per word


def test_bpe_early_exhaustion_and_oracle_passthrough(spark):
    """When merges exhaust before the configured rounds, bpe_train stops
    early keeping the last vocab, and the generated DuckDB oracle's
    LEFT-JOIN pass-through stages must agree (an empty best-pair CTE
    cross-joined would instead wipe the vocabulary)."""
    import duckdb

    from beast_spark.operators.bpe import bpe_train
    from beast_spark.queries.datapipe import _BPE_ROUNDS, _bpe_base_sql

    merges, vocab = bpe_train(
        spark.createDataFrame([("ab ab cd",)], "text string"), n_merges=_BPE_ROUNDS
    )
    segs = {r.word: r.syms for r in vocab.collect()}
    vocab.unpersist()
    assert len(merges) == 2  # a+b, c+d — then nothing adjacent remains
    assert segs == {"ab": ["ab"], "cd": ["cd"]}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 'ab ab cd' AS text, 's1' AS source"
    )
    sql = (
        _bpe_base_sql(_BPE_ROUNDS)
        + f", sw AS (SELECT word, len(es) AS n_sub FROM v{_BPE_ROUNDS + 1}) "
        "SELECT word, n_sub FROM sw ORDER BY word"
    )
    assert con.execute(sql).fetchall() == [("ab", 1), ("cd", 1)]


def test_pq_adc_equals_decomposed_reconstruction_distance(spark, sf_dir):
    """Squared L2 decomposes over subspaces: the ADC lookup-table sum
    for (query, vector) must equal the distance from the query to the
    vector's PQ RECONSTRUCTION (its assigned sub-centroids
    concatenated), up to the per-subspace integerization slack (m
    floors of +-0.5 micro-units vs one). Pins that the LUT is really
    the decomposed distance, not merely self-consistent."""
    from pyspark.sql import functions as F

    from beast_spark.functions.vectors import dot
    from beast_spark.operators.similarity import (
        pq_adc_lut,
        pq_codebooks,
        pq_codes,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cb = pq_codebooks(e, dims=64)
    codes = pq_codes(e.filter(F.col("vec_id") < 40), cb, dims=64)
    qs = e.filter(F.col("vec_id") < 3)
    lut = pq_adc_lut(qs, cb, dims=64)
    adc = (
        codes.join(lut, ["s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2i").alias("adci"))
    )
    # reconstruction: concat assigned sub-centroids in subspace order
    recon = (
        codes.join(cb, ["s", "code"])
        .groupBy("vec_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "cvec"))),
                    lambda x: x["cvec"],
                )
            ).alias("rvec")
        )
    )
    qv = qs.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    d2 = dot(F.col("qv"), F.col("qv")) + dot(F.col("rvec"), F.col("rvec")) - 2.0 * dot(
        F.col("qv"), F.col("rvec")
    )
    direct = recon.crossJoin(F.broadcast(qv)).select(
        "query_id", "vec_id", F.floor(d2 * 1e6 + F.lit(0.5)).cast("long").alias("di")
    )
    joined = adc.join(direct, ["query_id", "vec_id"]).select(
        (F.abs(F.col("adci") - F.col("di"))).alias("gap")
    )
    mx = joined.agg(F.max("gap").alias("m")).first().m
    n = joined.count()
    assert n == 3 * 40
    assert mx <= 8, mx  # 8 subspace floors vs 1: <= 4.5 micro-units; slack 8
