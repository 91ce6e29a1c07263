"""File-source declarations: explicit-schema CSV/JSON round-trips, JDBC gating."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from beast_spark.sources.files import (
    jdbc_available,
    read_csv,
    read_jdbc,
    read_json,
    read_parquet,
    write_partitioned,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture
def sample(spark):
    return spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5), (3, "c,x", 3.5)], SCHEMA)


def test_csv_roundtrip(spark, tmp_path, sample):
    p = str(tmp_path / "csv")
    sample.write.option("header", True).csv(p)
    out = read_csv(spark, p, SCHEMA)
    assert sorted(r.name for r in out.collect()) == ["a", "b", "c,x"]
    assert out.schema == SCHEMA  # explicit schema, no inference drift


def test_json_roundtrip(spark, tmp_path, sample):
    p = str(tmp_path / "json")
    sample.write.json(p)
    out = read_json(spark, p, SCHEMA)
    assert out.count() == 3 and out.schema == SCHEMA


def test_partitioned_write(spark, tmp_path, sample):
    import glob

    p = str(tmp_path / "part")
    write_partitioned(sample.withColumn("bucket", sample.id % 2), p, ["bucket"])
    assert glob.glob(f"{p}/bucket=0") and glob.glob(f"{p}/bucket=1")
    assert read_parquet(spark, p).count() == 3


def test_jdbc_gated(spark):
    assert jdbc_available(spark, "java.lang.String")  # sanity: class lookup works
    assert not jdbc_available(spark)  # no postgres driver in the container
    with pytest.raises(RuntimeError, match="JDBC driver"):
        read_jdbc(spark, "jdbc:postgresql://x/y", "t")


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """The JDBC legs run for REAL against Spark's bundled embedded Derby:
    write (table auto-created on first append), append again, read back."""
    from beast_spark.sources.files import DERBY_DRIVER, write_jdbc

    assert jdbc_available(spark, DERBY_DRIVER)
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    write_jdbc(df, url, "RT", driver_class=DERBY_DRIVER)
    write_jdbc(df.filter("id = 1"), url, "RT", driver_class=DERBY_DRIVER)
    back = read_jdbc(spark, url, "RT", driver_class=DERBY_DRIVER)
    assert back.count() == 3
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "a"), (1, "a"), (2, "b")]


def test_parquet_scan_pushes_filters_and_prunes_columns(spark, sf_dir):
    """Catalyst must push predicates and the projection into the parquet
    scan — at 100 TB a scan that reads every column for a two-column
    query is wrong (SURVEY §4.3). Asserted on the formatted plan."""
    from beast_spark.sources.tables import load_table

    df = (
        load_table(spark, sf_dir, "orders")
        .filter("o_totalprice > 100000")
        .select("o_orderkey", "o_totalprice")
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice," in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_custkey" not in read_schema  # untouched columns pruned


def test_kafka_option_wiring_contract(spark):
    """A1 option wiring (BeastFactory.java:193-202, KafkaConfig.java:17-29):
    regex subscription via subscribePattern, startingOffsets passthrough,
    MAX_POLL_RECORDS default mapped to maxOffsetsPerTrigger=500, and the
    connector gate raising a clear error (jar absent from the container,
    probe documented in COVERAGE.md)."""
    from beast_spark.streaming.kafka import (
        kafka_options,
        kafka_source_available,
        read_stream,
    )

    opts = kafka_options(brokers="b1:9092,b2:9092", topic_pattern="orders-.*")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribePattern": "orders-.*",
        "startingOffsets": "latest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "500",  # KAFKA_CONSUMER_MAX_POLL_RECORDS default
    }
    # explicit earliest + unbounded batches
    opts = kafka_options(
        brokers="b:9092", topic_pattern="t", starting_offsets="earliest",
        max_offsets_per_trigger=None, fail_on_data_loss=False,
    )
    assert opts["startingOffsets"] == "earliest"
    assert "maxOffsetsPerTrigger" not in opts
    assert opts["failOnDataLoss"] == "false"

    assert not kafka_source_available(spark)
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_stream(spark, brokers="b:9092", topic_pattern="t")


def test_write_sorted_clusters_row_groups_for_skipping(spark, tmp_path):
    """Sort-on-write must produce parquet row groups with narrow,
    mostly-disjoint min/max ranges on the sort column (the stats any
    engine uses to skip row groups); an unsorted write of the same data
    produces full-range row groups that can never be skipped."""
    import pyarrow.parquet as pq

    from beast_spark.sources.files import write_sorted

    n = 200_000
    df = (
        spark.range(n)
        .selectExpr("cast(hash(id) % 100000 as long) as k", "id as payload")
        .repartition(4)
    )
    # force several row groups per file so skipping has units to work on
    small_rg = {"parquet.block.size": str(64 * 1024)}
    unsorted, srt = str(tmp_path / "unsorted"), str(tmp_path / "sorted")
    df.write.options(**small_rg).mode("overwrite").parquet(unsorted)
    df.sortWithinPartitions("k").write.options(**small_rg).mode("overwrite").parquet(srt)
    write_sorted(df, str(tmp_path / "api"), ["k"])  # API smoke

    def ranges(path):
        import glob as g

        spans = []
        for f in g.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ki = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "k"
            )
            for r in range(md.num_row_groups):
                st = md.row_group(r).column(ki).statistics
                spans.append((st.min, st.max))
        return spans

    full = max(x for _, x in ranges(unsorted)) - min(x for x, _ in ranges(unsorted))
    sorted_spans = ranges(srt)
    assert len(sorted_spans) >= 8  # several row groups — skipping has units
    avg_span = sum(hi - lo for lo, hi in sorted_spans) / len(sorted_spans)
    # sorted row groups cover a small slice of the domain; unsorted ones
    # cover essentially all of it
    assert avg_span < full * 0.35
    unsorted_avg = sum(hi - lo for lo, hi in ranges(unsorted)) / len(ranges(unsorted))
    assert unsorted_avg > full * 0.9


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """Z-order layout: a thin predicate on EITHER column skips most row
    groups, while a single-column sort only prunes its own column."""
    from pyspark.sql import functions as F

    from beast_spark.sources.layout import rowgroups_matching, write_zordered

    n, dom = 100_000, 1_000_000
    df = spark.range(n).select(
        ((F.col("id") * 48271) % dom).alias("x"),
        ((F.col("id") * 16807 + 12345) % dom).alias("y"),
    )

    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsorted")
    write_zordered(df, zpath, [("x", 0, dom), ("y", 0, dom)], n_files=32)
    (
        df.repartitionByRange(32, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    lo, hi = 0, dom // 16  # a 1/16-wide slice of the domain
    zx, zt = rowgroups_matching(zpath, "x", lo, hi)
    zy, _ = rowgroups_matching(zpath, "y", lo, hi)
    bx, bt = rowgroups_matching(xpath, "x", lo, hi)
    by, _ = rowgroups_matching(xpath, "y", lo, hi)

    # x-sorted baseline: near-perfect on x, useless on y.
    assert bx <= max(2, bt // 8)
    assert by == bt
    # Z-order: real pruning on BOTH dimensions (each row group is a small
    # rectangle of (x, y) space — a 1/16 slice can't touch most of them).
    assert zx <= zt // 2, (zx, zt)
    assert zy <= zt // 2, (zy, zt)


def test_morton_key_orders_like_interleave(spark):
    """Spot-check the bit spread against a pure-Python interleave."""
    from pyspark.sql import functions as F

    from beast_spark.sources.layout import morton_key

    def py_interleave(a: int, b: int) -> int:
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 7)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", morton_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == py_interleave(a, b), (a, b)


def test_morton3_matches_python_interleave(spark):
    from pyspark.sql import functions as F

    from beast_spark.sources.layout import morton_key_3

    def py3(a, b, c):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (3 * i)
            out |= ((b >> i) & 1) << (3 * i + 1)
            out |= ((c >> i) & 1) << (3 * i + 2)
        return out

    rows = [(0, 0, 0), (1, 2, 4), (65535, 65535, 65535), (12345, 54321, 4097)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {
        (r.a, r.b, r.c): r.z
        for r in df.select(
            "a", "b", "c", morton_key_3(F.col("a"), F.col("b"), F.col("c")).alias("z")
        ).collect()
    }
    for a, b, c in rows:
        assert got[(a, b, c)] == py3(a, b, c), (a, b, c)


def test_zorder3_layout_prunes_all_three_axes(spark, tmp_path):
    """3-way Morton: a thin slice on ANY of the three columns skips a
    real fraction of row groups; a single-column sort prunes only its
    own axis."""
    from pyspark.sql import functions as F

    from beast_spark.sources.layout import rowgroups_matching, write_zordered

    n, dom = 120_000, 1_000_000
    df = spark.range(n).select(
        ((F.col("id") * 48271) % dom).alias("x"),
        ((F.col("id") * 16807 + 12345) % dom).alias("y"),
        ((F.col("id") * 69621 + 777) % dom).alias("z"),
    )
    zpath = str(tmp_path / "z3")
    write_zordered(
        df, zpath, [("x", 0, dom), ("y", 0, dom), ("z", 0, dom)], n_files=64
    )
    lo, hi = 0, dom // 16
    for c in ("x", "y", "z"):
        m, t = rowgroups_matching(zpath, c, lo, hi)
        assert m <= t // 2, (c, m, t)


def test_orc_roundtrip_with_pushdown(spark, tmp_path, sf_dir):
    """ORC write/read roundtrip preserves values, and filters reach the
    ORC scan (searchArgument pushdown) like parquet."""
    from beast_spark.sources.files import read_orc

    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    src.write.orc(str(tmp_path / "region_orc"))
    back = read_orc(spark, str(tmp_path / "region_orc"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.filter(back.r_regionkey == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(r_regionkey), EqualTo(r_regionkey,1)" in plan


def test_text_source_lines_and_wholetext(spark, tmp_path):
    from beast_spark.sources.files import read_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("only line\n")
    lines = read_text(spark, str(p))
    assert sorted(r.value for r in lines.collect()) == [
        "line one", "line two", "only line",
    ]
    whole = read_text(spark, str(p), whole=True)
    assert sorted(r.value for r in whole.collect()) == [
        "line one\nline two\n", "only line\n",
    ]
