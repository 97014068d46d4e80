"""Compaction maintenance pass: layout, parallelism, and fidelity."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from algoritmos_etl_spark.sources.compact import compact_table
from algoritmos_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_compact_rewrites_single_row_group_table(spark, tmp_path):
    dest = str(tmp_path / "lineitem_compact")
    report = compact_table(
        spark,
        f"{SF_DIR}/lineitem.parquet",
        dest,
        target_files=8,
        sort_within_partitions_by=["l_shipdate"],
    )
    src = load_table(spark, SF_DIR, "lineitem")
    assert report["rows"] == src.count()
    assert report["files_after"] >= 8  # scan now has >= 8 splits

    files = glob.glob(f"{dest}/*.parquet")
    assert len(files) == 8
    # content identical (order-insensitive)
    back = spark.read.parquet(dest)
    assert (
        sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    )
    # within-file l_shipdate runs are sorted -> min/max pruning works
    f = pq.ParquetFile(files[0])
    tbl = f.read(columns=["l_shipdate"])
    vals = tbl.column(0).to_pylist()
    assert vals == sorted(vals)


def test_compact_bounds_records_per_file(spark, tmp_path):
    dest = str(tmp_path / "orders_compact")
    compact_table(
        spark,
        f"{SF_DIR}/orders.parquet",
        dest,
        target_files=2,
        max_records_per_file=300,
    )
    for fp in glob.glob(f"{dest}/*.parquet"):
        assert pq.ParquetFile(fp).metadata.num_rows <= 300


def test_bucketized_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key, same bucket count →
    sort-merge join with ZERO shuffle on either side: the 100 TB
    co-located-join layout."""
    from algoritmos_etl_spark.sources.compact import bucketize_table

    rep_o = bucketize_table(
        spark, f"{SF_DIR}/orders.parquet", "t_orders_b",
        ["o_orderkey"], n_buckets=4, path=str(tmp_path / "orders_b"),
    )
    rep_l = bucketize_table(
        spark, f"{SF_DIR}/lineitem.parquet", "t_lineitem_b",
        ["l_orderkey"], n_buckets=4, path=str(tmp_path / "lineitem_b"),
    )
    assert rep_o["rows"] > 0 and rep_l["rows"] > 0
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is the plain join's result
        expect = (
            load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _rowgroups_matching(path_glob: str, col: str, lo, hi) -> tuple[int, int]:
    """(matching, total) row groups whose [min,max] stats intersect
    [lo, hi] — what a stats-pruning scan would have to read."""
    match = total = 0
    for fp in glob.glob(path_glob):
        md = pq.ParquetFile(fp).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                match += 1
    return match, total


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order over (l_orderkey, l_partkey): point-range predicates on
    EITHER column must prune most row groups; a single-column sort
    only serves its leading column."""
    from algoritmos_etl_spark.sources.compact import zorder_table

    zdir = str(tmp_path / "lineitem_z")
    sdir = str(tmp_path / "lineitem_s")
    report = zorder_table(
        spark, f"{SF_DIR}/lineitem.parquet", zdir,
        cols=["l_orderkey", "l_partkey"], bits=16, target_files=8,
        row_group_bytes=16 * 1024,
    )
    # baseline: same file AND row-group budget, sorted by l_orderkey only
    compact_table(
        spark, f"{SF_DIR}/lineitem.parquet", sdir,
        target_files=8, sort_within_partitions_by=["l_orderkey"],
        row_group_bytes=16 * 1024,
    )
    src = load_table(spark, SF_DIR, "lineitem")
    assert report["rows"] == src.count()
    back = spark.read.parquet(zdir)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )  # layout pass, not a transformation

    ok_max = int(src.agg(F.max("l_orderkey")).first()[0])
    pk_max = int(src.agg(F.max("l_partkey")).first()[0])
    for col, hi in (("l_orderkey", ok_max), ("l_partkey", pk_max)):
        lo = hi // 2
        width = max(hi // 20, 1)  # a 5%-of-keyspace range predicate
        zm, zt = _rowgroups_matching(f"{zdir}/*.parquet", col, lo, lo + width)
        assert zm < zt, f"z-order gave no pruning on {col}: {zm}/{zt}"
    # and specifically on the SECOND dimension it must beat the
    # single-column sort, which can't prune l_partkey at all
    lo = pk_max // 2
    width = max(pk_max // 20, 1)
    zm, zt = _rowgroups_matching(f"{zdir}/*.parquet", "l_partkey", lo, lo + width)
    sm, st = _rowgroups_matching(f"{sdir}/*.parquet", "l_partkey", lo, lo + width)
    assert zm / zt < sm / st, (
        f"z-order ({zm}/{zt}) should prune l_partkey better than "
        f"leading-column sort ({sm}/{st})"
    )


def test_zorder_value_matches_python_interleave(spark):
    from algoritmos_etl_spark.sources.compact import zorder_value

    def py_z(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.range(0, 300, 7).select(
        F.col("id").alias("a"), (F.col("id") * 13 % 200).alias("b")
    )
    out = df.withColumn("z", zorder_value([F.col("a"), F.col("b")])).collect()
    assert all(r.z == py_z(r.a, r.b) for r in out)
    # Morton keys are unique for distinct (a, b)
    assert len({r.z for r in out}) == len(out)


def test_partition_upsert_touches_only_affected_partitions(spark, tmp_path):
    """Dynamic-partition upsert: updated keys replace, inserts land,
    untouched partitions' FILES are byte-identical and not rewritten."""
    import glob
    import os

    from algoritmos_etl_spark.sources.compact import partition_upsert

    table = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(m, k, float(10 * m + k)) for m in (1, 2, 3) for k in range(5)],
        "month int, k int, v double",
    )
    base.repartition(1).write.partitionBy("month").parquet(table)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{table}/month=*/*.parquet")
    }
    import time as _t

    _t.sleep(1.1)
    updates = spark.createDataFrame(
        [(2, 0, 999.0), (2, 99, 42.0)],  # one replace + one insert, month 2
        "month int, k int, v double",
    )
    rep = partition_upsert(
        spark, table, updates, partition_col="month", key_cols=["month", "k"]
    )
    assert rep["partitions"] == 1 and rep["rows"] == 6
    got = {
        (r.month, r.k): r.v for r in spark.read.parquet(table).collect()
    }
    assert got[(2, 0)] == 999.0 and got[(2, 99)] == 42.0
    assert got[(1, 0)] == 10.0 and len(got) == 16
    # months 1 and 3: same files, same mtimes — never rewritten
    for p, mt in before.items():
        if "month=2" not in p:
            assert os.path.exists(p) and os.path.getmtime(p) == mt, p


def test_write_audit_publish_gates_bad_batches(spark, tmp_path):
    """WAP: a failing expectation must leave the serving table
    untouched (stage kept for debugging); a passing batch publishes
    atomically and the old generation is retired."""
    import os

    from algoritmos_etl_spark.operators import expectations as ex
    from algoritmos_etl_spark.sources.compact import write_audit_publish

    table = str(tmp_path / "t")
    good = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    )
    rules = [ex.not_null("k"), ex.in_range("v", 0, 100)]
    rep = write_audit_publish(good, table, rules)
    assert rep == {"published": True, "rows": 2, "violations": []}
    assert {r.k for r in spark.read.parquet(table).collect()} == {1, 2}

    bad = spark.createDataFrame(
        [(3, 999.0), (None, 5.0)], "k long, v double"
    )
    rep = write_audit_publish(bad, table, rules)
    assert rep["published"] is False
    assert dict(rep["violations"]) == {"not_null(k)": 1, "in_range(v,0,100)": 1}
    # serving table untouched; failed stage kept beside it
    assert {r.k for r in spark.read.parquet(table).collect()} == {1, 2}
    assert os.path.exists(f"{table}._staged")

    # a corrected batch publishes over the old generation
    fixed = spark.createDataFrame([(3, 99.0)], "k long, v double")
    rep = write_audit_publish(fixed, table, rules)
    assert rep["published"] is True
    assert {r.k for r in spark.read.parquet(table).collect()} == {3}
    assert not os.path.exists(f"{table}._retired")


def test_write_audit_publish_recovers_stranded_retired(spark, tmp_path):
    """A publish that crashed between its two renames leaves the
    serving data at <table>._retired and no table_dir; the next
    publish must restore it BEFORE staging, so even a failed audit
    leaves the table serving the pre-crash generation."""
    import os

    from algoritmos_etl_spark.operators import expectations as ex
    from algoritmos_etl_spark.sources.compact import write_audit_publish

    table = str(tmp_path / "t")
    rules = [ex.in_range("v", 0, 100)]
    good = spark.createDataFrame([(1, 10.0)], "k long, v double")
    write_audit_publish(good, table, rules)
    # simulate the crash window: retire done, promote never happened
    os.rename(table, f"{table}._retired")
    assert not os.path.exists(table)

    bad = spark.createDataFrame([(2, 999.0)], "k long, v double")
    rep = write_audit_publish(bad, table, rules)
    assert rep["published"] is False
    # stranded generation recovered and still serving
    assert {r.k for r in spark.read.parquet(table).collect()} == {1}

    fixed = spark.createDataFrame([(2, 20.0)], "k long, v double")
    os.rename(table, f"{table}._retired")  # crash again before the fix
    rep = write_audit_publish(fixed, table, rules)
    assert rep["published"] is True
    assert {r.k for r in spark.read.parquet(table).collect()} == {2}
    assert not os.path.exists(f"{table}._retired")
