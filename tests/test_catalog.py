"""Merge-view semantics: LastRow vs LastNonNull vs append mode.

Mirrors the reference's dedup reader behavior (src/mito2/src/read/dedup.rs)
via the sensor_sparse fixture shape from FIXTURES.md §5.
"""

import datetime as dt

import pytest

from greptimedb_spark.catalog import Catalog, TableMeta

TS = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path))


def _mk_rows():
    # (ts, sensor_id, temperature, humidity) written in three batches; the
    # same (sensor, ts) key gets partial overwrites.
    b1 = [(TS(0), "s1", 20.0, 50.0), (TS(0), "s2", 21.0, None), (TS(1), "s1", 22.0, 52.0)]
    b2 = [(TS(0), "s1", None, 55.0)]  # overwrite humidity only
    b3 = [(TS(0), "s2", 25.0, None)]  # overwrite temperature only
    return b1, b2, b3


SCHEMA = "ts timestamp, sensor_id string, temperature double, humidity double"


def _write(cat, spark, mode):
    meta = TableMeta(name=f"sensor_{mode}", time_index="ts", tags=["sensor_id"], merge_mode=mode)
    cat.create_table(meta)
    for batch in _mk_rows():
        cat.insert(meta.name, spark.createDataFrame(batch, SCHEMA))
    return meta.name


def test_last_row(cat, spark):
    name = _write(cat, spark, "last_row")
    rows = {(r.sensor_id, r.ts.second): (r.temperature, r.humidity) for r in cat.read(name).collect()}
    assert rows[("s1", 0)] == (None, 55.0)  # whole-row last-write-wins
    assert rows[("s2", 0)] == (25.0, None)
    assert rows[("s1", 1)] == (22.0, 52.0)
    assert len(rows) == 3


def test_last_non_null(cat, spark):
    name = _write(cat, spark, "last_non_null")
    rows = {(r.sensor_id, r.ts.second): (r.temperature, r.humidity) for r in cat.read(name).collect()}
    assert rows[("s1", 0)] == (20.0, 55.0)  # per-field last non-null
    assert rows[("s2", 0)] == (25.0, None)  # humidity never written non-null
    assert len(rows) == 3


def test_append_mode(cat, spark):
    meta = TableMeta(name="logs", time_index="ts", tags=["sensor_id"], append_mode=True)
    cat.create_table(meta)
    for batch in _mk_rows():
        cat.insert(meta.name, spark.createDataFrame(batch, SCHEMA))
    assert cat.read(meta.name).count() == 5  # no dedup


def test_compact_preserves_merge(cat, spark):
    name = _write(cat, spark, "last_non_null")
    before = sorted(map(tuple, cat.read(name).collect()))
    cat.compact(name)
    after = sorted(map(tuple, cat.read(name).collect()))
    assert before == after


def test_ttl(cat, spark):
    meta = TableMeta(name="ttl_t", time_index="ts", tags=["sensor_id"], ttl="1 HOUR")
    cat.create_table(meta)
    cat.insert(meta.name, spark.createDataFrame(_mk_rows()[0], SCHEMA))
    # TTL expires at flush/compaction, not at read (reference semantics)
    assert cat.read(meta.name).count() == 3
    assert cat.read(meta.name, at="2024-01-01 00:30:00").count() == 3
    cat.flush_table(meta.name)
    assert cat.read(meta.name).count() == 0  # 2024 data long expired


def test_read_series_ordering(cat, spark):
    name = _write(cat, spark, "last_row")
    df = cat.read_series(name)

    def check_sorted(it):
        rows = list(it)
        keys = [(r.sensor_id, r.ts) for r in rows]
        assert keys == sorted(keys)
        yield from []

    df.rdd.mapPartitions(lambda it: check_sorted(it)).count()  # raises if unsorted
    assert df.count() == 3


def test_lazy_cast_drop_readd_no_resurrection(spark, tmp_path):
    """A column dropped AFTER type modifications must not resurrect its old
    generations when a same-named column is re-added."""
    from greptimedb_spark.catalog import Catalog, TableMeta

    cat = Catalog(spark, str(tmp_path / "lazycast"))
    cat.create_table(TableMeta(
        name="lz", time_index="ts", tags=[],
        columns=[["ts", "timestamp", "timestamp(3)", None, True],
                 ["v", "double", "double", None, False]]))
    df = spark.createDataFrame([(1000, 0.1), (2000, 7.5)], "t long, v double") \
        .selectExpr("timestamp_millis(t) AS ts", "v")
    cat.insert("lz", df)
    # modify double -> string: stored f64 re-renders as its decimal text
    cat.modify_column("lz", "v", "string", "STRING")
    got = {r.v for r in cat.read("lz").collect()}
    assert got == {"0.1", "7.5"}
    # drop, re-add as int: old generations must stay invisible
    cat.drop_column("lz", "v")
    meta = cat.meta("lz")
    cat._update_meta("lz", columns=meta.columns + [["v", "int", "INT", None, False]])
    got = [r.v for r in cat.read("lz").collect()]
    assert got == [None, None]
    # new writes land in the fresh generation and render normally
    df2 = spark.createDataFrame([(3000, 42)], "t long, v int") \
        .selectExpr("timestamp_millis(t) AS ts", "v")
    cat.insert("lz", df2)
    got = {r.v for r in cat.read("lz").collect()}
    assert got == {None, 42}


def test_drop_readd_never_modified_no_resurrection(spark, tmp_path):
    """Dropping a NEVER-modified column then re-adding the same name must not
    resurrect the old stored values (reference: re-add gets a fresh column
    id). Regression: the drop sentinel used to be recorded only for columns
    that already had col_history."""
    from greptimedb_spark.catalog import Catalog, TableMeta

    cat = Catalog(spark, str(tmp_path / "dropreadd"))
    cat.create_table(TableMeta(
        name="dr", time_index="ts", tags=[],
        columns=[["ts", "timestamp", "timestamp(3)", None, True],
                 ["v", "double", "double", None, False]]))
    df = spark.createDataFrame([(1000, 0.5), (2000, 7.5)], "t long, v double") \
        .selectExpr("timestamp_millis(t) AS ts", "v")
    cat.insert("dr", df)
    cat.drop_column("dr", "v")
    meta = cat.meta("dr")
    cat._update_meta("dr", columns=meta.columns + [["v", "double", "DOUBLE", None, False]])
    assert [r.v for r in cat.read("dr").collect()] == [None, None]
    # new writes land in the fresh generation
    df2 = spark.createDataFrame([(3000, 9.0)], "t long, v double") \
        .selectExpr("timestamp_millis(t) AS ts", "v")
    cat.insert("dr", df2)
    assert {r.v for r in cat.read("dr").collect()} == {None, 9.0}
