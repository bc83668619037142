"""Parity + A/B for the r12 single-pass conversion of the loki / OTLP-logs /
OTLP-traces parsers (the same fix as tools/ab_otlp_r12.py applied to the
three remaining good/bad-branch-union parsers, each of which re-ran the
scan + from_json on both union sides — 2 parses per payload).

The OLD forms are loaded verbatim from git (`OLD_REF`, the commit before the
conversion) so nothing is hand-copied. Parity = exact row-multiset equality
on the real q92/q95/q98 payload streams plus edge corpora.
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from greptimedb_spark.session import get_spark  # noqa: E402
from greptimedb_spark.sources import protocols as new_proto  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OLD_REF = os.environ.get("AB_OLD_REF", "ca7d765")


def _load_old_protocols():
    src = subprocess.check_output(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "show", f"{OLD_REF}:greptimedb_spark/sources/protocols.py"],
        text=True)
    spec = importlib.util.spec_from_loader("old_protocols", loader=None)
    mod = importlib.util.module_from_spec(spec)
    exec(compile(src, "old_protocols.py", "exec"), mod.__dict__)
    return mod


LOKI_EDGE = [
    '{"streams":[{"stream":{"app":"x"},"values":[["1700000000000000000","l1"],'
    '["zap","bad ts"]]},'
    '{"stream":{},"values":[]},{"values":[["1700000000000000002","no labels"]]}]}',
    '{"streams":[]}',
    "junk",
    '{"notstreams":1}',
]
# truncated value pairs ([] / [ts-only]): the OLD union form crashed the job
# (ANSI element_at out-of-bounds) — the parser contract is to quarantine bad
# input, so the new F.get form returning NULLs is checked separately, not
# for parity.
LOKI_TRUNCATED = (
    '{"streams":[{"stream":{"app":"x"},"values":[[],'
    '["1700000000000000001"]]}]}'
)
LOGS_EDGE = [
    '{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name",'
    '"value":{"stringValue":"app"}}]},"scopeLogs":[{"scope":{"name":"lib",'
    '"version":"1.0"},"logRecords":[{"timeUnixNano":"1663840496000000000",'
    '"severityNumber":9,"severityText":"INFO","body":{"stringValue":"hello"},'
    '"attributes":[{"key":"k","value":{"stringValue":"v"}}],'
    '"traceId":"0af7","spanId":"b7ad"},{"timeUnixNano":"0",'
    '"observedTimeUnixNano":"1663840497000000000",'
    '"body":{"stringValue":"fallback"}},{"timeUnixNano":"nope"}]}]}]}',
    '{"resourceLogs":[{"scopeLogs":[{"logRecords":[]}]}]}',
    '{"resourceLogs":[{"scopeLogs":[]}]}',
    '{"resourceLogs":[]}',
    "[oops",
]
TRACES_EDGE = [
    '{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name",'
    '"value":{"stringValue":"svc"}}]},"scopeSpans":[{"scope":{"name":"sc"},'
    '"spans":[{"traceId":"t1","spanId":"s1","name":"op",'
    '"kind":"SPAN_KIND_SERVER","startTimeUnixNano":"1700000000000000000",'
    '"endTimeUnixNano":"1700000000000001000","status":{"code":"STATUS_CODE_OK"}},'
    '{"traceId":"t2","spanId":"s2","name":"nostart"}]}]}]}',
    '{"resourceSpans":[{"scopeSpans":[{"spans":[]}]}]}',
    '{"resourceSpans":[]}',
    "zap",
]


def _q92_payloads(spark):
    # the exact q92 payload stream shape (surfaces_q.q92_loki_ingest)
    from greptimedb_spark.queries import read

    e = read(spark, SF, "events")
    return e.select(F.format_string(
        '{"streams":[{"stream":{"source":"app","event_type":"%s"},'
        '"values":[["%d","evt %d val %s"]]}]}',
        "event_type", F.unix_micros("ts") * 1000, "event_id",
        F.col("value").cast("string")).alias("payload"))


def _norm(rows):
    out = []
    for r in rows:
        d = r.asDict()
        for k, v in list(d.items()):
            if isinstance(v, dict):
                d[k] = tuple(sorted(v.items()))
        out.append(tuple(sorted(d.items(), key=lambda kv: kv[0])))
    return sorted(map(repr, out))


def main():
    old_proto = _load_old_protocols()
    spark = get_spark()
    import __spark_entry__ as entry

    qs = entry.queries()
    cases = [
        ("loki-edge", "parse_loki_push",
         spark.createDataFrame([(p,) for p in LOKI_EDGE], "payload string")),
        ("logs-edge", "parse_otlp_logs_json",
         spark.createDataFrame([(p,) for p in LOGS_EDGE], "payload string")),
        ("traces-edge", "parse_otlp_traces_json",
         spark.createDataFrame([(p,) for p in TRACES_EDGE], "payload string")),
        ("q92-stream", "parse_loki_push", _q92_payloads(spark)),
    ]
    for name, fn, df in cases:
        old = _norm(getattr(old_proto, fn)(df).collect())
        new = _norm(getattr(new_proto, fn)(df).collect())
        assert old == new, (
            f"{name}: parity FAILED ({len(old)} vs {len(new)}); first diff: "
            f"{next((a, b) for a, b in zip(old + ['<end>'], new + ['<end>']) if a != b)}")
        print(f"{name}: parity ok on {len(old)} rows")

    # truncated pairs: new form must not crash (old form raised ANSI
    # element_at OOB)
    trunc = new_proto.parse_loki_push(
        spark.createDataFrame([(LOKI_TRUNCATED,)], "payload string")).collect()
    assert len(trunc) == 2 and all(r["line"] is None for r in trunc)
    print("loki-truncated: new form tolerates truncated pairs "
          f"({len(trunc)} rows, no crash)")

    # interleaved wall A/B through the declared queries (new code) vs the
    # same query shape with the old parser monkeypatched in
    import greptimedb_spark.sources.protocols as proto_mod

    for qname, fn in (("q92_loki_ingest", "parse_loki_push"),
                      ("q95_otlp_logs_ingest", "parse_otlp_logs_json"),
                      ("q98_otlp_traces_ingest", "parse_otlp_traces_json")):
        times = {"old": [], "new": []}
        new_fn = getattr(new_proto, fn)
        old_fn = getattr(old_proto, fn)
        for rep in range(4):
            for label, impl in (("old", old_fn), ("new", new_fn)):
                setattr(proto_mod, fn, impl)
                try:
                    df = qs[qname](spark, SF)
                    spark.sparkContext.setJobDescription(f"{qname} {label} rep{rep}")
                    t0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    times[label].append(round(time.time() - t0, 3))
                finally:
                    setattr(proto_mod, fn, new_fn)
        print(f"{qname}: old={times['old']} new={times['new']}")
    spark.stop()


if __name__ == "__main__":
    main()
