"""psql `\\d <table>` introspection against the pg_catalog emulation.

Drives the (slightly trimmed) query sequence psql 16 issues for `\\d foo`
— resolve the relation, list columns, list indexes — over the shim views
(__pg_class_full / __pg_attribute / __pg_index / __pg_constraint / __pg_am)
and renders a table description from the results. Reference analog:
src/common/function/src/system/pg_catalog.rs:375 (the reference serves the
same join set through datafusion-postgres).

Trimmed vs verbatim psql: the column query drops psql's pg_collation
correlated subquery and the attidentity/attgenerated decorations (no
collations or identity columns exist in this engine); the structural joins
and filters are psql's own.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def g(spark, tmp_path_factory):
    from greptimedb_spark.catalog import Catalog
    from greptimedb_spark.sql import GreptimeSQL

    g = GreptimeSQL(spark, catalog=Catalog(
        spark, str(tmp_path_factory.mktemp("psql_describe_cat"))))
    g.protocol = "postgres"
    g.sql("CREATE TABLE metrics (host STRING, env STRING, val DOUBLE, "
          "ts TIMESTAMP TIME INDEX, PRIMARY KEY (host, env))")
    return g


def test_psql_describe_table(g):
    # 1. resolve: psql's exact relation lookup (OPERATOR(pg_catalog.~) +
    # COLLATE + pg_table_is_visible)
    res = g.sql("""
        SELECT c.oid, n.nspname, c.relname
        FROM pg_catalog.pg_class c
             LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
        WHERE c.relname OPERATOR(pg_catalog.~) '^(metrics)$' COLLATE pg_catalog.default
          AND pg_catalog.pg_table_is_visible(c.oid)
        ORDER BY 2, 3
    """).collect()
    assert len(res) == 1
    oid, nsp, rel = res[0]
    assert rel == "metrics"

    # 2. relation header info (psql's pg_class + pg_am join)
    info = g.sql(f"""
        SELECT c.relchecks, c.relkind, c.relhasindex, c.relpersistence,
               c.relreplident, am.amname
        FROM pg_catalog.pg_class c
             LEFT JOIN pg_catalog.pg_am am ON (c.relam = am.oid)
        WHERE c.oid = {oid}
    """).collect()
    assert len(info) == 1
    assert info[0]["relkind"] == "r"
    assert info[0]["relhasindex"] is True
    assert info[0]["amname"] == "heap"

    # 3. columns: format_type + attnotnull + the pg_attrdef default subquery
    cols = g.sql(f"""
        SELECT a.attname,
               pg_catalog.format_type(a.atttypid, a.atttypmod) AS coltype,
               (SELECT pg_catalog.pg_get_expr(d.adbin, d.adrelid, true)
                FROM pg_catalog.pg_attrdef d
                WHERE d.adrelid = a.attrelid AND d.adnum = a.attnum) AS coldefault,
               a.attnotnull
        FROM pg_catalog.pg_attribute a
        WHERE a.attrelid = {oid} AND a.attnum > 0 AND NOT a.attisdropped
        ORDER BY a.attnum
    """).collect()
    got = [(r["attname"], r["coltype"], r["attnotnull"]) for r in cols]
    assert got == [
        ("host", "text", False),
        ("env", "text", False),
        ("val", "double precision", False),
        ("ts", "timestamp without time zone", True),
    ]
    assert all(r["coldefault"] is None for r in cols)

    # 4. indexes: psql's three-way pg_class x pg_class x pg_index join with
    # the pg_constraint LEFT JOIN (verbatim psql 16 text)
    idx = g.sql(f"""
        SELECT c2.relname, i.indisprimary, i.indisunique, i.indisclustered,
               i.indisvalid, pg_catalog.pg_get_indexdef(i.indexrelid, 0, true),
               pg_catalog.pg_get_constraintdef(con.oid, true) AS condef,
               contype, condeferrable, condeferred, i.indisreplident,
               c2.reltablespace
        FROM pg_catalog.pg_class c, pg_catalog.pg_class c2,
             pg_catalog.pg_index i
          LEFT JOIN pg_catalog.pg_constraint con
            ON (conrelid = i.indrelid AND conindid = i.indexrelid
                AND contype IN ('p','u','x'))
        WHERE c.oid = {oid} AND c.oid = i.indrelid AND i.indexrelid = c2.oid
        ORDER BY i.indisprimary DESC, c2.relname
    """).collect()
    assert len(idx) == 1
    assert idx[0]["relname"] == "metrics_pkey"
    assert idx[0]["indisprimary"] is True and idx[0]["indisunique"] is True
    assert idx[0]["contype"] == "p"
    assert idx[0]["condef"] == "PRIMARY KEY (host, env, ts)"

    # 5. render the \d description the way psql lays it out
    lines = ['                 Table "public.metrics"']
    lines.append(" Column |            Type             | Nullable ")
    lines.append("--------+-----------------------------+----------")
    for name, ty, notnull in got:
        lines.append(f" {name:<6} | {ty:<27} | {'not null' if notnull else '':<8} ")
    lines.append("Indexes:")
    lines.append(f'    "{idx[0]["relname"]}" {idx[0]["condef"]}')
    desc = "\n".join(lines)
    assert 'Table "public.metrics"' in desc
    assert '"metrics_pkey" PRIMARY KEY (host, env, ts)' in desc


def test_bare_pg_class_stays_table_only(g):
    """Index rels must NOT leak into bare pg_class listings (the reference's
    pg_class has no index rows — pg_catalog.result relname goldens)."""
    rows = g.sql("select relname from pg_catalog.pg_class").collect()
    names = {r[0] for r in rows}
    assert "metrics" in names
    assert not any(n.endswith("_pkey") for n in names)


def test_cursor_lifecycle(g):
    """DECLARE/FETCH/CLOSE (reference statement.rs:155-159, executor
    operator/statement/cursor.rs): fetch in chunks, fetch-past-end yields
    an empty set with the cursor's schema, CLOSE is idempotent."""
    g.sql("CREATE TABLE cur_t (ts TIMESTAMP TIME INDEX, n BIGINT)")
    g.sql("INSERT INTO cur_t VALUES (0,0),(1,1),(2,2),(3,3),(4,4)")
    g.sql("DECLARE c1 CURSOR FOR SELECT n FROM cur_t ORDER BY n")
    first = g.sql("FETCH 2 FROM c1")
    assert [r.n for r in first.collect()] == [0, 1]
    # IN is an accepted synonym of FROM (cursor_parser.rs:73)
    assert [r.n for r in g.sql("FETCH 2 IN c1").collect()] == [2, 3]
    # exhaust: fewer rows than requested at the tail
    assert [r.n for r in g.sql("FETCH 10 FROM c1").collect()] == [4]
    # fetch-past-end: empty result, schema intact
    past = g.sql("FETCH 5 FROM c1")
    assert past.count() == 0 and past.columns == ["n"]
    g.sql("CLOSE c1")
    g.sql("CLOSE c1")  # remove_cursor is idempotent (cursor.rs:92-99)
    with pytest.raises(ValueError, match="not found"):
        g.sql("FETCH 1 FROM c1")


def test_cursor_errors_and_kill(g):
    g.sql("DECLARE c2 CURSOR FOR SELECT 1 AS one")
    # duplicate name rejected (CursorExistsSnafu, cursor.rs:37-42)
    with pytest.raises(ValueError, match="exists"):
        g.sql("DECLARE c2 CURSOR FOR SELECT 2 AS two")
    # unquoted cursor names canonicalize to lowercase, so C2 == c2
    assert [r.one for r in g.sql("FETCH 1 FROM C2").collect()] == [1]
    g.sql("CLOSE c2")
    # non-SELECT body rejected up front (cursor_parser.rs:44-49)
    with pytest.raises(ValueError, match="Expect select query"):
        g.sql("DECLARE c3 CURSOR FOR SHOW TABLES")
    # KILL parses and acks without a result set (statement.rs:161)
    for stmt in ("KILL '12345-abc'", "KILL QUERY 7"):
        out = g.sql(stmt)
        assert out is None or out.count() == 0
