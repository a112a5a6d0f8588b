"""Reference paimon-e2e confs unmodified against the versioned-parquet
lakehouse backend (PaimonSinkCDCIT / PaimonIT analogs, local warehouse).

CDC cases are checked against a GENERIC ground truth computed from the
conf's own FakeSource rows: apply +I/-U/+U/-D per primary key in order
(the paimon primary-key-table contract), then the read-back table must
equal the final state exactly."""

import os
import shutil

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sources import get_source

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-paimon-e2e/src/test/resources")


def _sink_block(spec):
    return next(b for b in spec.sinks if b.plugin.lower() == "paimon")


def _layout(opts):
    wh = str(opts["warehouse"]).replace("file://", "")
    return wh, str(opts.get("database", "default")), str(opts["table"])


def _clean(opts):
    wh, db, table = _layout(opts)
    shutil.rmtree(os.path.join(wh, db, table), ignore_errors=True)


def _read_back(spark, opts):
    wh, db, table = _layout(opts)
    return get_source("Paimon", {
        "warehouse": wh, "database": db, "table": table}).read(spark)


def _field_names(schema_opt):
    if "fields" in schema_opt:
        return list(schema_opt["fields"].keys())
    return [c["name"] for c in schema_opt.get("columns", [])]


def _canon(v):
    """Comparable form for conf literals vs read-back values:
    timestamps normalize to a 6-digit (micro) fraction — Spark
    timestamps are micros, conf literals write 0/3/9 digits."""
    import datetime
    import decimal
    import re

    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        # conf literals carry bytes base64-encoded
        import base64

        return base64.b64encode(bytes(v)).decode()
    if isinstance(v, decimal.Decimal):
        if abs(v) < 10 ** 15:  # conf wrote a float literal
            return round(float(v), 4)
        s = format(v, "f")
        return s.rstrip("0").rstrip(".") if "." in s else s
    if isinstance(v, str) and re.fullmatch(r"-?\d+\.\d+", v) and len(v) > 15:
        # high-precision decimal literal (beats float range) — compare
        # in the same trailing-zero-stripped plain form
        return v.rstrip("0").rstrip(".")
    if isinstance(v, float):
        # float32 round-trips widen (4.3 -> 4.30000019...)
        return round(v, 4)
    if isinstance(v, datetime.datetime):
        v = v.isoformat()
    elif isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, str) and re.match(r"\d{4}-\d{2}-\d{2}T\d{2}:", v):
        base, _, frac = v.partition(".")
        frac = (frac + "000000")[:6]
        return base if frac == "000000" else f"{base}.{frac}"
    return v


def _ground_truth(rows, pks, fields):
    state = {}
    for r in rows:
        kind = str(r.get("kind", "INSERT")).upper()
        vals = dict(zip(fields, r["fields"]))
        key = tuple(vals[k] for k in pks)
        if kind in ("INSERT", "UPDATE_AFTER"):
            state[key] = tuple(_canon(vals[c]) for c in fields)
        elif kind in ("DELETE", "UPDATE_BEFORE"):
            # UPDATE_BEFORE deletes its (possibly different) key — a
            # pk-changing update must drop the old row
            state.pop(key, None)
    return set(state.values())


_CDC_CASES = [f"fake_cdc_sink_paimon_case{i}.conf" for i in range(1, 11)] + [
    "fake_cdc_to_dynamic_bucket_paimon_case.conf",
    "fake_to_paimon_with_full_type_cdc_data.conf",
]


def _iter_table_cases(spec):
    """(per-table source config, resolved sink opts) pairs — handles
    both plain schema confs and multi-table tables_configs with
    ${database_name}/${table_name} sink placeholders."""
    src = spec.sources[0].options
    sink = _sink_block(spec).options
    tcs = src.get("tables_configs")
    if not tcs:
        yield src, sink
        return
    for tc in tcs:
        tid = str(tc["schema"]["table"])
        parts = tid.split(".")
        db = str(sink.get("database", "default")).replace(
            "${database_name}", parts[-2] if len(parts) > 1 else "default")
        table = str(sink.get("table", "")).replace(
            "${table_name}", parts[-1]) or parts[-1]
        yield tc, {**sink, "database": db, "table": table}


def _check_table_case(spark, conf, src, sink):
    out = _read_back(spark, sink)
    fields = _field_names(src["schema"])
    rows = src.get("rows")
    pks = (src["schema"].get("primaryKey") or {}).get("columnNames") \
        or (str(sink.get("paimon.table.primary-keys", "")).split(",")
            if sink.get("paimon.table.primary-keys") else None)
    collected = out.collect()
    got = {tuple(_canon(r[c]) for c in fields) for r in collected}
    if rows and pks:
        assert got == _ground_truth(rows, [str(k) for k in pks], fields), conf
    elif rows:
        assert len(collected) == len(
            [r for r in rows
             if str(r.get("kind", "INSERT")).upper() != "UPDATE_BEFORE"]), conf
    else:
        assert len(collected) == int(src.get("row.num", 0)), conf


@pytest.mark.parametrize("conf", _CDC_CASES)
def test_paimon_cdc_conf_matches_ground_truth(spark, conf):
    spec = JobSpec.from_file(f"{_RES}/{conf}")
    for src, sink in _iter_table_cases(spec):
        _clean(sink)
    JobEngine(spark).run(spec)
    for src, sink in _iter_table_cases(spec):
        _check_table_case(spark, conf, src, sink)


# case5 targets an hdfs:// warehouse — no HDFS in this environment
# (same exclusion as the *_with_hdfs/_hive/_s3 confs)
_DYN_CASES = [f"fake_to_dynamic_bucket_paimon_case{i}.conf"
              for i in range(1, 8) if i != 5]


@pytest.mark.parametrize("conf", _DYN_CASES)
def test_paimon_dynamic_bucket_confs(spark, conf):
    spec = JobSpec.from_file(f"{_RES}/{conf}")
    src = spec.sources[0].options
    sink = _sink_block(spec).options
    _clean(sink)
    JobEngine(spark).run(spec)
    out = _read_back(spark, sink)
    fields = _field_names(src["schema"])
    rows = src.get("rows")
    pks = (src["schema"].get("primaryKey") or {}).get("columnNames")
    if rows and pks:
        got = {tuple(_canon(r[c]) for c in fields) for r in out.collect()}
        assert got == _ground_truth(rows, [str(k) for k in pks], fields), conf
    elif rows:
        assert out.count() > 0
    else:
        assert out.count() == int(src.get("row.num", 0)), conf


def test_paimon_write_then_read_assert_confs(spark):
    """fake_to_paimon.conf (100k generated rows) then the read-side
    suite: paimon_to_assert (row counts + field rules), projection
    (column-pruned query), filter1-4 (predicate queries), and
    paimon_to_paimon (table copy)."""
    spec = JobSpec.from_file(f"{_RES}/fake_to_paimon.conf")
    sink = _sink_block(spec).options
    _clean(sink)
    JobEngine(spark).run(spec)
    assert _read_back(spark, sink).count() == 100000
    for conf in ("paimon_to_assert.conf",
                 "paimon_projection_to_assert.conf"):
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))
    # paimon_to_paimon.conf is job.mode=Streaming (PaimonStreamReadIT's
    # continuous snapshot tailing) — the versioned-parquet backend is
    # batch-only; out of scope here.


def test_paimon_full_type_and_filters(spark):
    """PaimonSinkCDCIT.testFakeSinkPaimonWithFullTypeAndReadWithFilter:
    the full-type changelog (upserts on key 118, a pk-stable -U/+U on
    116, a DELETE of 120) lands, then the four filter confs assert
    exact predicate-read counts (MIN_ROW/MAX_ROW) over the final
    4-row state."""
    s1 = JobSpec.from_file(f"{_RES}/fake_to_paimon_with_full_type.conf")
    sink = _sink_block(s1).options
    _clean(sink)
    JobEngine(spark).run(s1)
    src1 = s1.sources[0].options
    fields = _field_names(src1["schema"])
    pks = [str(k) for k in
           (src1["schema"].get("primaryKey") or {}).get("columnNames")]
    want = _ground_truth(src1.get("rows") or [], pks, fields)
    got = {tuple(_canon(r[c]) for c in fields)
           for r in _read_back(spark, sink).collect()}
    assert got == want
    for i in (1, 2, 3, 4):
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/paimon_to_assert_with_filter{i}.conf"))


def test_paimon_truncate_confs(spark):
    """truncate_with_local case1 (append) then case2 (DROP_DATA
    truncates before writing) — final table holds only case2's rows."""
    s1 = JobSpec.from_file(
        f"{_RES}/fake_sink_paimon_truncate_with_local_case1.conf")
    sink = _sink_block(s1).options
    _clean(sink)
    JobEngine(spark).run(s1)
    n1 = _read_back(spark, sink).count()
    assert n1 > 0
    s2 = JobSpec.from_file(
        f"{_RES}/fake_sink_paimon_truncate_with_local_case2.conf")
    JobEngine(spark).run(s2)
    src2 = s2.sources[0].options
    n2 = _read_back(spark, _sink_block(s2).options).count()
    expected2 = (len(src2["rows"]) if src2.get("rows")
                 else int(src2.get("row.num", 0)))
    assert n2 == expected2, "DROP_DATA must truncate case1's rows"


def test_paimon_timestamp_scales_conf(spark):
    """case7 writes timestamps at scales 0/3/6/9 (micros ceiling),
    then paimon_to_assert_with_timestampN.conf reads namespace7 back
    with NOT_NULL rules on every scale column and exact row counts."""
    spec = JobSpec.from_file(f"{_RES}/fake_cdc_sink_paimon_case7.conf")
    for _src, sink in _iter_table_cases(spec):
        _clean(sink)
    JobEngine(spark).run(spec)
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/paimon_to_assert_with_timestampN.conf"))


def test_paimon_incompatible_schema_conf_fails(spark):
    """PaimonSinkCDCIT.testSinkWithIncompatibleSchema: case1 creates
    the table with name STRING; the error-schema conf then writes
    name INT into it and must fail (the IT asserts exit code 1)."""
    spec = JobSpec.from_file(f"{_RES}/fake_cdc_sink_paimon_case1.conf")
    for _src, sink in _iter_table_cases(spec):
        _clean(sink)
    JobEngine(spark).run(spec)
    with pytest.raises(Exception, match="[Ii]ncompatible|check schema"):
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/fake_cdc_sink_paimon_case1_with_error_schema.conf"))
