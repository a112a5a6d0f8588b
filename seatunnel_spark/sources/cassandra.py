"""Cassandra source/sink over the CQL native protocol v4
(seatunnel_spark.cql — stdlib sockets, works against any Cassandra).

Reference: connector-cassandra (host, keyspace, username/password,
cql for the source; table + fields + batch_size/batch_type for the
sink; consistency_level).

Spark shape: the source runs the user's CQL once (token-range
splitting would use system.size_estimates — documented extension) and
decodes typed rows; the sink INSERTs per partition in UNLOGGED
batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from seatunnel_spark.cql import CqlConnection
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL, parse_schema

_CONSISTENCY = {"ANY": 0x0000, "ONE": 0x0001, "TWO": 0x0002,
                "THREE": 0x0003, "QUORUM": 0x0004, "ALL": 0x0005,
                "LOCAL_QUORUM": 0x0006, "LOCAL_ONE": 0x000A}

_CQL_TO_DSL = {0x01: "string", 0x02: "bigint", 0x03: "binary",
               0x04: "boolean", 0x07: "double", 0x08: "float",
               0x09: "int", 0x0B: "timestamp", 0x0D: "string",
               0x13: "smallint", 0x14: "tinyint"}


def _host_port(opts) -> tuple[str, int]:
    from seatunnel_spark.net import apply_host_aliases

    host = opts.get("host", "localhost")
    host = host[0] if isinstance(host, list) else str(host).split(",")[0]
    if ":" not in host:
        host = f"{host}:9042"
    resolved = apply_host_aliases(f"tcp://{host}").split("://", 1)[1]
    h, _, p = resolved.rpartition(":")
    return h, int(p)


class CassandraSource(Source):
    NAME = "Cassandra"

    def read(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.sources.mongodb import _convert

        host, port = _host_port(self.options)
        user, pw = self.opt("username"), self.opt("password")
        cql = self.require("cql")
        consistency = _CONSISTENCY.get(
            str(self.opt("consistency_level", "LOCAL_ONE")).upper(), 0x0A)

        cl = CqlConnection(host, port, user, pw)
        try:
            cols, rows = cl.query(cql, consistency)
        finally:
            cl.close()
        fields = (self.opt("schema") or {}).get("fields")
        if fields:
            schema = parse_schema(fields)
        else:
            schema = parse_schema({n: _CQL_TO_DSL.get(t, "string")
                                   for n, t in cols})
        idx = {n: i for i, (n, _t) in enumerate(cols)}
        data = [tuple(_convert(r[idx[f.name]] if f.name in idx else None,
                               f.dataType) for f in schema.fields)
                for r in rows]
        return spark.createDataFrame(data, schema)


def _cql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    if hasattr(v, "isoformat"):
        return f"'{v.isoformat(sep=' ')}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


class CassandraSink(Sink):
    NAME = "Cassandra"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        host, port = _host_port(self.options)
        user, pw = self.opt("username"), self.opt("password")
        keyspace = self.require("keyspace")
        table = self.require("table")
        field_list = self.opt("fields")
        batch_size = int(self.opt("batch_size", 500))
        batch_type = str(self.opt("batch_type", "UNLOGGED")).upper()
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            cl = CqlConnection(host, port, user, pw)
            stmts: list[str] = []

            def flush():
                if not stmts:
                    return
                if len(stmts) == 1:
                    cl.query(stmts[0])
                else:
                    cl.query(f"BEGIN {batch_type} BATCH "
                             + " ".join(s + ";" for s in stmts)
                             + " APPLY BATCH")
                stmts.clear()

            try:
                for row in rows:
                    d = row.asDict(recursive=True)
                    for c in meta:
                        d.pop(c, None)
                    if field_list:
                        d = {k: d[k] for k in field_list if k in d}
                    cols = ", ".join(d.keys())
                    vals = ", ".join(_cql_lit(v) for v in d.values())
                    stmts.append(f"INSERT INTO {keyspace}.{table} "
                                 f"({cols}) VALUES ({vals})")
                    if len(stmts) >= batch_size:
                        flush()
                flush()
            finally:
                cl.close()

        df.foreachPartition(write_partition)


__all__ = ["CassandraSource", "CassandraSink"]
