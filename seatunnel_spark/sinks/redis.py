"""Redis sink — pipelined RESP writes, per-type verbs + RowKind deletes.

Reference: connector-redis/.../sink/RedisSinkWriter.java (key =
`key` field value / literal / custom {field}:{field} template;
value = `value_field` / `hash_key_field`+`hash_value_field` / whole-row
JSON) and client/RedisSingleClient.java batchWrite* (string SET+EXPIRE
vs DEL; list LPUSH vs LREM; set SADD vs SREM; zset ZADD vs ZREM; hash
HSET map vs HDEL — deletes fire for DELETE and UPDATE_BEFORE kinds).

Spark shape: df.foreachPartition — each executor keeps ONE connection
and pipelines `batch_size` commands per round-trip (send-all/read-all),
the jedis Pipeline.sync() analog.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL

_PLACEHOLDER = re.compile(r"\{(\w+)\}")


def _row_json(doc: dict) -> str:
    return json.dumps({k: v for k, v in doc.items()}, default=str)


def _resolve_key(template: str, doc: dict, custom: bool) -> str:
    """RedisSinkWriter.getKey: plain field-name lookup, else literal;
    custom mode fills {field} placeholders inside :-joined segments."""
    if not custom:
        if template in doc:
            v = doc[template]
            return "" if v is None else str(v)
        return template

    def sub(m):
        name = m.group(1)
        if name in doc:
            v = doc[name]
            return "" if v is None else str(v)
        return m.group(0)

    return _PLACEHOLDER.sub(sub, template)


class RedisSink(Sink):
    NAME = "Redis"
    table_groups = None
    input_name = "sink"

    def wants_observation(self) -> bool:
        return False  # foreachPartition is an RDD action (no observe)

    def write(self, df: DataFrame) -> None:
        if self.table_groups:
            for tid, tdf in self.table_groups.items():
                sub = RedisSink(self.options)
                sub.input_name = tid
                sub.write(tdf)
            return
        from seatunnel_spark.net import apply_host_aliases

        # resolve aliases on the DRIVER; the closure ships the endpoint
        resolved = apply_host_aliases(
            f"tcp://{self.require('host')}:{int(self.require('port'))}")
        hostpart = resolved.split("://", 1)[1]
        host, _, port = hostpart.rpartition(":")
        conn = {
            "host": host, "port": int(port),
            "auth": self.opt("auth"), "user": self.opt("user"),
            "db_num": int(self.opt("db_num", 0)),
        }
        data_type = str(self.opt("data_type", "key")).lower()
        key_tpl = str(self.require("key")).replace(
            "${table_name}", self.input_name.split(".")[-1])
        custom = bool(self.opt("support_custom_key"))
        value_field = self.opt("value_field")
        hash_key_field = self.opt("hash_key_field")
        hash_value_field = self.opt("hash_value_field")
        expire = int(self.opt("expire", -1))
        batch_size = int(self.opt("batch_size", 1024))
        has_kind = ROW_KIND_COL in df.columns
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            from seatunnel_spark.sources.redis import RespClient

            cl = RespClient(**conn)
            cmds: list[tuple] = []

            def flush():
                if cmds:
                    cl.pipeline(cmds)
                    cmds.clear()

            def emit(*c):
                cmds.append(c)
                if len(cmds) >= batch_size:
                    flush()

            try:
                for row in rows:
                    d = row.asDict(recursive=True)
                    kind = d.get(ROW_KIND_COL, "+I") if has_kind else "+I"
                    for c in meta:
                        d.pop(c, None)
                    key = _resolve_key(key_tpl, d, custom)
                    # RedisSinkWriter.getValue
                    if data_type == "hash":
                        if hash_key_field:
                            hk = (str(d.get(hash_key_field, hash_key_field))
                                  if hash_key_field in d else hash_key_field)
                            if hash_value_field:
                                hv = (str(d[hash_value_field])
                                      if hash_value_field in d
                                      else hash_value_field)
                            else:
                                hv = _row_json(d)
                            value = json.dumps({hk: hv})
                        else:
                            value = _row_json(d)
                    elif value_field and value_field in d:
                        v = d[value_field]
                        value = "" if v is None else str(v)
                    else:
                        value = _row_json(d)

                    deleting = kind in ("-D", "-U")
                    if data_type in ("key", "string"):
                        if deleting:
                            emit("DEL", key)
                        else:
                            emit("SET", key, value)
                            if expire > 0:
                                emit("EXPIRE", key, expire)
                    elif data_type == "list":
                        if deleting:
                            emit("LREM", key, 1, value)
                        else:
                            emit("LPUSH", key, value)
                            if expire > 0:
                                emit("EXPIRE", key, expire)
                    elif data_type == "set":
                        if deleting:
                            emit("SREM", key, value)
                        else:
                            emit("SADD", key, value)
                            if expire > 0:
                                emit("EXPIRE", key, expire)
                    elif data_type == "zset":
                        if deleting:
                            emit("ZREM", key, value)
                        else:
                            emit("ZADD", key, 1, value)
                            if expire > 0:
                                emit("EXPIRE", key, expire)
                    elif data_type == "hash":
                        m = json.loads(value)
                        if deleting:
                            for hk in m:
                                emit("HDEL", key, hk)
                        else:
                            for hk, hv in m.items():
                                emit("HSET", key, hk, hv)
                            if expire > 0:
                                emit("EXPIRE", key, expire)
                    else:
                        raise ValueError(
                            f"Redis sink: unsupported data_type {data_type!r}")
                flush()
            finally:
                cl.close()

        df.foreachPartition(write_partition)


__all__ = ["RedisSink"]
