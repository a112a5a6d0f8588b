"""Elasticsearch sink — distributed `_bulk` writes.

Semantic parity with the reference connector
(connector-elasticsearch/.../sink/ElasticsearchSinkWriter.java,
serialize/ElasticsearchRowSerializer.java, serialize/KeyExtractor.java,
serialize/index/impl/VariableIndexSerializer.java, config/SinkConfig
.java): primary_keys + key_delimiter -> document _id; +I/+U rows become
`index` (no key) or `update ... doc_as_upsert` (keyed) actions, -U/-D
become `delete`; `${field}` placeholders in the index name resolve per
row and the result is lowercased; max_batch_size bounds each bulk body
and max_retry_count re-posts a failed bulk; schema_save_mode /
data_save_mode run once, driver-side, before the write (sink/
ElasticsearchSink.java SaveModeHandler).

Spark shape: the bulk POSTs happen inside df.foreachPartition — every
executor streams its partition directly to ES, nothing funnels through
the driver; streaming reuses the same write via foreachBatch with the
engine's batch-id ledger (exactly-once replay no-op).
"""

from __future__ import annotations

import base64
import datetime as _dt
import decimal
import json
import re
import time

from pyspark.sql import DataFrame, types as T

from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.elasticsearch import EsClient
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL

# Spark type -> ES mapping type (reverse of EsTypeMappingSeaTunnelType)
def _es_type(dt: T.DataType) -> dict:
    if isinstance(dt, (T.StringType, T.NullType)):
        return {"type": "keyword"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, T.ByteType):
        return {"type": "byte"}
    if isinstance(dt, T.ShortType):
        return {"type": "short"}
    if isinstance(dt, T.IntegerType):
        return {"type": "integer"}
    if isinstance(dt, T.LongType):
        return {"type": "long"}
    if isinstance(dt, T.FloatType):
        return {"type": "float"}
    if isinstance(dt, (T.DoubleType, T.DecimalType)):
        return {"type": "double"}
    if isinstance(dt, (T.TimestampType, T.DateType)):
        return {"type": "date"}
    if isinstance(dt, T.BinaryType):
        return {"type": "binary"}
    if isinstance(dt, T.ArrayType):
        return _es_type(dt.elementType)  # ES arrays are untyped
    if isinstance(dt, T.StructType):
        return {"properties": {f.name: _es_type(f.dataType) for f in dt.fields}}
    return {"type": "keyword"}


def _jsonable(v):
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def _key_of(doc: dict, primary_keys, delimiter: str):
    """KeyExtractor.java: join PK field values with key_delimiter."""
    if not primary_keys:
        return None
    return delimiter.join("null" if doc.get(k) is None else str(doc[k])
                          for k in primary_keys)


_VAR = re.compile(r"\$\{([A-Za-z0-9_]+)\}")


def _resolve_index(template: str, doc: dict) -> str:
    """VariableIndexSerializer.java:48-58 — per-row ${field} fill,
    'null' for missing values, lowercased result."""
    def sub(m):
        v = doc.get(m.group(1))
        return "null" if v is None else str(v)
    return _VAR.sub(sub, template).lower()


def _bulk_lines(doc: dict, kind: str, index: str, primary_keys,
                delimiter: str) -> str:
    """ElasticsearchRowSerializer.java:69-165 action shapes."""
    key = _key_of(doc, primary_keys, delimiter)
    if kind in ("-U", "-D"):
        if key is None:
            raise ValueError("Elasticsearch sink: delete/update-before rows "
                             "require primary_keys")
        return json.dumps({"delete": {"_index": index, "_id": key}})
    body = json.dumps(doc)
    if key is None:
        return json.dumps({"index": {"_index": index}}) + "\n" + body
    meta = json.dumps({"update": {"_index": index, "_id": key}})
    return meta + "\n" + json.dumps({"doc": doc, "doc_as_upsert": True})


class EsSink(Sink):
    NAME = "Elasticsearch"

    input_name = "sink"  # ${table_name} fallback, set by the engine
    table_groups = None  # per-table frames, set by the engine

    def wants_observation(self) -> bool:
        # False for two reasons: multi-table writes act on per-table
        # group frames, and the single-table path writes through
        # foreachPartition — an RDD action, which never completes a SQL
        # observe() node, so Observation.get would block forever.
        return False

    def _client(self) -> EsClient:
        return EsClient(
            self.require("hosts"),
            self.opt("username"), self.opt("password"),
            verify_cert=bool(self.opt("tls_verify_certificate", True)),
            verify_host=bool(self.opt("tls_verify_hostname", True)),
        )

    def _index_template(self) -> str:
        index = self.opt("index") or self.input_name
        table = self.input_name.split(".")[-1]
        return index.replace("${table_name}", table)

    def _handle_savemode(self, client: EsClient, index: str,
                         schema: T.StructType) -> None:
        """sink/ElasticsearchSink.java SaveModeHandler — driver-side,
        once, before any task writes. Skipped for per-row variable
        indices (can't know the names up front — reference behaves the
        same: VariableIndexSerializer indices are created lazily by ES)."""
        if _VAR.search(index):
            return
        schema_mode = str(self.opt("schema_save_mode",
                                   "CREATE_SCHEMA_WHEN_NOT_EXIST")).upper()
        data_mode = str(self.opt("data_save_mode", "APPEND_DATA")).upper()
        props = {f.name: _es_type(f.dataType) for f in schema.fields
                 if f.name not in (ROW_KIND_COL, TABLE_ID_COL)}
        exists = client.index_exists(index)
        if schema_mode == "RECREATE_SCHEMA":
            if exists:
                client.drop_index(index)
            client.create_index(index, props)
        elif schema_mode == "CREATE_SCHEMA_WHEN_NOT_EXIST":
            if not exists:
                client.create_index(index, props)
        elif schema_mode == "ERROR_WHEN_SCHEMA_NOT_EXIST" and not exists:
            raise ValueError(f"Elasticsearch sink: index {index!r} does not "
                             "exist (ERROR_WHEN_SCHEMA_NOT_EXIST)")
        if exists:
            if data_mode == "DROP_DATA":
                client.clear_index_data(index)
            elif data_mode == "ERROR_WHEN_DATA_EXISTS" and client.count(index):
                raise ValueError(f"Elasticsearch sink: index {index!r} has "
                                 "data (ERROR_WHEN_DATA_EXISTS)")

    def write(self, df: DataFrame) -> None:
        if self.table_groups:
            # Multi-table fan-out (the reference's MultiTableSink): each
            # table writes with its own schema and its own resolved
            # ${table_name} index.
            for tid, tdf in self.table_groups.items():
                sub = EsSink(self.options)
                sub.input_name = tid
                sub.write(tdf)
            return
        client = self._client()
        index = self._index_template()
        self._handle_savemode(client, index, df.schema)

        from seatunnel_spark.net import apply_host_aliases

        # resolve on the driver; the closure ships final endpoints
        hosts = [apply_host_aliases(h) for h in self.require("hosts")]
        username, password = self.opt("username"), self.opt("password")
        vc = bool(self.opt("tls_verify_certificate", True))
        vh = bool(self.opt("tls_verify_hostname", True))
        primary_keys = self.opt("primary_keys")
        delimiter = self.opt("key_delimiter", "_")
        max_batch = int(self.opt("max_batch_size", 10))
        max_retry = int(self.opt("max_retry_count", 3))
        has_kind = ROW_KIND_COL in df.columns
        drop_cols = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            from seatunnel_spark.sources.elasticsearch import EsClient as _C

            cl = _C(hosts, username, password, verify_cert=vc, verify_host=vh)
            batch: list[str] = []

            def flush():
                if not batch:
                    return
                ndjson = "\n".join(batch) + "\n"
                for attempt in range(max_retry):
                    try:
                        resp = cl.bulk(ndjson)
                        if resp.get("errors"):
                            bad = [it for it in resp.get("items", [])
                                   if next(iter(it.values())).get("error")][:3]
                            raise RuntimeError(f"bulk item errors: {bad}")
                        batch.clear()
                        return
                    except Exception:  # noqa: BLE001
                        if attempt == max_retry - 1:
                            raise
                        time.sleep(min(2 ** attempt, 10))

            for row in rows:
                d = row.asDict(recursive=True)
                kind = d.pop(ROW_KIND_COL, "+I") if has_kind else "+I"
                for c in drop_cols:
                    d.pop(c, None)
                doc = {k: _jsonable(v) for k, v in d.items()}
                batch.append(_bulk_lines(doc, kind or "+I",
                                         _resolve_index(index, doc),
                                         primary_keys, delimiter))
                if len(batch) >= max_batch:
                    flush()
            flush()

        df.foreachPartition(write_partition)


__all__ = ["EsSink"]
