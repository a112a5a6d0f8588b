"""Elasticsearch source — REST scroll reads over stdlib HTTP.

Semantic parity with the reference connector
(seatunnel-connectors-v2/connector-elasticsearch/.../source/
ElasticsearchSource.java, ElasticsearchSourceSplitEnumerator.java,
source/ElasticsearchSourceReader.java, config/SourceConfig.java):
`index` with * fuzzy matching, `index_list` multi-table, `query` DSL
passthrough, `scroll_time`/`scroll_size`, `source` field projection,
`array_column` overrides, schema from config or inferred from the
index mapping (constant/EsTypeMappingSeaTunnelType.java).

Spark-first where the reference is not: the reference plans ONE split
per index (ElasticsearchSourceSplitEnumerator.java:141-151 — a single
scroll per index, serial). Here each index fans out over N SLICED
scrolls (ES `slice` parameter) exposed through Spark 4's Python
DataSource API — partitions() is the split enumerator, read() the
per-executor reader, so a 100 TB index streams through every executor
in parallel instead of one reader. No driver collect anywhere.
"""

from __future__ import annotations

import base64
import datetime as _dt
import decimal
import json
import ssl
import urllib.error
import urllib.request

from pyspark.sql import DataFrame, SparkSession, types as T

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import parse_schema, parse_type

# constant/EsTypeMappingSeaTunnelType.java:34-46
_ES_TO_SPARK = {
    "string": T.StringType(), "keyword": T.StringType(),
    "text": T.StringType(), "binary": T.StringType(),
    "boolean": T.BooleanType(), "byte": T.ByteType(),
    "short": T.ShortType(), "integer": T.IntegerType(),
    "long": T.LongType(), "float": T.FloatType(),
    "half_float": T.FloatType(), "double": T.DoubleType(),
    "date": T.TimestampType(),
}


class EsClient:
    """Minimal ES REST client (urllib, zero deps) with host failover,
    basic auth, and TLS-verification toggles — the stdlib analog of
    client/EsRestClient.java."""

    def __init__(self, hosts: list[str], username: str | None = None,
                 password: str | None = None, verify_cert: bool = True,
                 verify_host: bool = True, timeout: float = 60.0):
        self.hosts = [apply_host_aliases(h.rstrip("/")) for h in hosts]
        self.timeout = timeout
        self._auth = None
        if username:
            tok = base64.b64encode(f"{username}:{password or ''}".encode())
            self._auth = "Basic " + tok.decode()
        self._ctx = None
        if any(h.startswith("https") for h in self.hosts):
            ctx = ssl.create_default_context()
            if not verify_cert:
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            elif not verify_host:
                ctx.check_hostname = False
            self._ctx = ctx

    def request(self, method: str, path: str, body=None,
                ndjson: str | None = None):
        data = None
        ctype = "application/json"
        if ndjson is not None:
            data = ndjson.encode()
            ctype = "application/x-ndjson"
        elif body is not None:
            data = json.dumps(body, default=_json_default).encode()
        err = None
        for host in self.hosts:  # failover across the host list
            req = urllib.request.Request(
                host + path, data=data, method=method,
                headers={"Content-Type": ctype,
                         **({"Authorization": self._auth} if self._auth else {})})
            try:
                with urllib.request.urlopen(req, timeout=self.timeout,
                                            context=self._ctx) as resp:
                    payload = resp.read()
                    return json.loads(payload) if payload else {}
            except urllib.error.HTTPError as e:  # 4xx/5xx: no failover
                detail = e.read().decode(errors="replace")[:500]
                raise RuntimeError(
                    f"Elasticsearch {method} {path} -> {e.code}: {detail}"
                ) from e
            except OSError as e:
                err = e
        raise ConnectionError(f"no Elasticsearch host reachable: {self.hosts}") from err

    # -- metadata ---------------------------------------------------------
    def cluster_version(self) -> str:
        return self.request("GET", "/").get("version", {}).get("number", "8.0.0")

    def index_exists(self, index: str) -> bool:
        try:
            self.request("HEAD", "/" + index.lower())
            return True
        except (RuntimeError, ConnectionError):
            return False

    def list_indices(self, pattern: str) -> list[str]:
        """Indices matching a * pattern (EsRestClient.java:400-417)."""
        rows = self.request(
            "GET", f"/_cat/indices/{pattern.lower()}?h=index&format=json")
        return sorted(r["index"] for r in rows)

    def get_mapping(self, index: str) -> dict:
        out = self.request("GET", f"/{index.lower()}/_mapping")
        body = next(iter(out.values())) if out else {}
        return (body.get("mappings") or {}).get("properties") or {}

    def create_index(self, index: str, properties: dict | None = None) -> None:
        body = {"mappings": {"properties": properties}} if properties else None
        self.request("PUT", "/" + index.lower(), body=body)

    def drop_index(self, index: str) -> None:
        self.request("DELETE", "/" + index.lower())

    def clear_index_data(self, index: str) -> None:
        self.request("POST", f"/{index.lower()}/_delete_by_query",
                     body={"query": {"match_all": {}}})

    def count(self, index: str, query: dict | None = None) -> int:
        body = {"query": query} if query else None
        return int(self.request("GET", f"/{index.lower()}/_count", body=body)
                   .get("count", 0))

    def refresh(self, index: str) -> None:
        self.request("POST", f"/{index.lower()}/_refresh")

    # -- scroll read ------------------------------------------------------
    def scroll_hits(self, index: str, query: dict, scroll_time: str,
                    scroll_size: int, source_fields: list[str] | None = None,
                    slice_id: int | None = None, slice_max: int | None = None):
        """Yield _source docs for every hit (ElasticsearchSourceReader
        .java pollNext/scroll loop)."""
        body: dict = {"query": query or {"match_all": {}}, "size": scroll_size}
        if source_fields:
            body["_source"] = source_fields
        if slice_max and slice_max > 1:
            body["slice"] = {"id": slice_id, "max": slice_max}
        out = self.request(
            "POST", f"/{index.lower()}/_search?scroll={scroll_time}", body=body)
        sid = out.get("_scroll_id")
        try:
            while True:
                hits = (out.get("hits") or {}).get("hits") or []
                if not hits:
                    return
                for h in hits:
                    yield h.get("_source") or {}
                out = self.request("POST", "/_search/scroll",
                                   body={"scroll": scroll_time, "scroll_id": sid})
                sid = out.get("_scroll_id", sid)
        finally:
            if sid:
                try:
                    self.request("DELETE", "/_search/scroll",
                                 body={"scroll_id": [sid]})
                except Exception:  # noqa: BLE001 — best-effort cleanup
                    pass

    # -- bulk write -------------------------------------------------------
    def bulk(self, ndjson: str) -> dict:
        return self.request("POST", "/_bulk", ndjson=ndjson)


def _json_default(v):
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    return str(v)


def infer_schema_from_mapping(properties: dict,
                              array_overrides: dict | None = None) -> T.StructType:
    """ES index mapping -> Spark schema (EsTypeMappingSeaTunnelType
    .java:34-46; object -> nested struct). ES mappings can't mark a
    field as array, so `array_column` overrides declare them
    (SourceConfig.java ARRAY_COLUMN)."""
    fields = []
    for name, spec in properties.items():
        if array_overrides and name in array_overrides:
            dt = parse_type(array_overrides[name])
        elif str(spec.get("type")) == "nested" and spec.get("properties"):
            # ES `nested` = array of objects
            dt = T.ArrayType(infer_schema_from_mapping(spec["properties"]))
        elif spec.get("properties"):  # plain object
            dt = infer_schema_from_mapping(spec["properties"])
        else:
            dt = _ES_TO_SPARK.get(str(spec.get("type", "text")).lower(),
                                  T.StringType())
        fields.append(T.StructField(name, dt))
    return T.StructType(sorted(fields, key=lambda f: f.name))


def convert_value(v, dt: T.DataType):
    """JSON _source value -> Python value for the given Spark type
    (serialize/source/DefaultSeaTunnelRowDeserializer.java semantics:
    lenient string/number coercion, ISO-8601-ish dates)."""
    if v is None:
        return None
    if isinstance(dt, T.StringType):
        return v if isinstance(v, str) else json.dumps(v, default=_json_default)
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dt, T.DecimalType):
        return decimal.Decimal(str(v))
    if isinstance(dt, T.BooleanType):
        return v if isinstance(v, bool) else str(v).lower() == "true"
    if isinstance(dt, T.BinaryType):
        return base64.b64decode(v) if isinstance(v, str) else bytes(v)
    if isinstance(dt, T.TimestampType):
        if isinstance(v, (int, float)):  # epoch millis
            return _dt.datetime.fromtimestamp(v / 1000.0)
        return _dt.datetime.fromisoformat(str(v).replace("Z", "+00:00")
                                          ).replace(tzinfo=None)
    if isinstance(dt, T.DateType):
        return _dt.date.fromisoformat(str(v)[:10])
    if isinstance(dt, T.ArrayType):
        seq = v if isinstance(v, list) else [v]
        return [convert_value(x, dt.elementType) for x in seq]
    if isinstance(dt, T.MapType):
        return {k: convert_value(x, dt.valueType) for k, x in dict(v).items()}
    if isinstance(dt, T.StructType):
        return tuple(convert_value(dict(v).get(f.name), f.dataType)
                     for f in dt.fields)
    if isinstance(dt, T.NullType):
        return None
    return v


class EsSource(Source):
    """config/SourceConfig.java surface; one DataFrame per index
    (index_list -> multi-table dict, like the reference's
    CatalogTable-per-index enumeration)."""

    NAME = "Elasticsearch"

    def _client(self) -> EsClient:
        return EsClient(
            self.require("hosts"),
            self.opt("username"), self.opt("password"),
            verify_cert=bool(self.opt("tls_verify_certificate", True)),
            verify_host=bool(self.opt("tls_verify_hostname", True)),
        )

    def read(self, spark: SparkSession):
        client = self._client()
        index_list = self.opt("index_list")
        if index_list:
            out: dict[str, DataFrame] = {}
            for sub in index_list:
                merged = {k: v for k, v in self.options.items()
                          if k != "index_list"}
                merged.update(sub)
                out[sub["index"]] = self._read_one(spark, client, merged)
            return out
        return self._read_one(spark, client, self.options)

    def _read_one(self, spark: SparkSession, client: EsClient,
                  opts: dict) -> DataFrame:
        index = opts.get("index")
        if not index:
            raise ValueError("Elasticsearch source: missing option 'index'")
        indices = client.list_indices(index) if "*" in index else [index]
        if not indices:
            raise ValueError(f"Elasticsearch source: no index matches {index!r}")

        schema_opt = (opts.get("schema") or {}).get("fields")
        array_over = opts.get("array_column") or {}
        if schema_opt:
            schema = parse_schema(schema_opt)
        else:
            schema = infer_schema_from_mapping(
                client.get_mapping(indices[0]), array_over)
        source_fields = opts.get("source") or [f.name for f in schema.fields]
        schema = T.StructType([f for f in schema.fields
                               if f.name in source_fields])

        slices = int(opts.get("slice_count",
                              min(8, spark.sparkContext.defaultParallelism)))
        from seatunnel_spark.sources.es_ds import register_es_datasource
        register_es_datasource(spark)
        cfg = {
            # aliases resolve on the DRIVER and ship in the task config —
            # executor workers don't see late env changes (see net.py)
            "hosts": [apply_host_aliases(h) for h in self.require("hosts")],
            "username": self.opt("username"),
            "password": self.opt("password"),
            "verify_cert": bool(self.opt("tls_verify_certificate", True)),
            "verify_host": bool(self.opt("tls_verify_hostname", True)),
            "indices": indices,
            "query": opts.get("query") or {"match_all": {}},
            "scroll_time": opts.get("scroll_time", "1m"),
            "scroll_size": int(opts.get("scroll_size", 100)),
            "source_fields": source_fields,
            "slices": slices,
        }
        return (spark.read.format("seatunnel_es")
                .schema(schema)
                .option("config", json.dumps(cfg))
                .load())


__all__ = ["EsClient", "EsSource", "convert_value",
           "infer_schema_from_mapping"]
