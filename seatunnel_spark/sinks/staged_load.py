"""Staged-load sinks: write files first, then import them in bulk.

Three reference connectors share this shape:

- S3Redshift (connector-s3-redshift): S3 file sink + a COPY statement
  run over the Redshift JDBC connection at commit time
  (S3RedshiftSinkAggregatedCommitter.java:121 substitutes ${path};
  RedshiftJdbcClient.java executes it). Redshift speaks the pg wire
  protocol, so the COPY runs through pg_wire.PgClient here.

- SelectDBCloud (connector-selectdb-cloud): stage upload via
  PUT /copy/upload (307 redirect to the object-store address,
  SelectDBStageLoad.java:260-280), then COPY INTO … FROM @~('{files}')
  committed through POST /copy/query (CopySQLUtil.java:45-96).

- ClickhouseFile (connector-clickhouse …/sink/file/ClickhouseFileSink):
  the reference shells out to clickhouse-local and pushes parts onto
  each node. The rebuild stages per-partition CSV part files and bulk
  imports each file body through the public HTTP interface
  (INSERT INTO … FORMAT CSV) — same bulk-file semantics, no SSH.

Scale: the data path stays distributed (files are written by executor
tasks); only the import statements run from the driver, mirroring the
reference's aggregated committer.
"""

from __future__ import annotations

import base64
import glob
import json
import os
import urllib.error
import urllib.request

from pyspark.sql import DataFrame

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sinks.file import FileSink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


class S3RedshiftSink(Sink):
    NAME = "S3Redshift"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        from seatunnel_spark.sources.file import resolve_path_aliases

        execute_sql = self.require("execute_sql")
        jdbc_url = self.require("jdbc_url")
        user = self.opt("jdbc_user", "")
        password = self.opt("jdbc_password", "")

        file_opts = {k: v for k, v in self.options.items()
                     if k not in ("jdbc_url", "jdbc_user", "jdbc_password",
                                  "execute_sql")}
        FileSink(file_opts).write(df)

        raw_path = str(self.require("path"))
        local = resolve_path_aliases(raw_path)
        files = sorted(
            f for f in glob.glob(os.path.join(local, "**"), recursive=True)
            if os.path.isfile(f) and not os.path.basename(f).startswith(
                ("_", ".")))

        from seatunnel_spark.pg_wire import PgClient

        cl = PgClient.from_jdbc_url(jdbc_url, user, password)
        try:
            for f in files:
                # commit path as the sink's object path (the configured
                # prefix + the staged file name), per the reference's
                # ${path} substitution
                rel = os.path.relpath(f, local)
                obj_path = raw_path.rstrip("/") + "/" + rel.replace(
                    os.sep, "/")
                cl.execute(execute_sql.replace("${path}", obj_path))
        finally:
            cl.close()


class SelectDBSink(Sink):
    NAME = "SelectDBCloud"

    def wants_observation(self) -> bool:
        return False

    def _basic(self) -> str:
        token = base64.b64encode(
            f"{self.require('username')}:{self.opt('password', '')}"
            .encode()).decode()
        return f"Basic {token}"

    def write(self, df: DataFrame) -> None:
        load_url = apply_host_aliases(
            "http://" + str(self.require("load-url"))
            .replace("http://", "").replace("https://", ""))
        table = self.require("table.identifier")
        cluster = self.opt("cluster-name", "")
        enable_delete = bool(self.opt("sink.enable-delete", False))
        label_prefix = self.opt("sink.label-prefix", "seatunnel")
        props = dict(self.opt("selectdb.config") or {})
        props.setdefault("file.type", "json")
        auth = self._basic()
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        import uuid

        def upload_partition(rows):
            lines = []
            for row in rows:
                d = row.asDict(recursive=True)
                kind = d.pop(ROW_KIND_COL, "+I") if meta else "+I"
                for c in meta:
                    d.pop(c, None)
                if enable_delete:
                    d["__DORIS_DELETE_SIGN__"] = \
                        1 if str(kind) in ("-D", "-U") else 0
                elif str(kind) in ("-D", "-U"):
                    continue
                lines.append(json.dumps(d, default=str))
            if not lines:
                return iter(())
            body = "\n".join(lines).encode()
            file_name = f"{label_prefix}_{uuid.uuid4().hex}.json"
            # 1) ask the FE for the internal-stage address (307)
            req = urllib.request.Request(
                f"{load_url}/copy/upload", method="PUT",
                headers={"fileName": file_name, "Authorization": auth})

            class _NoRedirect(urllib.request.HTTPRedirectHandler):
                def redirect_request(self, *a, **kw):
                    return None

            opener = urllib.request.build_opener(_NoRedirect)
            try:
                resp = opener.open(req, timeout=30)
                raise RuntimeError(
                    f"SelectDB upload: expected 307, got {resp.status}")
            except urllib.error.HTTPError as e:
                if e.code != 307:
                    raise RuntimeError(
                        f"SelectDB upload failed: {e.code}") from e
                address = e.headers["Location"]
            # 2) PUT the bytes at the redirected address
            put = urllib.request.Request(
                apply_host_aliases(address), method="PUT", data=body)
            with urllib.request.urlopen(put, timeout=60) as resp:  # noqa: S310
                resp.read()
            return iter([file_name])

        file_names = df.rdd.mapPartitions(
            lambda it: upload_partition(it)).collect()
        if not file_names:
            return
        # 3) COPY INTO … FROM @~('{files}') (CopySQLBuilder.buildCopySQL)
        props["copy.async"] = "false"
        if enable_delete:
            props["copy.use_delete_sign"] = "true"
        prop_sql = ",".join(f"'{k}'='{v}'" for k, v in sorted(props.items()))
        copy_sql = (f"COPY INTO {table} FROM @~('{{{','.join(file_names)}}}') "
                    f"PROPERTIES ({prop_sql})")
        body = json.dumps({"cluster": cluster, "sql": copy_sql}).encode()
        req = urllib.request.Request(
            f"{load_url}/copy/query", method="POST", data=body,
            headers={"Content-Type": "application/json",
                     "Authorization": auth})
        with urllib.request.urlopen(req, timeout=120) as resp:  # noqa: S310
            result = json.loads(resp.read())
        code = (result.get("code"), result.get("data", {}).get("code"))
        if not ({0, "0", None} & set(code)):  # pragma: no cover
            raise RuntimeError(f"SelectDB copy failed: {result}")


class ClickhouseFileSink(Sink):
    NAME = "ClickhouseFile"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        import csv
        import io
        import uuid

        from seatunnel_spark.sources.clickhouse import ch_exec

        hostport = str(self.require("host")).split(",")[0].strip()
        base = apply_host_aliases(f"http://{hostport}")
        database = self.opt("database", "default")
        table = self.require("table")
        fields = self.opt("fields")
        user = self.opt("username", "")
        password = self.opt("password", "")
        tmp_dir = self.opt("tmp_path", "/tmp/seatunnel_clickhouse_file")
        cols = [str(f) for f in fields] if fields else \
            [c for c in df.columns if c not in (ROW_KIND_COL, TABLE_ID_COL)]
        out_dir = os.path.join(tmp_dir, uuid.uuid4().hex)
        os.makedirs(out_dir, exist_ok=True)

        def stage_partition(rows):
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.csv")
            buf = io.StringIO()
            w = csv.writer(buf)
            n = 0
            for row in rows:
                d = row.asDict(recursive=True)
                w.writerow([d.get(c) for c in cols])
                n += 1
            if n:
                with open(path, "w", encoding="utf-8") as fh:
                    fh.write(buf.getvalue())
                return iter([path])
            return iter(())

        paths = df.rdd.mapPartitions(stage_partition).collect()
        col_sql = ", ".join(f"`{c}`" for c in cols)
        try:
            for p in paths:
                with open(p, "rb") as fh:
                    body = fh.read()
                ch_exec(base,
                        f"INSERT INTO {database}.{table} ({col_sql}) "
                        f"FORMAT CSV", body=body, user=user,
                        password=password)
        finally:
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)


__all__ = ["S3RedshiftSink", "SelectDBSink", "ClickhouseFileSink"]
