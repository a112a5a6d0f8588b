"""Snowflake SQL REST client (stdlib) — the de-facto-public protocol
the Apache-2.0 open-source drivers speak (snowflake-connector-python /
snowflake-jdbc, both of which document the endpoints in source):

  POST /session/v1/login-request          {"data": {ACCOUNT_NAME,
       LOGIN_NAME, PASSWORD, ...}}     -> {"data": {"token": ...}}
  POST /queries/v1/query-request?requestId=<uuid>
       Authorization: Snowflake Token="<t>"
       {"sqlText": ..., "sequenceId": n}
    -> {"data": {"rowtype": [{name, type, scale, ...}],
                 "rowset": [[...string cells...]], ...}}

Cell decoding follows the documented result-set wire form: `fixed`
scale-0 cells are integer strings, scaled `fixed` are decimal strings,
`date` is days-since-epoch, `time`/`timestamp_*` are epoch seconds
with fraction, `binary` is hex, boolean "TRUE"/"FALSE"/"1"/"0".

This backs `jdbc:snowflake://` URLs in the WireExecutor family map —
the reference always has the snowflake-jdbc jar (its dialect only
generates SQL; the wire lives in the driver)."""

from __future__ import annotations

import datetime
import decimal
import json
import secrets

from seatunnel_spark.net import apply_host_aliases


class SnowflakeError(RuntimeError):
    pass


def _cell(v, meta: dict):
    if v is None:
        return None
    t = str(meta.get("type", "text")).lower()
    scale = meta.get("scale") or 0
    if t == "fixed":
        return int(v) if not scale else decimal.Decimal(v)
    if t == "real":
        return float(v)
    if t == "boolean":
        return str(v).upper() in ("TRUE", "1")
    if t == "date":
        return datetime.date(1970, 1, 1) + datetime.timedelta(int(v))
    if t == "time":
        total = decimal.Decimal(v)
        us = int(total * 1_000_000)
        return (datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=us)).time()
    if t.startswith("timestamp"):
        head = str(v).split(" ")[0]  # timestamp_tz carries " <tzoffset>"
        total = decimal.Decimal(head)
        us = int(total * 1_000_000)
        return (datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=us))
    if t == "binary":
        return bytes.fromhex(str(v))
    return str(v)


class SnowflakeRestClient:
    def __init__(self, base_url: str, user: str, password: str,
                 account: str = "", timeout: float = 30.0):
        self.base = apply_host_aliases(base_url).rstrip("/")
        self.timeout = timeout
        self._seq = 0
        self.token = self._login(user, password,
                                 account or self._account_of(base_url))

    @classmethod
    def from_jdbc_url(cls, url: str, user: str, password: str
                      ) -> "SnowflakeRestClient":
        """jdbc:snowflake://<account>.snowflakecomputing.com[/...] or
        the driver-resolved jdbc:snowflake:http(s)://host:port form."""
        rest = url[len("jdbc:snowflake:"):]
        if rest.startswith(("http://", "https://")):
            # strip path/query connection params from the REST base —
            # resolve_jdbc_url preserves them on the URL
            scheme, _, tail = rest.partition("://")
            host = tail.split("/")[0].split("?")[0]
            return cls(f"{scheme}://{host}", user, password,
                       account=cls._account_of(rest))
        host = rest.lstrip("/").split("/")[0].split("?")[0]
        return cls(f"https://{host}", user, password)

    @staticmethod
    def _account_of(url: str) -> str:
        # strip query params too: host?db=X (no path slash) must not
        # leak into the account name
        host = url.split("//", 1)[1].split("/")[0].split("?")[0]
        return host.split(".")[0]

    def _post(self, path: str, payload: dict,
              token: str | None = None) -> dict:
        import urllib.request

        headers = {"Content-Type": "application/json",
                   "Accept": "application/json"}
        if token:
            headers["Authorization"] = f'Snowflake Token="{token}"'
        req = urllib.request.Request(
            self.base + path, method="POST",
            data=json.dumps(payload).encode(), headers=headers)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:  # noqa: S310
            body = json.loads(resp.read().decode())
        if not body.get("success", False):
            raise SnowflakeError(str(body.get("message",
                                              "snowflake error")))
        return body.get("data") or {}

    def _login(self, user: str, password: str, account: str) -> str:
        data = self._post(
            "/session/v1/login-request",
            {"data": {"ACCOUNT_NAME": account, "LOGIN_NAME": user,
                      "PASSWORD": password,
                      "CLIENT_APP_ID": "seatunnel-spark",
                      "CLIENT_APP_VERSION": "1.0"}})
        token = data.get("token")
        if not token:
            raise SnowflakeError("login-request returned no token")
        return token

    def _query(self, sql: str) -> dict:
        self._seq += 1
        rid = secrets.token_hex(16)
        return self._post(
            f"/queries/v1/query-request?requestId={rid}",
            {"sqlText": sql, "sequenceId": self._seq},
            token=self.token)

    def query(self, sql: str) -> tuple[list[str], list[str], list[tuple]]:
        data = self._query(sql)
        rowtype = data.get("rowtype") or []
        cols = [str(c.get("name")) for c in rowtype]
        types = [self._dsl(c) for c in rowtype]
        rows = [tuple(_cell(v, m) for v, m in zip(r, rowtype))
                for r in data.get("rowset") or []]
        return cols, types, rows

    @staticmethod
    def _dsl(meta: dict) -> str:
        t = str(meta.get("type", "text")).lower()
        scale = meta.get("scale") or 0
        if t == "fixed":
            return "bigint" if not scale else "decimal(38,10)"
        return {"real": "double", "boolean": "boolean", "date": "date",
                "binary": "binary"}.get(
            t, "timestamp" if t.startswith("timestamp") else "string")

    def execute(self, sql: str) -> int:
        data = self._query(sql)
        rs = data.get("rowset") or []
        # DML returns one row like [["1"]] ("number of rows inserted")
        try:
            return int(rs[0][0])
        except (IndexError, ValueError, TypeError):
            return 0

    def close(self) -> None:
        try:
            self._post("/session/logout-request", {}, token=self.token)
        except Exception:  # noqa: BLE001
            pass


__all__ = ["SnowflakeRestClient", "SnowflakeError"]
