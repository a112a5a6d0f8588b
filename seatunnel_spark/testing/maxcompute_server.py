"""Mini MaxCompute (ODPS) Tunnel backend: download/upload sessions,
row-range reads, block writes with commit, ODPS signature check."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import urllib.parse

from seatunnel_spark.sources.maxcompute import decode_records, encode_records
from seatunnel_spark.testing.rest_servers import _Handler, _serve


class MiniOdps:
    def __init__(self, secret: str = "sk"):
        self.secret = secret
        # table -> {"schema": [{name,type}], "rows": [tuple]}
        self.tables: dict[str, dict] = {}
        self.uploads: dict[str, dict] = {}  # id -> {table, blocks{}}
        self.downloads: dict[str, str] = {}  # id -> table
        self.bad_signatures = 0

    def seed(self, table: str, schema: list[dict], rows: list[tuple]):
        self.tables[table] = {"schema": schema, "rows": list(rows)}


def start_mini_odps(port: int = 0, secret: str = "sk"):
    odps = MiniOdps(secret)
    counter = {"n": 0}

    class H(_Handler):
        def _check_sig(self, body: bytes) -> bool:
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("ODPS "):
                odps.bad_signatures += 1
                return False
            sig = auth.split(":", 1)[1]
            md5 = hashlib.md5(body).hexdigest() if body else ""
            parsed = urllib.parse.urlsplit(self.path)
            resource = parsed.path + (f"?{parsed.query}"
                                      if parsed.query else "")
            sign = (f"{self.command}\n{md5}\n"
                    f"{self.headers.get('Content-Type', '')}\n"
                    f"{self.headers.get('Date', '')}\n{resource}")
            want = base64.b64encode(hmac.new(
                secret.encode(), sign.encode(),
                hashlib.sha1).digest()).decode()
            if want != sig:
                odps.bad_signatures += 1
                return False
            return True

        def _route(self):
            body = self._body()
            if not self._check_sig(body):
                return self._reply(401, {"Code": "Unauthorized"})
            parsed = urllib.parse.urlsplit(self.path)
            parts = parsed.path.strip("/").split("/")
            table = parts[3]
            q = dict(urllib.parse.parse_qsl(parsed.query,
                                            keep_blank_values=True))
            t = odps.tables.setdefault(table, {"schema": [], "rows": []})
            if self.command == "POST" and "downloads" in q:
                counter["n"] += 1
                did = f"dl{counter['n']}"
                odps.downloads[did] = table
                return self._reply(201, {
                    "DownloadID": did, "RecordCount": len(t["rows"]),
                    "Schema": {"columns": t["schema"]}})
            if self.command == "GET" and "data" in q:
                start, count = json.loads(
                    q["rowrange"].replace("(", "[").replace(")", "]"))
                types = [c["type"] for c in t["schema"]]
                chunk = t["rows"][start:start + count]
                raw = encode_records(chunk, types)
                return self._reply(200, None, raw=raw)
            if self.command == "POST" and "uploads" in q:
                counter["n"] += 1
                uid = f"up{counter['n']}"
                odps.uploads[uid] = {"table": table, "blocks": {}}
                return self._reply(201, {"UploadID": uid})
            if self.command == "PUT" and "blockid" in q:
                up = odps.uploads[q["uploadid"]]
                types = [c["type"] for c in t["schema"]]
                up["blocks"][int(q["blockid"])] = decode_records(body, types)
                return self._reply(200, {})
            if self.command == "POST" and "uploadid" in q:
                up = odps.uploads[q["uploadid"]]
                doc = json.loads(body)
                for b in doc["blocks"]:
                    t["rows"].extend(up["blocks"].get(b, []))
                return self._reply(200, {})
            if self.command == "DELETE":
                t["rows"] = []
                return self._reply(200, {})
            return self._reply(400, {"Code": "BadRequest"})

        do_GET = do_POST = do_PUT = do_DELETE = _route

    port, stop = _serve(H, port)
    return odps, port, stop


__all__ = ["MiniOdps", "start_mini_odps"]
