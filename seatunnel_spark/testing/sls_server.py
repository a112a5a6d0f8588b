"""Mini Aliyun SLS (Log Service) backend: shards, cursors, PullLogs
(protobuf LogGroupList), PutLogs (protobuf LogGroup decode + LOG
HMAC-SHA1 signature verification), consumer-group checkpoints."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import urllib.parse

from seatunnel_spark import pb
from seatunnel_spark.sources.sls import encode_log_group
from seatunnel_spark.testing.rest_servers import _Handler, _serve


class MiniSls:
    def __init__(self, secret: str = "sk", shards: int = 2):
        self.secret = secret
        self.nshards = shards
        # logstore -> shard -> list[loggroup_pb]
        self.logs: dict[str, dict[int, list[bytes]]] = {}
        self.checkpoints: dict[tuple[str, str, int], str] = {}
        self.bad_signatures = 0

    def store(self, logstore: str) -> dict[int, list[bytes]]:
        return self.logs.setdefault(
            logstore, {i: [] for i in range(self.nshards)})

    def seed(self, logstore: str, shard: int,
             contents: list[dict], ts: int = 1700000000) -> None:
        group = encode_log_group(
            [(ts, list(c.items())) for c in contents], topic="seed")
        self.store(logstore)[shard].append(group)


def _cursor(i: int) -> str:
    return base64.b64encode(str(i).encode()).decode()


def _cursor_idx(c: str) -> int:
    return int(base64.b64decode(c).decode())


def start_mini_sls(port: int = 0, secret: str = "sk", shards: int = 2):
    sls = MiniSls(secret, shards)

    class H(_Handler):
        def _verify_sig(self) -> bool:
            auth = self.headers.get("Authorization", "")
            if not auth.startswith("LOG "):
                return False
            _, sig = auth[4:].split(":", 1)
            body = getattr(self, "_cached_body", b"")
            md5 = hashlib.md5(body).hexdigest().upper() if body else ""
            log_headers = "\n".join(
                f"{k.lower()}:{v}" for k, v in sorted(
                    self.headers.items(), key=lambda kv: kv[0].lower())
                if k.lower().startswith(("x-log-", "x-acs-")))
            parsed = urllib.parse.urlsplit(self.path)
            q = "&".join(f"{k}={v[0]}" for k, v in sorted(
                urllib.parse.parse_qs(parsed.query).items()))
            resource = parsed.path + (f"?{q}" if q else "")
            sign_str = (f"{self.command}\n{md5}\n"
                        f"{self.headers.get('Content-Type', '') or ''}\n"
                        f"{self.headers.get('Date', '')}\n"
                        f"{log_headers}\n{resource}")
            want = base64.b64encode(hmac.new(
                secret.encode(), sign_str.encode(),
                hashlib.sha1).digest()).decode()
            if want != sig:
                sls.bad_signatures += 1
                return False
            return True

        def do_GET(self):
            self._cached_body = b""
            if not self._verify_sig():
                return self._reply(401, {"errorCode": "Unauthorized"})
            parsed = urllib.parse.urlsplit(self.path)
            q = {k: v[0] for k, v in
                 urllib.parse.parse_qs(parsed.query).items()}
            parts = parsed.path.strip("/").split("/")
            if parts[0] != "logstores":
                return self._reply(404, {})
            logstore = parts[1]
            if len(parts) == 3 and parts[2] == "shards":
                return self._reply(200, [
                    {"shardID": i, "status": "readwrite"}
                    for i in sorted(sls.store(logstore))])
            if parts[2] == "consumergroups":
                group = parts[3]
                shard = int(q.get("shard", -1))
                cp = sls.checkpoints.get((logstore, group, shard))
                rows = ([{"shard": shard, "checkpoint": cp}] if cp else [])
                return self._reply(200, rows)
            shard = int(parts[3])
            log = sls.store(logstore)[shard]
            if q.get("type") == "cursor":
                frm = q.get("from", "begin")
                if frm == "begin":
                    idx = 0
                elif frm == "end":
                    idx = len(log)
                else:  # unix timestamp: everything (mini keeps no index)
                    idx = 0
                return self._reply(200, {"cursor": _cursor(idx)})
            if q.get("type") == "log":
                idx = _cursor_idx(q["cursor"])
                count = int(q.get("count", 1000))
                chunk = log[idx:idx + count]
                body = b"".join(pb.fbytes(1, g) for g in chunk)
                self.send_response(200)
                self.send_header("Content-Type", "application/x-protobuf")
                self.send_header("x-log-cursor", _cursor(idx + len(chunk)))
                self.send_header("x-log-count", str(len(chunk)))
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            return self._reply(400, {"errorCode": "BadRequest"})

        def do_POST(self):
            self._cached_body = self._body()
            if not self._verify_sig():
                return self._reply(401, {"errorCode": "Unauthorized"})
            parsed = urllib.parse.urlsplit(self.path)
            q = {k: v[0] for k, v in
                 urllib.parse.parse_qs(parsed.query).items()}
            parts = parsed.path.strip("/").split("/")
            logstore = parts[1]
            if parts[2] == "consumergroups":
                doc = json.loads(self._cached_body)
                sls.checkpoints[(logstore, parts[3], doc["shard"])] = \
                    doc["checkpoint"]
                return self._reply(200, {})
            if parts[2] == "shards" and parts[3] == "lb":
                store = sls.store(logstore)
                # load-balance: append to the emptiest shard
                shard = min(store, key=lambda s: len(store[s]))
                store[shard].append(self._cached_body)
                return self._reply(200, {})
            return self._reply(400, {"errorCode": "BadRequest"})

    port, stop = _serve(H, port)
    return sls, port, stop


__all__ = ["MiniSls", "start_mini_sls"]
