"""Mini OSS server (path-style REST subset) — the OSS twin of
s3_server.py: GetObject/PutObject + bucket listing with marker
pagination, VERIFYING each request's "OSS <key>:<sig>" HMAC-SHA1
signature per the public spec (wrong secret => 403)."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MiniOss:
    def __init__(self, access_key: str, access_secret: str,
                 auth_prefix: str = "OSS"):
        self.auth_prefix = auth_prefix
        self.credentials = {access_key: access_secret}
        self.objects: dict[tuple[str, str], bytes] = {}
        self.lock = threading.RLock()
        self.auth_failures = 0

    def seed(self, bucket: str, key: str, data: bytes) -> None:
        with self.lock:
            self.objects[(bucket, key.lstrip("/"))] = data


def _make_handler(srv: MiniOss):
    from seatunnel_spark.oss_fs import oss_signature

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _bucket_key(self):
            parts = urllib.parse.urlsplit(self.path)
            segs = parts.path.lstrip("/").split("/", 1)
            return (segs[0],
                    urllib.parse.unquote(segs[1]) if len(segs) > 1 else "",
                    urllib.parse.parse_qs(parts.query,
                                          keep_blank_values=True))

        def _verify(self) -> bool:
            auth = self.headers.get("Authorization", "")
            bucket, key, _ = self._bucket_key()
            if srv.auth_prefix == "COS":
                from seatunnel_spark.cos_fs import verify_cos_authorization

                pathname = f"/{bucket}" + (f"/{key}" if key else "")
                return verify_cos_authorization(
                    auth, self.command, pathname, srv.credentials)
            date = self.headers.get("Date", "")
            prefix = srv.auth_prefix + " "
            if not auth.startswith(prefix) or ":" not in auth:
                return False
            key_id, _, sig = auth[len(prefix):].partition(":")
            secret = srv.credentials.get(key_id)
            if secret is None:
                return False
            want = oss_signature(
                self.command, secret, bucket, key, date,
                content_type=self.headers.get("Content-Type", "") or "")
            return want == sig

        def _deny(self):
            srv.auth_failures += 1
            self._send(403)

        def _send(self, code: int, body: bytes = b"",
                  ctype: str = "application/xml"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def do_GET(self):
            if not self._verify():
                return self._deny()
            bucket, key, q = self._bucket_key()
            if not key:  # bucket listing
                prefix = (q.get("prefix") or [""])[0]
                marker = (q.get("marker") or [""])[0]
                with srv.lock:
                    keys = sorted(k for (b, k) in srv.objects
                                  if b == bucket and k.startswith(prefix)
                                  and k > marker)
                page, rest = keys[:500], keys[500:]
                items = "".join(f"<Contents><Key>{k}</Key></Contents>"
                                for k in page)
                trunc = "true" if rest else "false"
                nxt = (f"<NextMarker>{page[-1]}</NextMarker>"
                       if rest else "")
                body = (f"<?xml version='1.0'?><ListBucketResult>"
                        f"<IsTruncated>{trunc}</IsTruncated>{nxt}{items}"
                        "</ListBucketResult>")
                return self._send(200, body.encode())
            with srv.lock:
                data = srv.objects.get((bucket, key))
            if data is None:
                return self._send(404, b"<Error><Code>NoSuchKey</Code>"
                                       b"</Error>")
            return self._send(200, data, "application/octet-stream")

        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if not self._verify():
                return self._deny()
            bucket, key, _ = self._bucket_key()
            with srv.lock:
                srv.objects[(bucket, key)] = body
            self._send(200)

    return Handler


def start_mini_oss(access_key: str = "xxxxxxxxxxxxxxxxxxx",
                   access_secret: str = "xxxxxxxxxxxxxxxxxxx",
                   port: int = 0, auth_prefix: str = "OSS"):
    srv = MiniOss(access_key, access_secret, auth_prefix)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(srv))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def stop():
        httpd.shutdown()
        httpd.server_close()

    return srv, httpd.server_address[1], stop


__all__ = ["MiniOss", "start_mini_oss"]
