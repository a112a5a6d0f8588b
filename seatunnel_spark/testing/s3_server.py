"""Mini S3 server (path-style REST subset) over an in-memory object
store — the sandbox stand-in for the reference's real-bucket S3 e2e
runs. Serves ListObjectsV2 (prefix + continuation-token pagination),
GetObject, PutObject, DeleteObject, HEAD, and VERIFIES each request's
AWS SigV4 signature against the configured credentials (recomputed
from the request per the public signing spec — wrong key or tampered
payload => 403)."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MiniS3:
    def __init__(self, access_key: str = "XXXXXX",
                 secret_key: str = "AWS_XXXX"):
        self.access_key = access_key
        self.secret_key = secret_key
        # additional accepted credential pairs (a conf may declare its
        # own placeholder keys; the IT provisions them server-side)
        self.credentials: dict[str, str] = {access_key: secret_key}
        # (bucket, key) -> bytes
        self.objects: dict[tuple[str, str], bytes] = {}
        self.lock = threading.RLock()
        self.requests: list[str] = []
        self.auth_failures = 0

    def seed(self, bucket: str, key: str, data: bytes) -> None:
        with self.lock:
            self.objects[(bucket, key.lstrip("/"))] = data


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _make_handler(srv: MiniS3):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence
            pass

        def _verify(self, body: bytes) -> bool:
            from seatunnel_spark.s3_fs import sigv4_s3_headers
            import datetime as _dt

            auth = self.headers.get("Authorization", "")
            amz_date = self.headers.get("X-Amz-Date", "")
            if not auth.startswith("AWS4-HMAC-SHA256") or not amz_date:
                return False
            host = self.headers.get("Host", "")
            url = f"http://{host}{self.path}"
            now = _dt.datetime.strptime(amz_date, "%Y%m%dT%H%M%SZ") \
                .replace(tzinfo=_dt.timezone.utc)
            # region from the credential scope
            try:
                scope = auth.split("Credential=")[1].split(",")[0]
                region = scope.split("/")[2]
                key_id = scope.split("/")[0]
            except IndexError:
                return False
            secret = srv.credentials.get(key_id)
            if secret is None:
                return False
            want = sigv4_s3_headers(self.command, url, body, region,
                                    key_id, secret, now=now)
            return want["Authorization"] == auth

        def _deny(self):
            srv.auth_failures += 1
            self.send_response(403)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def _bucket_key(self):
            parts = urllib.parse.urlsplit(self.path)
            segs = parts.path.lstrip("/").split("/", 1)
            bucket = segs[0]
            key = urllib.parse.unquote(segs[1]) if len(segs) > 1 else ""
            return bucket, key, urllib.parse.parse_qs(parts.query,
                                                      keep_blank_values=True)

        def _send(self, code: int, body: bytes = b"",
                  ctype: str = "application/xml"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

        def do_GET(self):
            srv.requests.append(f"GET {self.path}")
            if not self._verify(b""):
                return self._deny()
            bucket, key, q = self._bucket_key()
            if "list-type" in q:
                prefix = (q.get("prefix") or [""])[0]
                token = (q.get("continuation-token") or [None])[0]
                with srv.lock:
                    keys = sorted(k for (b, k) in srv.objects
                                  if b == bucket and k.startswith(prefix))
                start = int(token) if token else 0
                page = keys[start:start + 500]
                nxt = start + 500 if start + 500 < len(keys) else None
                items = "".join(
                    f"<Contents><Key>{_xml_escape(k)}</Key>"
                    f"<Size>{len(srv.objects[(bucket, k)])}</Size>"
                    "</Contents>" for k in page)
                more = (f"<NextContinuationToken>{nxt}"
                        "</NextContinuationToken>") if nxt else ""
                body = (f"<?xml version='1.0'?><ListBucketResult>"
                        f"<IsTruncated>{'true' if nxt else 'false'}"
                        f"</IsTruncated>{items}{more}</ListBucketResult>")
                return self._send(200, body.encode())
            with srv.lock:
                data = srv.objects.get((bucket, key))
            if data is None:
                return self._send(404, b"<Error><Code>NoSuchKey</Code>"
                                       b"</Error>")
            return self._send(200, data, "application/octet-stream")

        def do_HEAD(self):
            bucket, key, _ = self._bucket_key()
            with srv.lock:
                data = srv.objects.get((bucket, key))
            self.send_response(200 if data is not None else 404)
            self.send_header("Content-Length",
                             str(len(data) if data else 0))
            self.end_headers()

        def do_PUT(self):
            srv.requests.append(f"PUT {self.path}")
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            if not self._verify(body):
                return self._deny()
            bucket, key, _ = self._bucket_key()
            with srv.lock:
                srv.objects[(bucket, key)] = body
            self._send(200)

        def do_DELETE(self):
            if not self._verify(b""):
                return self._deny()
            bucket, key, _ = self._bucket_key()
            with srv.lock:
                srv.objects.pop((bucket, key), None)
            self._send(204)

    return Handler


def start_mini_s3(access_key: str = "XXXXXX",
                  secret_key: str = "AWS_XXXX", port: int = 0):
    srv = MiniS3(access_key, secret_key)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(srv))

    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    def stop():
        httpd.shutdown()
        httpd.server_close()

    return srv, httpd.server_address[1], stop


__all__ = ["MiniS3", "start_mini_s3"]
