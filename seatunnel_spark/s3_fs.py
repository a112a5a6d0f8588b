"""S3 REST filesystem helpers (stdlib) for the S3File connector.

Implements the public S3 REST API surface the connector needs —
ListObjectsV2, GetObject, PutObject, DeleteObject over path-style URLs
with AWS Signature Version 4 (docs.aws.amazon.com/AmazonS3/latest/API/
sig-v4-authenticating-requests.html: the s3 service variant signs
x-amz-content-sha256 alongside host and x-amz-date). The reference's
connector rides hadoop-aws (fs.s3a.*); this client serves the same
layout without the JVM jars, so the s3 e2e confs run against an
in-process mini S3. On a real 100 TB deployment S3File reads go
through `spark.read` over s3a:// with hadoop-aws on the classpath —
distributed scans, no staging; the spool path here mirrors the FTP
connector's bounded-fixture story.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import os
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET


def sigv4_s3_headers(method: str, url: str, body: bytes, region: str,
                     access_key: str, secret_key: str,
                     now: _dt.datetime | None = None) -> dict:
    """SigV4 for service=s3: UNSIGNED chunking not used; the payload
    hash is signed via x-amz-content-sha256 (required by S3)."""
    parts = urllib.parse.urlsplit(url)
    now = now or _dt.datetime.now(_dt.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()
    canonical_headers = (f"host:{parts.netloc}\n"
                         f"x-amz-content-sha256:{payload_hash}\n"
                         f"x-amz-date:{amz_date}\n")
    signed = "host;x-amz-content-sha256;x-amz-date"
    # query params must be sorted in the canonical request
    q = urllib.parse.parse_qsl(parts.query, keep_blank_values=True)
    cq = "&".join(f"{urllib.parse.quote(k, safe='')}="
                  f"{urllib.parse.quote(v, safe='')}"
                  for k, v in sorted(q))
    canonical = "\n".join([method, urllib.parse.quote(parts.path or "/"),
                           cq, canonical_headers, signed, payload_hash])
    scope = f"{datestamp}/{region}/s3/aws4_request"
    to_sign = "\n".join(["AWS4-HMAC-SHA256", amz_date, scope,
                         hashlib.sha256(canonical.encode()).hexdigest()])

    def _h(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _h(f"AWS4{secret_key}".encode(), datestamp)
    k = _h(k, region)
    k = _h(k, "s3")
    k = _h(k, "aws4_request")
    sig = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
    return {
        "X-Amz-Date": amz_date,
        "X-Amz-Content-Sha256": payload_hash,
        "Authorization": (f"AWS4-HMAC-SHA256 Credential={access_key}/"
                          f"{scope}, SignedHeaders={signed}, "
                          f"Signature={sig}"),
    }


class S3Client:
    """Path-style S3 REST client: http(s)://endpoint/bucket/key."""

    def __init__(self, endpoint: str, bucket: str, access_key: str,
                 secret_key: str, region: str = "us-east-1",
                 timeout: float = 30.0):
        from seatunnel_spark.net import apply_host_aliases

        if "://" not in endpoint:
            endpoint = f"http://{endpoint}"
        self.base = apply_host_aliases(endpoint).rstrip("/")
        self.bucket = bucket.split("://")[-1].strip("/")
        self.access_key, self.secret_key = access_key, secret_key
        self.region, self.timeout = region, timeout

    def _call(self, method: str, key: str = "", query: str = "",
              body: bytes = b"") -> bytes:
        path = f"/{self.bucket}" + (f"/{urllib.parse.quote(key)}"
                                    if key else "")
        url = self.base + path + (f"?{query}" if query else "")
        headers = sigv4_s3_headers(method, url, body, self.region,
                                   self.access_key, self.secret_key)
        req = urllib.request.Request(url, data=body if method == "PUT"
                                     else None, headers=headers,
                                     method=method)
        with urllib.request.urlopen(req, timeout=self.timeout) as r:  # noqa: S310
            return r.read()

    def list(self, prefix: str = "") -> list[str]:
        keys: list[str] = []
        token = None
        while True:
            q = ("list-type=2&prefix="
                 + urllib.parse.quote(prefix.lstrip("/"), safe=""))
            if token:
                q += "&continuation-token=" + urllib.parse.quote(token,
                                                                 safe="")
            root = ET.fromstring(self._call("GET", "", q).decode())
            ns = root.tag.split("}")[0] + "}" if "}" in root.tag else ""
            keys += [c.findtext(f"{ns}Key") for c in
                     root.findall(f"{ns}Contents")]
            token = root.findtext(f"{ns}NextContinuationToken")
            if not token:
                return keys

    def get(self, key: str) -> bytes:
        return self._call("GET", key.lstrip("/"))

    def put(self, key: str, data: bytes) -> None:
        self._call("PUT", key.lstrip("/"), body=data)

    def delete(self, key: str) -> None:
        self._call("DELETE", key.lstrip("/"))


def _client(opts: dict) -> S3Client:
    endpoint = str(opts.get("fs.s3a.endpoint") or opts.get("endpoint"))
    return S3Client(
        endpoint, str(opts.get("bucket") or ""),
        str(opts.get("access_key") or ""),
        str(opts.get("secret_key") or ""),
        region=str(opts.get("region") or "us-east-1"))


def fetch_tree(opts: dict, path: str, local_dir: str) -> list[str]:
    cl = _client(opts)
    base = path.strip("/")
    keys = cl.list(base)
    out: list[str] = []
    for key in keys:
        rel = key[len(base):].lstrip("/") if key.startswith(base) \
            else os.path.basename(key)
        local = os.path.join(local_dir, rel or os.path.basename(key))
        os.makedirs(os.path.dirname(local) or local_dir, exist_ok=True)
        with open(local, "wb") as fh:
            fh.write(cl.get(key))
        out.append(local)
    return out


def upload_tree(opts: dict, local_dir: str, path: str) -> int:
    cl = _client(opts)
    n = 0
    for root, _d, names in os.walk(local_dir):
        for name in names:
            local = os.path.join(root, name)
            rel = os.path.relpath(local, local_dir).replace(os.sep, "/")
            key = f"{path.strip('/')}/{rel}"
            with open(local, "rb") as fh:
                cl.put(key, fh.read())
            n += 1
    return n


__all__ = ["S3Client", "sigv4_s3_headers", "fetch_tree", "upload_tree"]
