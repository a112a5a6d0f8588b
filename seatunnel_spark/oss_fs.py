"""Aliyun OSS REST filesystem helpers (stdlib) for the OssFile
connector — the OSS twin of s3_fs.py.

Implements the public OSS REST API signature (header-based HMAC-SHA1,
help.aliyun.com/zh/oss/developer-reference/include-signatures-in-the-
authorization-header): Signature = base64(hmac_sha1(secret,
VERB\\nContent-MD5\\nContent-Type\\nDate\\nCanonicalizedOSSHeaders
CanonicalizedResource)), Authorization: "OSS <key>:<sig>". Requests
are path-style against the (aliased) endpoint; the canonicalized
resource is /bucket/object by definition regardless of URL style.
Listing = GET /bucket?prefix=...&marker=... with NextMarker
pagination. Production OssFile rides hadoop-aliyun over oss://; this
client exists so the oss e2e confs run against the in-process mini
server, same bounded-fixture story as FTP/S3.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import os
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET


def oss_signature(method: str, secret: str, bucket: str, key: str,
                  date: str, content_type: str = "",
                  content_md5: str = "", subresource: str = "") -> str:
    resource = f"/{bucket}/" + key.lstrip("/") + subresource
    to_sign = "\n".join([method, content_md5, content_type, date]) \
        + "\n" + resource
    return base64.b64encode(hmac.new(
        secret.encode(), to_sign.encode(), hashlib.sha1).digest()).decode()


class OssClient:
    """auth_prefix "OSS" (Aliyun) or "OBS" (Huawei OBS — the same
    header-HMAC-SHA1 scheme with an OBS authorization prefix,
    support.huaweicloud.com OBS API authentication)."""

    def __init__(self, endpoint: str, bucket: str, access_key: str,
                 access_secret: str, timeout: float = 30.0,
                 auth_prefix: str = "OSS"):
        self.auth_prefix = auth_prefix
        from seatunnel_spark.net import apply_host_aliases

        if "://" not in endpoint:
            endpoint = f"https://{endpoint}"
        self.base = apply_host_aliases(endpoint).rstrip("/")
        self.bucket = bucket.split("://")[-1].strip("/")
        self.ak, self.sk = access_key, access_secret
        self.timeout = timeout

    def _call(self, method: str, key: str = "", query: str = "",
              body: bytes = b"") -> bytes:
        date = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%a, %d %b %Y %H:%M:%S GMT")
        ctype = "application/octet-stream" if method == "PUT" else ""
        sig = oss_signature(method, self.sk, self.bucket, key, date,
                            content_type=ctype)
        path = f"/{self.bucket}" + (f"/{urllib.parse.quote(key)}"
                                    if key else "")
        url = self.base + path + (f"?{query}" if query else "")
        headers = {"Date": date,
                   "Authorization": f"{self.auth_prefix} {self.ak}:{sig}"}
        if ctype:
            headers["Content-Type"] = ctype
        req = urllib.request.Request(url, data=body if method == "PUT"
                                     else None, headers=headers,
                                     method=method)
        with urllib.request.urlopen(req, timeout=self.timeout) as r:  # noqa: S310
            return r.read()

    def list(self, prefix: str = "") -> list[str]:
        keys: list[str] = []
        marker = ""
        while True:
            q = "prefix=" + urllib.parse.quote(prefix.lstrip("/"), safe="")
            if marker:
                q += "&marker=" + urllib.parse.quote(marker, safe="")
            root = ET.fromstring(self._call("GET", "", q).decode())
            ns = root.tag.split("}")[0] + "}" if "}" in root.tag else ""
            page = [c.findtext(f"{ns}Key")
                    for c in root.findall(f"{ns}Contents")]
            keys += page
            if root.findtext(f"{ns}IsTruncated") == "true" and page:
                marker = root.findtext(f"{ns}NextMarker") or page[-1]
            else:
                return keys

    def get(self, key: str) -> bytes:
        return self._call("GET", key.lstrip("/"))

    def put(self, key: str, data: bytes) -> None:
        self._call("PUT", key.lstrip("/"), body=data)


def _client(opts: dict, auth_prefix: str = "OSS") -> OssClient:
    return OssClient(
        str(opts.get("endpoint") or opts.get("fs.oss.endpoint")),
        str(opts.get("bucket") or ""),
        str(opts.get("access_key") or ""),
        str(opts.get("access_secret") or opts.get("secret_key") or ""),
        auth_prefix=auth_prefix)


def fetch_tree(opts: dict, path: str, local_dir: str,
               auth_prefix: str = "OSS") -> list[str]:
    cl = _client(opts, auth_prefix)
    base = path.strip("/")
    out: list[str] = []
    for key in cl.list(base):
        rel = key[len(base):].lstrip("/") if key.startswith(base) \
            else os.path.basename(key)
        local = os.path.join(local_dir, rel or os.path.basename(key))
        os.makedirs(os.path.dirname(local) or local_dir, exist_ok=True)
        with open(local, "wb") as fh:
            fh.write(cl.get(key))
        out.append(local)
    return out


def upload_tree(opts: dict, local_dir: str, path: str,
                auth_prefix: str = "OSS") -> int:
    cl = _client(opts, auth_prefix)
    n = 0
    for root, _d, names in os.walk(local_dir):
        for name in names:
            local = os.path.join(root, name)
            rel = os.path.relpath(local, local_dir).replace(os.sep, "/")
            with open(local, "rb") as fh:
                cl.put(f"{path.strip('/')}/{rel}", fh.read())
            n += 1
    return n


__all__ = ["OssClient", "oss_signature", "fetch_tree", "upload_tree"]
