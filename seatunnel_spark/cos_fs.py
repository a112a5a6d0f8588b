"""Tencent COS REST filesystem helpers (stdlib) for the CosFile
connector — the COS sibling of s3_fs/oss_fs.

Implements the public COS XML-API request signature
(cloud.tencent.com/document/product/436/7778): SignKey =
HMAC-SHA1(SecretKey, KeyTime); HttpString =
"{method}\\n{uri-pathname}\\n{params}\\n{headers}\\n"; StringToSign =
"sha1\\n{KeyTime}\\n{sha1(HttpString)}\\n"; Signature =
HMAC-SHA1(SignKey, StringToSign); carried as the
q-sign-algorithm=sha1&q-ak=...&q-signature=... Authorization header.
The q-header-list / q-url-param-list here are empty (signing a subset
is allowed by the spec; the verifier recomputes from the declared
lists). Listing = GET /bucket?prefix=... (ListBucketResult, NextMarker
pagination, same shape as OSS). The endpoint derives from the conf's
region (cos.<region>.myqcloud.com) and is host-aliased to the mini
server in tests; production CosFile rides hadoop-cos over cosn://.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import time
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET


def cos_authorization(method: str, pathname: str, secret_id: str,
                      secret_key: str, key_time: str | None = None) -> str:
    if key_time is None:
        now = int(time.time())
        key_time = f"{now - 60};{now + 3600}"
    sign_key = hmac.new(secret_key.encode(), key_time.encode(),
                        hashlib.sha1).hexdigest()
    http_string = f"{method.lower()}\n{pathname}\n\n\n"
    to_sign = ("sha1\n" + key_time + "\n"
               + hashlib.sha1(http_string.encode()).hexdigest() + "\n")
    sig = hmac.new(sign_key.encode(), to_sign.encode(),
                   hashlib.sha1).hexdigest()
    return ("q-sign-algorithm=sha1&q-ak=" + secret_id
            + "&q-sign-time=" + key_time + "&q-key-time=" + key_time
            + "&q-header-list=&q-url-param-list=&q-signature=" + sig)


def verify_cos_authorization(auth: str, method: str, pathname: str,
                             credentials: dict[str, str]) -> bool:
    fields = dict(kv.split("=", 1) for kv in auth.split("&") if "=" in kv)
    ak = fields.get("q-ak", "")
    key_time = fields.get("q-key-time", "")
    secret = credentials.get(ak)
    if secret is None or not key_time:
        return False
    want = cos_authorization(method, pathname, ak, secret,
                             key_time=key_time)
    return want == auth


class CosClient:
    def __init__(self, region: str, bucket: str, secret_id: str,
                 secret_key: str, timeout: float = 30.0):
        from seatunnel_spark.net import apply_host_aliases

        self.bucket = bucket.split("://")[-1].strip("/")
        endpoint = f"https://cos.{region}.myqcloud.com"
        self.base = apply_host_aliases(endpoint).rstrip("/")
        self.ak, self.sk = secret_id, secret_key
        self.timeout = timeout

    def _call(self, method: str, key: str = "", query: str = "",
              body: bytes = b"") -> bytes:
        pathname = f"/{self.bucket}" + (f"/{key}" if key else "")
        url = (self.base + f"/{self.bucket}"
               + (f"/{urllib.parse.quote(key)}" if key else "")
               + (f"?{query}" if query else ""))
        headers = {"Authorization": cos_authorization(
            method, pathname, self.ak, self.sk)}
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


def _client(opts: dict) -> CosClient:
    return CosClient(
        str(opts.get("region") or ""), str(opts.get("bucket") or ""),
        str(opts.get("secret_id") or ""), str(opts.get("secret_key") or ""))


def fetch_tree(opts: dict, path: str, local_dir: str) -> list[str]:
    cl = _client(opts)
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


def upload_tree(opts: dict, local_dir: str, path: str) -> int:
    cl = _client(opts)
    n = 0
    for root, _d, names in os.walk(local_dir):
        for name in names:
            local = os.path.join(root, name)
            rel = os.path.relpath(local, local_dir).replace(os.sep, "/")
            with open(local, "rb") as fh:
                cl.put(f"{path.strip('/')}/{rel}", fh.read())
            n += 1
    return n


__all__ = ["CosClient", "cos_authorization", "verify_cos_authorization",
           "fetch_tree", "upload_tree"]
