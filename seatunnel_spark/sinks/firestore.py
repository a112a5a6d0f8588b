"""Google Firestore sink over the public REST API (v1).

Reference: connector-google-firestore — FirestoreConfig.java
(project_id, credentials base64 service-account JSON, collection),
FirestoreSinkWriter.java (collection.add(serializedRow): one
auto-ID document per row).

REST path: POST
https://firestore.googleapis.com/v1/projects/{p}/databases/(default)/
documents/{collection} with a typed `fields` payload (createDocument
with server-assigned ID — the add() analog). Auth is the standard
Google OAuth2 service-account flow: RS256-signed JWT exchanged at the
token_uri (via the `cryptography` package when present). Without
credentials the sink speaks the Firestore-emulator convention
(`Authorization: Bearer owner`), which is how tests drive it.

Scale: writes run per partition via foreachPartition, one HTTP call
per document like the reference's writer (the REST batchWrite
endpoint caps at 500 ops; per-doc create keeps parity with add()).
"""

from __future__ import annotations

import base64
import json
import time
import urllib.request

from pyspark.sql import DataFrame

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL

FIRESTORE_BASE = "https://firestore.googleapis.com/v1"


def to_firestore_value(v):
    """Python value -> Firestore typed value JSON."""
    import datetime
    import decimal

    if v is None:
        return {"nullValue": None}
    if isinstance(v, bool):
        return {"booleanValue": v}
    if isinstance(v, int):
        return {"integerValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    if isinstance(v, decimal.Decimal):
        return {"doubleValue": float(v)}
    if isinstance(v, (bytes, bytearray)):
        return {"bytesValue": base64.b64encode(bytes(v)).decode()}
    if isinstance(v, datetime.datetime):
        return {"timestampValue": v.strftime("%Y-%m-%dT%H:%M:%S.%fZ")}
    if isinstance(v, datetime.date):
        return {"stringValue": v.isoformat()}
    if isinstance(v, (list, tuple)):
        return {"arrayValue": {"values": [to_firestore_value(x) for x in v]}}
    if isinstance(v, dict):
        return {"mapValue": {"fields": {
            str(k): to_firestore_value(x) for k, x in v.items()}}}
    return {"stringValue": str(v)}


def service_account_token(creds: dict) -> str:
    """OAuth2 JWT-bearer flow for a service account (public Google
    auth protocol). Requires the `cryptography` package for RS256."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    def b64(data: bytes) -> bytes:
        return base64.urlsafe_b64encode(data).rstrip(b"=")

    now = int(time.time())
    header = b64(json.dumps({"alg": "RS256", "typ": "JWT"}).encode())
    claims = b64(json.dumps({
        "iss": creds["client_email"],
        "scope": "https://www.googleapis.com/auth/datastore",
        "aud": creds["token_uri"], "iat": now, "exp": now + 3600,
    }).encode())
    signing_input = header + b"." + claims
    key = serialization.load_pem_private_key(
        creds["private_key"].encode(), password=None)
    sig = b64(key.sign(signing_input, padding.PKCS1v15(), hashes.SHA256()))
    jwt = (signing_input + b"." + sig).decode()

    body = (f"grant_type=urn%3Aietf%3Aparams%3Aoauth%3A"
            f"grant-type%3Ajwt-bearer&assertion={jwt}").encode()
    req = urllib.request.Request(
        apply_host_aliases(creds["token_uri"]), data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"})
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return json.loads(resp.read())["access_token"]


class FirestoreSink(Sink):
    NAME = "GoogleFirestore"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        project = self.require("project_id")
        collection = self.require("collection")
        base = apply_host_aliases(self.opt("_base_url", FIRESTORE_BASE))
        creds_b64 = self.opt("credentials")
        token = "owner"  # Firestore emulator convention
        if creds_b64:
            try:
                creds = json.loads(base64.b64decode(creds_b64))
                token = service_account_token(creds)
            except (ValueError, UnicodeDecodeError):
                # placeholder credentials (the e2e conf's
                # "dummy-credentials") -> emulator token, like the
                # reference IT running against the Firestore emulator
                pass
        url = (f"{base}/projects/{project}/databases/(default)/"
               f"documents/{collection}")
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            for row in rows:
                d = row.asDict(recursive=True)
                for c in meta:
                    d.pop(c, None)
                doc = {"fields": {k: to_firestore_value(v)
                                  for k, v in d.items()}}
                req = urllib.request.Request(
                    url, method="POST", data=json.dumps(doc).encode(),
                    headers={"Content-Type": "application/json",
                             "Authorization": f"Bearer {token}"})
                with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
                    resp.read()

        df.foreachPartition(write_partition)


__all__ = ["FirestoreSink", "to_firestore_value", "service_account_token"]
