"""AmazonSqs source/sink — AWS Query protocol over stdlib HTTP with
real SigV4 request signing (works against live SQS; the in-process
mini server skips auth verification).

Reference: connector-amazonsqs (config: url, region, access_key_id,
secret_access_key, format + schema decode, delete_message;
message_group_id for FIFO sends).

Spark shape: SQS is a message queue, not a partitioned log — receives
drain through ReceiveMessage loops (batch mode reads until empty);
the sink SendMessageBatch'es 10 at a time per partition.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


def _sigv4_headers(method: str, url: str, body: bytes, region: str,
                   access_key: str | None, secret_key: str | None,
                   service: str = "sqs") -> dict:
    """AWS Signature Version 4 (public spec: docs.aws.amazon.com/
    general/latest/gr/sigv4_signing.html)."""
    if not access_key:
        return {}
    parts = urllib.parse.urlsplit(url)
    now = _dt.datetime.now(_dt.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(body).hexdigest()
    canonical_headers = (f"host:{parts.netloc}\n"
                         f"x-amz-date:{amz_date}\n")
    signed_headers = "host;x-amz-date"
    canonical = "\n".join([
        method, parts.path or "/", parts.query, canonical_headers,
        signed_headers, payload_hash])
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(canonical.encode()).hexdigest()])

    def _hmac(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _hmac(f"AWS4{secret_key}".encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    signature = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
    return {
        "X-Amz-Date": amz_date,
        "Authorization": (f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
                          f"SignedHeaders={signed_headers}, "
                          f"Signature={signature}"),
    }


class SqsClient:
    def __init__(self, queue_url: str, region: str = "us-east-1",
                 access_key: str | None = None,
                 secret_key: str | None = None, timeout: float = 30.0):
        self.url = apply_host_aliases(queue_url)
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.timeout = timeout

    def _action(self, action: str, params: dict) -> ET.Element:
        body = urllib.parse.urlencode(
            {"Action": action, "Version": "2012-11-05", **params}).encode()
        headers = {"Content-Type": "application/x-www-form-urlencoded",
                   **_sigv4_headers("POST", self.url, body, self.region,
                                    self.access_key, self.secret_key)}
        req = urllib.request.Request(self.url, data=body, headers=headers,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return ET.fromstring(resp.read())

    @staticmethod
    def _strip(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def _find_all(self, root: ET.Element, name: str):
        return [e for e in root.iter() if self._strip(e.tag) == name]

    def send_batch(self, messages: list[str],
                   group_id: str | None = None) -> None:
        for i in range(0, len(messages), 10):
            params: dict = {}
            for j, m in enumerate(messages[i:i + 10], 1):
                params[f"SendMessageBatchRequestEntry.{j}.Id"] = str(j)
                params[f"SendMessageBatchRequestEntry.{j}.MessageBody"] = m
                if group_id:
                    params[f"SendMessageBatchRequestEntry.{j}"
                           ".MessageGroupId"] = group_id
            self._action("SendMessageBatch", params)

    def receive(self, max_messages: int = 10) -> list[tuple[str, str]]:
        """[(receipt_handle, body)]"""
        root = self._action("ReceiveMessage",
                            {"MaxNumberOfMessages": str(max_messages)})
        out = []
        for msg in self._find_all(root, "Message"):
            handle = body = None
            for child in msg:
                if self._strip(child.tag) == "ReceiptHandle":
                    handle = child.text
                elif self._strip(child.tag) == "Body":
                    body = child.text
            out.append((handle or "", body or ""))
        return out

    def delete(self, receipt_handle: str) -> None:
        self._action("DeleteMessage", {"ReceiptHandle": receipt_handle})


class SqsSource(Source):
    NAME = "AmazonSqs"

    def _client(self) -> SqsClient:
        return SqsClient(self.require("url"),
                         self.opt("region", "us-east-1"),
                         self.opt("access_key_id"),
                         self.opt("secret_access_key"))

    def read(self, spark: SparkSession) -> DataFrame:
        """Drain the queue (bounded batch read). SQS has no replayable
        offsets — the queue IS the state, so the fetch happens once on
        the driver connection and decode parallelizes after."""
        from seatunnel_spark.formats import decode_payload

        cl = self._client()
        delete = bool(self.opt("delete_message", False))
        bodies: list[str] = []
        while True:
            msgs = cl.receive(10)
            if not msgs:
                break
            for handle, body in msgs:
                bodies.append(body)
                if delete:
                    cl.delete(handle)
        raw = spark.createDataFrame([(b,) for b in bodies] or [(None,)],
                                    "value string").filter("value IS NOT NULL")
        schema_opt = self.opt("schema")
        if schema_opt:
            return decode_payload(
                raw, str(self.opt("format", "json")).upper(), schema_opt,
                delimiter=self.opt("field_delimiter", ","))
        return raw.withColumnRenamed("value", "content")


class SqsSink(Sink):
    NAME = "AmazonSqs"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        import json as _json

        # resolve aliases on the DRIVER; the closure ships the endpoint
        url = apply_host_aliases(self.require("url"))
        region = self.opt("region", "us-east-1")
        ak, sk = self.opt("access_key_id"), self.opt("secret_access_key")
        group = self.opt("message_group_id")
        fmt = str(self.opt("format", "json")).lower()
        delim = self.opt("field_delimiter", ",")
        meta = [ROW_KIND_COL, TABLE_ID_COL]

        def write_partition(rows):
            cl = SqsClient(url, region, ak, sk)
            batch: list[str] = []
            for row in rows:
                d = row.asDict(recursive=True)
                for c in meta:
                    d.pop(c, None)
                if fmt == "text":
                    batch.append(delim.join(str(v) for v in d.values()))
                else:
                    batch.append(_json.dumps(d, default=str))
                if len(batch) >= 10:
                    cl.send_batch(batch, group)
                    batch.clear()
            if batch:
                cl.send_batch(batch, group)

        df.foreachPartition(write_partition)


__all__ = ["SqsClient", "SqsSource", "SqsSink"]
