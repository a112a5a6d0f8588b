"""Mini Tablestore (OTS): PutRow/DeleteRow/BatchWriteRow/GetRange over
protobuf + PlainBuffer with x-ots signature verification."""

from __future__ import annotations

import base64
import hashlib
import hmac
import struct
import urllib.parse

from seatunnel_spark import pb
from seatunnel_spark.sources.tablestore import (
    _InfMax,
    _InfMin,
    decode_rows,
    encode_row,
    plainbuffer,
)
from seatunnel_spark.testing.rest_servers import _Handler, _serve


class MiniOts:
    def __init__(self, secret: str = "sk"):
        self.secret = secret
        # table -> {pk_tuple: {"pk": {...}, "attrs": {...}}}
        self.tables: dict[str, dict] = {}
        self.bad_signatures = 0

    def seed(self, table: str, pk: dict, attrs: dict):
        self.tables.setdefault(table, {})[tuple(pk.values())] = {
            "pk": dict(pk), "attrs": dict(attrs)}


def _key_of(pk_vals: tuple):
    """Sortable key (mixed int/str pk columns sort by type then value)."""
    return tuple((0, v) if isinstance(v, (int, float)) else (1, str(v))
                 for v in pk_vals)


def start_mini_ots(port: int = 0, secret: str = "sk"):
    ots = MiniOts(secret)

    class H(_Handler):
        def _verify(self, api: str, body: bytes) -> bool:
            headers = {k.lower(): v for k, v in self.headers.items()
                       if k.lower().startswith("x-ots-")
                       and k.lower() != "x-ots-signature"}
            canon = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
            sign = f"/{api}\nPOST\n\n{canon}"
            want = base64.b64encode(hmac.new(
                secret.encode(), sign.encode(),
                hashlib.sha1).digest()).decode()
            if want != self.headers.get("x-ots-signature"):
                ots.bad_signatures += 1
                return False
            md5 = base64.b64encode(hashlib.md5(body).digest()).decode()
            return md5 == self.headers.get("x-ots-contentmd5")

        def do_POST(self):
            api = urllib.parse.urlsplit(self.path).path.strip("/")
            body = self._body()
            if not self._verify(api, body):
                return self._reply(401, {"code": "OTSAuthFailed"})
            req = pb.decode(body)
            if api in ("PutRow", "DeleteRow"):
                table = pb.first_str(req, 1)
                row = decode_rows(pb.first(req, 2, b""))[0]
                store = ots.tables.setdefault(table, {})
                key = tuple(row["pk"].values())
                if api == "DeleteRow" or row["delete"]:
                    store.pop(key, None)
                else:
                    store[key] = {"pk": row["pk"], "attrs": row["attrs"]}
                return self._reply(200, None, raw=b"")
            if api == "BatchWriteRow":
                tbl_pb = pb.decode(pb.first(req, 1, b""))
                table = pb.first_str(tbl_pb, 1)
                store = ots.tables.setdefault(table, {})
                for change_pb in tbl_pb.get(2, []):
                    ch = pb.decode(change_pb)
                    op = pb.first(ch, 1, 1)  # 1 PUT, 3 DELETE
                    row = decode_rows(pb.first(ch, 2, b""))[0]
                    key = tuple(row["pk"].values())
                    if op == 3 or row["delete"]:
                        store.pop(key, None)
                    else:
                        store[key] = {"pk": row["pk"],
                                      "attrs": row["attrs"]}
                return self._reply(200, None, raw=b"")
            if api == "GetRange":
                table = pb.first_str(req, 1)
                limit = pb.first(req, 4, 1000)
                start = decode_rows(pb.first(req, 5, b""))[0]["pk"]
                end = decode_rows(pb.first(req, 6, b""))[0]["pk"]
                store = ots.tables.get(table, {})

                def bound(pkv, default):
                    out = []
                    for v in pkv.values():
                        if isinstance(v, _InfMin):
                            out.append((-1,))
                        elif isinstance(v, _InfMax):
                            out.append((2,))
                        else:
                            out.append(_key_of((v,))[0])
                    return tuple(out) if out else default

                lo = bound(start, ())
                hi = bound(end, ((2,),))
                keys = sorted(store, key=_key_of)
                sel = [k for k in keys
                       if lo <= _key_of(k) and _key_of(k) < hi]
                page, rest = sel[:limit], sel[limit:]
                rows_pb = plainbuffer([
                    encode_row(list(store[k]["pk"].items()),
                               list(store[k]["attrs"].items()))
                    for k in page])
                resp = pb.fbytes(1, pb.fvar(1, 0)) + pb.fbytes(3, rows_pb)
                if rest:
                    nxt = plainbuffer([encode_row(
                        list(store[rest[0]]["pk"].items()))])
                    resp += pb.fbytes(2, nxt)
                return self._reply(200, None, raw=resp)
            return self._reply(400, {"code": "OTSParameterInvalid"})

    port, stop = _serve(H, port)
    return ots, port, stop


__all__ = ["MiniOts", "start_mini_ots"]
