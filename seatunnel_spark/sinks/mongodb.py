"""MongoDB sink — batched OP_MSG inserts/upserts/deletes.

Reference: connector-mongodb/.../sink/MongodbSinkWriter (buffer-flush
.max-rows batching, upsert-enable + primary-key -> replaceOne upsert
keyed on the PK fields, RowKind DELETE/UPDATE_BEFORE -> deleteOne,
retry.max/retry.interval re-posts).

Spark shape: df.foreachPartition, one wire connection per executor
partition, flushes every `buffer-flush.max-rows` documents.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


def _to_doc(d: dict) -> dict:
    # Row.asDict(recursive=True) values are already BSON-encodable
    # (datetime/Decimal/bytes handled by the codec); Rows became dicts.
    return d


class MongoSink(Sink):
    NAME = "MongoDB"
    table_groups = None
    input_name = "sink"

    def wants_observation(self) -> bool:
        return False  # foreachPartition (RDD action, no observe)

    def write(self, df: DataFrame) -> None:
        if self.table_groups:
            for tid, tdf in self.table_groups.items():
                sub = MongoSink(self.options)
                sub.input_name = tid
                sub.write(tdf)
            return
        from seatunnel_spark.net import apply_host_aliases

        uri = apply_host_aliases(self.require("uri"))
        db = self.require("database")
        coll = str(self.require("collection")).replace(
            "${table_name}", self.input_name.split(".")[-1])
        keys = self.opt("primary-key") or self.opt("primary_keys")
        if isinstance(keys, str):
            keys = [keys]
        upsert = bool(self.opt("upsert-enable"))
        max_rows = int(self.opt("buffer-flush.max-rows", 1000))
        max_retry = int(self.opt("retry.max", 3))
        retry_ivl = float(self.opt("retry.interval", 1000)) / 1000.0
        has_kind = ROW_KIND_COL in df.columns
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            from seatunnel_spark.sources.mongodb import MongoClientLite

            cl = MongoClientLite(uri)
            inserts: list[dict] = []
            updates: list[dict] = []
            deletes: list[dict] = []

            def flush():
                for attempt in range(max_retry):
                    try:
                        if inserts:
                            cl.insert_many(db, coll, inserts)
                        if updates:
                            cl.update(db, coll, updates)
                        if deletes:
                            cl.delete(db, coll, deletes)
                        inserts.clear()
                        updates.clear()
                        deletes.clear()
                        return
                    except Exception:  # noqa: BLE001
                        if attempt == max_retry - 1:
                            raise
                        time.sleep(retry_ivl)

            try:
                for row in rows:
                    d = row.asDict(recursive=True)
                    kind = d.get(ROW_KIND_COL, "+I") if has_kind else "+I"
                    for c in meta:
                        d.pop(c, None)
                    doc = _to_doc(d)
                    if kind in ("-D", "-U"):
                        if not keys:
                            raise ValueError("MongoDB sink: deletes require "
                                             "primary-key")
                        deletes.append({"q": {k: doc[k] for k in keys},
                                        "limit": 1})
                    elif upsert and keys:
                        updates.append({"q": {k: doc[k] for k in keys},
                                        "u": doc, "upsert": True,
                                        "multi": False})
                    else:
                        inserts.append(doc)
                    if len(inserts) + len(updates) + len(deletes) >= max_rows:
                        flush()
                flush()
            finally:
                cl.close()

        df.foreachPartition(write_partition)


__all__ = ["MongoSink"]
