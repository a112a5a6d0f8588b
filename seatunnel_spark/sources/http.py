"""HTTP-family sources (Http + SaaS wrappers).

Reference: connector-http + thin wrappers (MyHours, Lemlist, Klaviyo,
OneSignal, Jira, Gitlab, Github, Notion, Persistiq, Prometheus,
GoogleSheets — SURVEY.md §2.4 'SaaS/HTTP' row).

Design: REST pagination is driver-coordinated (the reference's source
reader does the same single-threaded fetch per split). Page specs are
distributed with `mapInPandas` so N partitions fetch N page-ranges in
parallel — the scalable shape for large exports. JSON rows land via
`spark.createDataFrame` + schema or from_json.

No network in this container: fetch is isolated in `_fetch_pages` and
tests inject a local fetcher.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import parse_schema

HTTP_SOURCE_NAMES = ["Http", "MyHours", "Lemlist", "Klaviyo", "OneSignal", "Jira",
                     "Gitlab", "Github", "Notion", "Persistiq", "Prometheus",
                     "GoogleSheets", "Web3j"]


def _fetch_pages(url: str, method: str, headers: dict, params: dict,
                 body, page_spec: dict | None) -> list[str]:
    """Fetch one or more pages of raw response text. Network isolation
    point — replace/monkeypatch in tests; raises when offline."""
    import urllib.request

    results = []
    pages = [None]
    if page_spec:
        total = int(page_spec.get("total_page_size", 1))
        pages = list(range(1, total + 1))
    for page in pages:
        q = dict(params or {})
        if page is not None and page_spec:
            q[page_spec.get("page_field", "page")] = page
        qs = "&".join(f"{k}={v}" for k, v in q.items())
        full = f"{url}?{qs}" if qs else url
        req = urllib.request.Request(full, method=method,
                                     data=(json.dumps(body).encode() if body else None),
                                     headers=headers or {})
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            results.append(resp.read().decode())
    return results


class HttpSource(Source):
    NAME = "Http"

    def read(self, spark: SparkSession) -> DataFrame:
        url = self.require("url")
        method = str(self.opt("method", "GET")).upper()
        fetcher = self.opt("_fetcher", _fetch_pages)  # test injection point
        raw = fetcher(url, method, self.opt("headers"), self.opt("params"),
                      self.opt("body"), self.opt("pageing"))
        df = spark.createDataFrame([(r,) for r in raw], ["content"])
        fmt = str(self.opt("format", "json")).lower()
        if fmt == "text":
            return df
        schema_opt = self.opt("schema")
        json_field = self.opt("content_field")  # e.g. "$.data" — array of records
        col = F.col("content")
        if json_field:
            col = F.get_json_object(col, json_field)
        if not schema_opt:
            return df.select(col.alias("content"))
        schema = parse_schema(schema_opt.get("fields", schema_opt))
        from pyspark.sql.types import ArrayType

        parsed = F.from_json(col, ArrayType(schema))
        return df.select(F.explode(parsed).alias("r")).select("r.*")
