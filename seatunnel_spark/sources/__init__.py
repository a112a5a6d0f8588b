"""Source registry.

Reference inventory: ~60 sources (plugin-mapping.properties:25-160,
SURVEY.md §2.4). The rebuild groups them by access pattern rather than
one module per backend — a file source is `spark.read.<format>` with a
path scheme, a JDBC source is one dialect-parameterised partitioned
read, etc. Backends whose client libraries aren't present in this
container are registered but raise a clear NotImplementedError at
connect time (the option surface and plumbing are real).
"""

from __future__ import annotations

from seatunnel_spark.sources.base import Source
from seatunnel_spark.sources.fake import FakeSource
from seatunnel_spark.sources.file import FileSource, FILE_SOURCE_NAMES
from seatunnel_spark.sources.jdbc import JdbcSource, JDBC_ALIAS_NAMES
from seatunnel_spark.sources.http import (HttpSource, PrometheusSource,
                                          Web3jSource, HTTP_SOURCE_NAMES)
from seatunnel_spark.sources.stream import KafkaSource, SocketSource

SOURCES: dict[str, type[Source]] = {"FakeSource": FakeSource}
for n in FILE_SOURCE_NAMES:
    SOURCES[n] = FileSource
for n in JDBC_ALIAS_NAMES:
    SOURCES[n] = JdbcSource
for n in HTTP_SOURCE_NAMES:
    SOURCES[n] = HttpSource
SOURCES["Web3j"] = Web3jSource  # eth JSON-RPC, not a REST pull
SOURCES["Prometheus"] = PrometheusSource  # /api/v1/query(_range) shaping
SOURCES["Kafka"] = KafkaSource
SOURCES["Socket"] = SocketSource


def _rest_paged():
    # Deferred: pyspark.sql.datasource import is non-trivial; only load
    # when the plugin is actually used.
    from seatunnel_spark.sources.python_ds import RestPagedSource

    return RestPagedSource


class _RestPagedProxy(Source):
    NAME = "RestPaged"

    def __new__(cls, options):
        return _rest_paged()(options)


SOURCES["RestPaged"] = _RestPagedProxy


def get_source(name: str, options: dict) -> Source:
    key = name if name in SOURCES else {k.lower(): k for k in SOURCES}.get(name.lower())
    if key is None:
        raise KeyError(f"unknown source {name!r}; known: {sorted(SOURCES)}")
    src = SOURCES[key](options)
    src.plugin_name = key
    return src


__all__ = ["Source", "SOURCES", "get_source"]
