"""Sink registry.

Reference inventory: ~57 sinks (plugin-mapping.properties, SURVEY.md
§2.5), grouped here by write pattern: console/assert (test), files
(one class × backends × formats), JDBC (savemode + upsert), Kafka,
in-memory (tests/driver handoff).
"""

from __future__ import annotations

from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sinks.console import ConsoleSink
from seatunnel_spark.sinks.assert_sink import AssertSink
from seatunnel_spark.sinks.file import FileSink, FILE_SINK_NAMES
from seatunnel_spark.sinks.jdbc import JdbcSink
from seatunnel_spark.sinks.memory import InMemorySink

SINKS: dict[str, type[Sink]] = {
    "Console": ConsoleSink,
    "Assert": AssertSink,
    "Jdbc": JdbcSink,
    "InMemory": InMemorySink,
}
for n in FILE_SINK_NAMES:
    SINKS[n] = FileSink


def get_sink(name: str, options: dict) -> Sink:
    key = name if name in SINKS else {k.lower(): k for k in SINKS}.get(name.lower())
    if key is None:
        raise KeyError(f"unknown sink {name!r}; known: {sorted(SINKS)}")
    sink = SINKS[key](options)
    sink.plugin_name = key
    return sink


__all__ = ["Sink", "SINKS", "get_sink"]
