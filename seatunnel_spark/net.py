"""Networking helpers shared by HTTP-facing sources/sinks/transforms."""

from __future__ import annotations

import os
from urllib.parse import urlsplit, urlunsplit


def apply_host_aliases(url: str, aliases: str | None = None) -> str:
    """$SEATUNNEL_SPARK_HOST_ALIASES="mockserver=127.0.0.1,db=10.0.0.5"
    rewrites URL hostnames — the Docker extra_hosts analog, so job
    configs written for a container network (the reference's e2e confs
    target http://mockserver:1080) run unmodified. The value is read on
    the DRIVER and shipped in the task closure — executor Python
    workers are long-lived and don't see late env changes."""
    if aliases is None:
        aliases = os.environ.get("SEATUNNEL_SPARK_HOST_ALIASES", "")
    if not aliases:
        return url
    # urlsplit lowercases hostnames, so match aliases case-insensitively
    # (DNS names are case-insensitive anyway).
    mapping = {k.lower(): v for k, v in
               (kv.split("=", 1) for kv in aliases.split(",") if "=" in kv)}
    parts = urlsplit(url)
    # a "host:port=target" alias wins over a bare "host=target" one —
    # services exposing several ports on one hostname (Doris FE: HTTP
    # 8030 + MySQL 9030) can remap each port to its own fixture
    hostport = (f"{parts.hostname}:{parts.port}"
                if parts.hostname and parts.port else None)
    alias_key = (hostport if hostport in mapping
                 else parts.hostname if parts.hostname in mapping else None)
    if alias_key is not None:
        target = mapping[alias_key]
        if "://" in target:
            # Full-endpoint alias ("es=http://127.0.0.1:9200"): scheme,
            # host AND port come from the alias — lets a conf written
            # for a TLS container endpoint replay against a local plain
            # HTTP fixture.
            t = urlsplit(target)
            return urlunsplit((t.scheme, t.netloc, parts.path,
                               parts.query, parts.fragment))
        netloc = target
        if parts.port:
            netloc += f":{parts.port}"
        return urlunsplit((parts.scheme, netloc, parts.path,
                           parts.query, parts.fragment))
    return url


def resolve_jdbc_url(url: str) -> str:
    """Apply host aliases to a jdbc:...//host:port/db URL on the DRIVER
    so closures ship final endpoints (executor Python workers are
    long-lived and don't see late env changes). Only the netloc is
    taken from the alias — the jdbc sub-scheme (postgresql/mysql/...)
    carries dialect information and must survive even a full-endpoint
    alias like "postgresql=tcp://127.0.0.1:5433"."""
    if url.startswith("jdbc:phoenix:thin:"):
        # the endpoint lives in the url= property — alias THAT (on the
        # driver, like every other family; executors never re-resolve)
        head, _, rest = url.partition("thin:")
        parts = []
        for kv in rest.split(";"):
            if kv.startswith("url="):
                kv = "url=" + apply_host_aliases(kv[4:])
            parts.append(kv)
        return head + "thin:" + ";".join(parts)
    if url.startswith("jdbc:snowflake:"):
        # resolve the account endpoint WITH scheme (a full-endpoint
        # alias can downgrade https->http for a local fixture); the
        # resolved form round-trips through SnowflakeRestClient.
        # Path/query connection parameters (db, schema, warehouse,
        # role) survive the rewrite, and an explicit http:// scheme is
        # kept when no alias rewrites the endpoint.
        body = url[len("jdbc:snowflake:"):]
        if body.startswith("//"):
            body = "https:" + body
        p = urlsplit(body)
        r = urlsplit(apply_host_aliases(
            urlunsplit((p.scheme, p.netloc, "", "", ""))))
        return "jdbc:snowflake:" + urlunsplit(
            (r.scheme, r.netloc, p.path, p.query, p.fragment))
    prefix, rest = ("jdbc:", url[len("jdbc:"):]) if url.startswith("jdbc:") \
        else ("", url)
    # jdbc:sqlserver carries ;prop=value pairs where a path would be —
    # split them off before urlsplit (';' in a netloc breaks .port)
    props = ""
    if "//" in rest:
        head, sep, tail = rest.partition("//")
        hostpart, semi, props_part = tail.partition(";")
        if semi:
            rest = head + sep + hostpart
            props = ";" + props_part
    parts = urlsplit(rest)
    resolved = urlsplit(apply_host_aliases(rest))
    return prefix + urlunsplit((parts.scheme, resolved.netloc, parts.path,
                                parts.query, parts.fragment)) + props
