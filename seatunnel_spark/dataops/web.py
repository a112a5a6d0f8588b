"""Web-corpus URL operators: canonicalization and canonical-URL dedup.

Reference parity: the reference has no web/URL surface (SURVEY.md
§2.7); this extends the training-data-pipeline operators the brief
asks for — URL canonicalization is the FIRST dedup key of every crawl
pipeline (the same page is fetched as http/https, with/without www,
with tracking params, with/without trailing slash), cheaper and
stricter than any content hash.

Scale shape: canonicalization is a pure zero-shuffle codegen
expression chain (regexp part extraction + an in-row array
filter/sort for the query string — no UDF, no explode); the dedup on
top is one map-side-combined groupBy on the canonical string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["canonical_url", "canonicalize_urls", "url_dedup_groups"]

# params that identify a tracking/attribution system, not a resource
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)(=|$)"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL — the dedup key:

    - scheme and host lowercased (path case is PRESERVED — it is
      significant per RFC 3986); userinfo stripped;
    - leading `www.` and the scheme's default port (:80/:443) dropped;
    - fragment dropped;
    - tracking params (utm_*, gclid, fbclid, msclkid, ref, mc_*)
      removed and the surviving query params SORTED (param order is
      almost never significant; sorting makes `?a=1&b=2` and
      `?b=2&a=1` collide);
    - trailing slashes on the path collapsed (`/a/` == `/a`; bare
      authority becomes `/`).

    Non-absolute inputs (no `scheme://`) pass through trimmed and
    otherwise untouched — a relative URL has no canonical absolute
    form without a base, and inventing one would alias distinct
    resources. Pure codegen: regexp extraction + an in-row
    filter/array_sort/array_join on the split query string.
    """
    u = F.trim(url) if isinstance(url, str) else F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    host = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "https",
                  F.regexp_replace(host, r":443$", "")) \
            .when(scheme == "http",
                  F.regexp_replace(host, r":80$", "")) \
            .otherwise(host)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1),
                            r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.split(F.regexp_extract(u, _QUERY_RE, 1), "&")
    kept = F.array_sort(F.filter(
        params, lambda x: (x != "") & ~x.rlike(_TRACKING_RE)))
    query = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"), F.array_join(kept, "&"))) \
             .otherwise(F.lit(""))
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, path, query))


def canonicalize_urls(df: DataFrame, url_col: str,
                      out_col: str = "canon_url") -> DataFrame:
    """Attach the canonical form of `url_col` as `out_col` — a
    zero-shuffle projection (see canonical_url)."""
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dedup_groups(df: DataFrame, url_col: str,
                     id_col: str) -> DataFrame:
    """Canonical-URL dedup summary -> (canon_url, n_docs, keeper_id):
    one row per canonical URL with its fetch count and the
    deterministic keeper (minimum id) — the crawl-dedup ledger (join
    back on keeper_id to materialize the surviving corpus, the same
    apply pattern as exact_dedup). One map-side-combined shuffle on
    the canonical string; raw documents never move."""
    return (canonicalize_urls(df, url_col)
            .groupBy("canon_url")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(id_col).alias("keeper_id")))
