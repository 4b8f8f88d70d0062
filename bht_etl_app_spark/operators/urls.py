"""URL / domain operators — the cheapest and FIRST stage of every
real crawl-curation pipeline (CCNet, RefinedWeb, FineWeb all run URL
filtering and URL-level dedup before any text parses): URL
canonicalization, host / registered-domain extraction, domain
blocklist filtering, and URL-level exact dedup.

Reference parity note: the reference app has no URL stage (its
surface is survey tabulation); this module is part of the
training-data extension surface (VERDICT r11 #3).

Every expression is a pure per-row projection built ONLY from
RE2-compatible regexes (no backrefs, no lookaround — the identical
pattern strings run in Spark's java.util.regex and the DuckDB
oracle's RE2; replacement strings avoid group references entirely
because the two engines spell them differently). At 100 TB these run
at scan speed; the only shuffle in the family is the canonical-URL
groupBy of :func:`url_canonical_dedup`, which shuffles
``(canonical_url, id)`` pairs — never page content.

Canonicalization rules (documented contract, in order):

1. fragment dropped (``#...``);
2. scheme and host lowercased; userinfo (``user@``) dropped;
3. default ports stripped (``:80`` for http, ``:443`` for https);
4. tracking query parameters removed: ``utm_*``, ``fbclid``,
   ``gclid``, ``ref`` (the FineWeb/ClickHouse-style minimal list —
   parameter ORDER of the survivors is preserved, not sorted);
5. a bare root path ``/`` is dropped (``http://a.com/`` ==
   ``http://a.com``); other paths are preserved byte-for-byte.

Registered-domain extraction uses a deliberately small embedded
public-suffix list (the co.uk/com.au class) — the expression shape
is the point; a production deployment swaps in the full PSL as a
broadcast table without changing any plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bht_etl_app_spark.session import ensure_min_parallelism

__all__ = [
    "SCHEME_RE",
    "HOSTPORT_RE",
    "REST_RE",
    "TRACKING_PARAM_RE",
    "REGISTERED_DOMAIN_RE",
    "url_scheme_expr",
    "url_host_expr",
    "canonical_url_expr",
    "registered_domain_expr",
    "url_parse",
    "url_canonical_dedup",
    "domain_blocklist_filter",
]

# the four shared pattern constants (the CC_PATTERN discipline: ONE
# string, used verbatim by both engines)
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
# path + query (fragment excluded) after the authority
REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
# one '&'-prefixed tracking parameter (the query is pre-seeded with a
# leading '&' so every parameter is uniformly '&'-prefixed and the
# removal needs no group-reference replacement)
TRACKING_PARAM_RE = r"&(?:utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&]*"
# registrable domain: two labels by default, three under the embedded
# multi-label public suffixes (listed FIRST so the alternation prefers
# them at the same start position in both engines)
REGISTERED_DOMAIN_RE = (
    r"([^.]+\.(?:co\.uk|org\.uk|gov\.uk|ac\.uk|com\.au|co\.jp|co\.in"
    r"|com\.br)|[^.]+\.[^.]+)$"
)


def url_scheme_expr(col: Column | str) -> Column:
    """Lowercased scheme, '' when the value is not ``scheme://...``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, SCHEME_RE, 1))


def url_host_expr(col: Column | str) -> Column:
    """Lowercased host without userinfo or port, '' when absent."""
    c = F.col(col) if isinstance(col, str) else col
    hostport = F.regexp_extract(c, HOSTPORT_RE, 1)
    # drop userinfo (everything through the last '@'), then the port
    no_user = F.regexp_extract(hostport, r"([^@]*)$", 1)
    return F.lower(F.regexp_extract(no_user, r"^([^:]*)", 1))


def _port_expr(col: Column) -> Column:
    hostport = F.regexp_extract(col, HOSTPORT_RE, 1)
    no_user = F.regexp_extract(hostport, r"([^@]*)$", 1)
    return F.regexp_extract(no_user, r":([0-9]+)$", 1)


def canonical_url_expr(col: Column | str) -> Column:
    """The documented 5-rule canonical form; NULL when the value has
    no ``scheme://host`` shape."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = url_scheme_expr(c)
    host = url_host_expr(c)
    port = _port_expr(c)
    rest = F.regexp_extract(c, REST_RE, 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"[?](.*)$", 1)
    # uniform '&'-prefix trick: prepend '&', strip tracking params,
    # then drop the single leading '&' that survives (if any)
    q_clean = F.regexp_replace(
        F.regexp_replace(F.concat(F.lit("&"), query), TRACKING_PARAM_RE, ""),
        r"^&",
        "",
    )
    port_keep = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path_keep = F.when(path == "/", F.lit("")).otherwise(path)
    q_keep = F.when(q_clean == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), q_clean)
    )
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, port_keep, path_keep, q_keep),
    )


def registered_domain_expr(col: Column | str) -> Column:
    """Registrable domain of an already-extracted HOST (use
    :func:`url_host_expr` first): 'www.' stripped, then the embedded
    mini-PSL alternation; a dotless host returns itself; '' stays ''."""
    c = F.col(col) if isinstance(col, str) else col
    no_www = F.regexp_replace(c, r"^www\.", "")
    rd = F.regexp_extract(no_www, REGISTERED_DOMAIN_RE, 1)
    return F.when(rd == "", no_www).otherwise(rd)


def url_parse(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-row URL decomposition report: ``(doc_id, url, scheme,
    host, registered_domain, canonical_url)``. Pure projection — at
    100 TB this is scan-bound with zero shuffle."""
    host = url_host_expr(url_col)
    return ensure_min_parallelism(df).select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        url_scheme_expr(url_col).alias("scheme"),
        host.alias("host"),
        registered_domain_expr(host).alias("registered_domain"),
        canonical_url_expr(url_col).alias("canonical_url"),
    )


def url_canonical_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup on the canonical form — the
    :func:`dedup.dedup_exact` discipline one stage earlier in the
    pipeline (no text ever parses for a URL-duplicate page): keep the
    minimum id per canonical URL. Output: ``(doc_id, canonical_url,
    group_size)`` for surviving rows; rows whose URL fails to parse
    (NULL canonical) are passed through as their own group. Shuffles
    ``(canonical_url, id)`` only."""
    canon = ensure_min_parallelism(df).select(
        F.col(id_col),
        # a NULL canonical must not collapse all malformed rows into
        # one group — key them by their own raw value
        F.coalesce(
            canonical_url_expr(url_col), F.col(url_col)
        ).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select(id_col, "canonical_url", "group_size")
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: list[str] | DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc domain-blocklist verdicts: ``(doc_id, url, host,
    registered_domain, blocked)``. The match key is the REGISTERED
    domain, so ``spam.net`` blocks ``a.b.spam.net`` without
    wildcards.

    ``blocklist`` as a Python list compiles to a literal IN predicate
    (pure map-side — right for the embedded-test/small-list case); as
    a DataFrame with a ``domain`` column it becomes a broadcast LEFT
    join (the production shape: a real blocklist is ~1e6 domains —
    parameter-sized for a broadcast, never a shuffle of the corpus)."""
    host = url_host_expr(url_col)
    base = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        host.alias("host"),
        registered_domain_expr(host).alias("registered_domain"),
    )
    if isinstance(blocklist, DataFrame):
        bl = F.broadcast(
            blocklist.select(
                F.lower(F.col("domain")).alias("registered_domain")
            )
            .distinct()
            .withColumn("__blocked__", F.lit(True))
        )
        return base.join(bl, "registered_domain", "left").select(
            id_col,
            "url",
            "host",
            "registered_domain",
            F.coalesce(F.col("__blocked__"), F.lit(False)).alias("blocked"),
        )
    doms = sorted({d.lower() for d in blocklist})
    blocked = (
        F.col("registered_domain").isin(doms) if doms else F.lit(False)
    )
    return base.select(
        id_col, "url", "host", "registered_domain", blocked.alias("blocked")
    )
