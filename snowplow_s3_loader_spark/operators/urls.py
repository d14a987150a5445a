"""URL canonicalization + URL/domain-level deduplication — the one
standard pretraining-dedup axis running before any content-based pass
(CCNet/RefinedWeb/Dolma all dedup by normalized URL first and cap
per-domain document counts to stop template farms from dominating the
mixture).

Everything here is PURE EXPRESSIONS (whole-stage codegen, no UDF):
canonicalization is a chain of regexp/array builtins both engines
evaluate identically; dedup is ONE keyed aggregation on the canonical
URL; the per-domain cap is one domain-keyed window ranked by the
engine-portable md5 of the canonical URL (deterministic, and
composable with the q58 deterministic-split discipline — the same
hash-ordering idea).

Canonicalization contract (applied in this order):
  1. trim; strip the fragment (#...)
  2. scheme and host lowercase; userinfo (user:pass@) dropped; a
     string without a scheme://host shape canonicalizes to NULL
     (loudly visible, never silently kept); bracketed IPv6 hosts are
     kept whole (ports still split correctly)
  3. leading 'www.' dropped from the host
  4. default ports dropped (http:80, https:443); other ports kept
  5. duplicate slashes in the path collapsed; trailing slash dropped
     (the root path stays '/'; an empty path becomes '/')
  6. tracking params (utm_*, fbclid, gclid) removed; surviving params
     sorted bytewise and re-joined (param ORDER never splits a URL)

Registered-domain extraction is the standard last-two-labels rule with
a small fixed set of two-level public suffixes (co.uk-style) promoting
to three labels — an explicit approximation of the public-suffix list,
documented and test-pinned, not a hidden heuristic.

Scale shape at 100 TB: canonicalization is codegen'd row-local work;
the only shuffles are the canonical-URL aggregation and the
domain-keyed rank window (both on the reduced URL frame, not raw rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# explicit two-level public-suffix approximation (kept tiny and pinned
# by tests; the full PSL is a data file, not an algorithm change)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.kr", "com.br", "com.cn",
)

_TRACKING = "^(utm_|fbclid|gclid)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract; NULL when the
    input has no scheme://host shape."""
    u = F.regexp_replace(F.trim(url), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # drop userinfo; split host/port IPv6-aware (a bracketed host may
    # contain colons, so the port is only what follows the brackets)
    hp = F.regexp_replace(hostport, r"^[^@/]*@", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hp, r"^(\[[^\]]*\]|[^:]*)", 1)),
        r"^www\.",
        "",
    )
    port = F.regexp_extract(hp, r"^(?:\[[^\]]*\]|[^:]*):([0-9]+)$", 1)
    keep_port = (
        F.when(port == "", "")
        .when((scheme == "http") & (port == "80"), "")
        .when((scheme == "https") & (port == "443"), "")
        .otherwise(F.concat(F.lit(":"), port))
    )
    pathq = rest.substr(F.length(hostport) + 1, F.length(rest))
    raw_path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(raw_path, "/{2,}", "/")
    path = F.when(path == "", "/").otherwise(
        F.when(path != "/", F.regexp_replace(path, "/$", "")).otherwise(path)
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept_params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (~p.rlike(_TRACKING)) & (p != ""),
            )
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        keep_port,
        path,
        F.when(kept_params != "", F.concat(F.lit("?"), kept_params)).otherwise(
            F.lit("")
        ),
    )
    return F.when((scheme != "") & (host != ""), canon)


def url_host(canonical: Column) -> Column:
    """Host of an already-canonical URL (lowercase, no www, no port
    stripping needed beyond the canonical form's own); bracketed IPv6
    hosts come back whole."""
    return F.regexp_extract(
        canonical, r"^[a-z0-9+.-]+://(\[[^\]]*\]|[^/:?]*)", 1
    )


def registered_domain(host: Column) -> Column:
    """Last-two-labels registered domain, promoting to three labels for
    the pinned two-level public suffixes (co.uk style). IP-literal
    hosts (IPv4 dotted quads, bracketed IPv6) have no registrable
    domain and return whole."""
    is_ip = host.rlike(r"^(\[|[0-9.]+$)")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return (
        F.when(is_ip | (n <= 2), host)
        .when(is_two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Exact URL-level dedup: ONE aggregation keyed by the canonical
    URL. Output: (canonical_url, domain, n_dups, keep_id) — keep_id is
    the smallest id (deterministic winner). Rows whose URL fails to
    canonicalize are EXCLUDED (they carry no dedup key; route them to a
    bad-row path upstream if they must be kept)."""
    canon = canonicalize_url(F.col(url_col)).alias("canonical_url")
    return (
        df.select(canon, F.col(id_col).alias("__id"))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("__id").alias("keep_id"),
        )
        .withColumn("domain", registered_domain(url_host(F.col("canonical_url"))))
    )


def domain_cap(deduped: DataFrame, cap: int) -> DataFrame:
    """Per-domain document cap over the url_dedup output: rank the
    domain's canonical URLs by (md5(url), url) — engine-portable and
    deterministic, like the q58 split hash — and flag rank <= cap as
    kept. One window over the reduced URL frame."""
    if cap < 1:
        raise ValueError(f"domain_cap: cap must be >= 1, got {cap}")
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("canonical_url")), F.col("canonical_url")
    )
    return deduped.withColumn("drank", F.row_number().over(w)).withColumn(
        "kept", (F.col("drank") <= cap).cast("int")
    )
