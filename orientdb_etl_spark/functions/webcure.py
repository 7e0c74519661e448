"""Web-corpus URL curation: normalization, registered-domain extraction,
domain blocklists, and per-domain caps.

Large-scale crawl curation (RefinedWeb, Penedo et al. 2023; C4, Raffel et
al. 2020) treats the URL as a first-class quality signal: normalize it so
syntactic variants collapse, aggregate quality per registered domain, drop
blocklisted domains, and cap the number of pages any one domain may
contribute to the training mix. All of that is expressible as JVM column
expressions plus one keyed window — no Python in the hot path.

Scale shape at 100 TB:
- :func:`normalize_url` / :func:`registered_domain` are pure per-row
  expressions fused into the scan (zero exchanges).
- :func:`domain_filter` against a literal list is an ``isin`` scan filter;
  against a DataFrame it is a broadcast semi/anti join (blocklists are
  small dims by construction).
- :func:`per_domain_cap` is ONE shuffle on the domain key, with Zipfian
  hot domains bounded by Catalyst's partial ``WindowGroupLimit`` rewrite
  (map-side top-k truncation before the exchange — see the function
  docstring and the plan test).

No counterpart in the reference (no URL handling anywhere in
/root/reference/src — closest is OHttpSource.java's transport); this is a
north-star extension per SURVEY §2.8.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Query parameters that carry tracking state, not content identity
#: (Google Analytics utm_*, Facebook/Google/Microsoft click ids, Mailchimp).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="

#: Common multi-label public suffixes for the registered-domain heuristic.
#: A full public-suffix list is a data file, not code; this covers the
#: dominant ccTLD second-level registries and is explicitly a heuristic.
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "co.za",
)


def _hostport(url: Column) -> Column:
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1)
    )


def url_host(url: Column | str, strip_www: bool = True) -> Column:
    """Lowercased host with port and (optionally) a leading ``www.``
    removed. Empty string for inputs without a ``scheme://``."""
    url = F.col(url) if isinstance(url, str) else url
    host = F.regexp_replace(_hostport(F.trim(url)), r":\d+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def normalize_url(
    url: Column | str,
    strip_www: bool = True,
    tracking_param_re: str = TRACKING_PARAM_RE,
) -> Column:
    """Canonical form of an absolute URL, as one JVM expression tree.

    Steps (each a documented crawl-dedup convention): trim; drop the
    fragment; lowercase scheme and host; strip default ports (http:80,
    https:443) and optionally ``www.``; drop tracking query parameters
    and sort the survivors (param order is not content identity);
    collapse duplicate slashes in the path and drop a trailing slash
    (root stays ``/``). Inputs without ``scheme://`` pass through
    trimmed (relative references are not crawl URLs).
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    no_frag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
    )
    hostport = _hostport(no_frag)
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    bare = F.regexp_replace(hostport, r":\d+$", "")
    host = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        bare,
    ).otherwise(hostport)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_extract(
        no_frag, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)", 1
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: (p != "") & ~p.rlike(tracking_param_re),
            )
        ),
        "&",
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def registered_domain(
    url: Column | str,
    multi_suffixes: Sequence[str] = MULTI_SUFFIXES,
) -> Column:
    """Heuristic registered domain (eTLD+1) of a URL's host: the last two
    host labels, or the last three when the last two form a known
    second-level registry suffix (``bbc.co.uk`` not ``co.uk``). Hosts
    with fewer labels (or no host at all) return the host itself."""
    parts = F.split(url_host(url), r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_multi = last2.isin(*multi_suffixes)
    return (
        F.when(n <= 1, F.element_at(parts, -1))
        .when((n >= 3) & is_multi, last3)
        .otherwise(last2)
    )


def domain_filter(
    df: DataFrame,
    domain_col: str,
    blocked: Sequence[str] | DataFrame,
    mode: str = "block",
) -> DataFrame:
    """Drop (``mode='block'``) or keep-only (``mode='allow'``) rows whose
    domain appears in ``blocked``. A literal list compiles to an ``isin``
    scan predicate; a DataFrame becomes a broadcast anti/semi join (the
    corpus side never shuffles — blocklists are broadcast-sized)."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be block|allow, got {mode!r}")
    if isinstance(blocked, DataFrame):
        bl = F.broadcast(blocked.toDF("_bl_domain").distinct())
        how = "left_anti" if mode == "block" else "left_semi"
        return df.join(bl, df[domain_col] == bl["_bl_domain"], how)
    pred = F.col(domain_col).isin(*[str(d) for d in blocked])
    return df.filter(~pred if mode == "block" else pred)


def per_domain_cap(
    df: DataFrame,
    domain_col: str,
    n: int,
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep at most ``n`` rows per domain, best-first by ``order_by``
    (pass explicit ``F.col(...).desc()`` columns for quality-descending;
    always include a unique id as the last key for determinism).

    ONE shuffle on the domain key, and it is skew-bounded natively:
    Catalyst rewrites ``row_number() <= n`` into a partial
    ``WindowGroupLimit`` that truncates each upstream task to its local
    top ``n`` per domain BEFORE the exchange (the same shape as partial
    aggregation for ``MAX``), so a Zipfian hot domain — the blogspot
    problem — ships at most ``n × num_upstream_tasks`` rows to its
    reducer instead of its full page count. Asserted in
    tests/test_plans.py; do NOT hand-roll a salted pre-pass here, it
    adds a second full shuffle for something the optimizer already does."""
    if n <= 0:
        raise ValueError(f"cap must be positive, got {n}")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(domain_col).orderBy(*cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    strip_www: bool = True,
) -> DataFrame:
    """Exact URL-level dedup: group by :func:`normalize_url` and keep the
    row with the smallest id (deterministic survivor). One hash-agg
    shuffle on the normalized key; no pair materialization."""
    w = Window.partitionBy("_url_norm").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_url_norm", normalize_url(url_col, strip_www=strip_www))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
