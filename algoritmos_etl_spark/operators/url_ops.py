"""URL/domain-grain curation — the FIRST stage of every real crawl
pipeline (C4's bad-domain filter, RefinedWeb's URL scoring, the
CommonCrawl dedup order: URL-level exact dedup BEFORE any content
hash). Three operators over the WARC tier's (url, fetch ts) output:

- `normalize_url_col` — RFC 3986-flavored syntactic canonicalization
  as ONE Column expression (zero shuffles, whole-stage codegen):
  fragment strip, scheme+authority lowercase, default-port strip
  (:80 for http, :443 for https — non-default ports survive),
  trailing-slash collapse, tracking-parameter removal
  (utm_*/gclid/fbclid/msclkid/ref) and query-parameter sort. Every
  rule has a DuckDB twin (`normalize_url_cte`) kept in this module so
  the dialects cannot drift. Policy notes: `www.` is NOT stripped
  (it is a real hostname; folding it is a site-specific heuristic),
  http/https are NOT folded (different origins), userinfo is
  lowercased with the authority (not present in crawl fixtures),
  and a string with no `scheme://` passes through as trim(lower(x))
  so non-URL garbage stays inert instead of erroring.
- `url_dedup` — URL-level EXACT dedup, keep-first-by-fetch-ts with a
  raw-url tiebreak (total order even when timestamps collide): one
  hash shuffle on the normalized URL (high-cardinality key — no skew
  beyond real crawl skew, which AQE handles), row_number + group
  count in one window pass.
- `domain_rollup` / `domain_gate` — per-domain aggregation at the
  registrable-domain grain (last two labels — the documented naive
  cut; production would consult the Public Suffix List) and the
  C4-shape blocklist gate (registrable-domain match, so a blocklist
  entry covers all its subdomains).

Reference scope note: the reference (/root/reference) has no URL
surface; this module is extension surface for the 100 TB
training-data brief (VERDICT r10 task #1), consuming the round-10
WARC tier (`sources/warc.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tracking parameters removed by normalization — the published
# cross-site tracking set (Google Analytics utm_*, Google/Facebook/
# Microsoft click ids, bare ref). Anchored at the param name so a
# legitimate `?href=` or `?butm_x=` survives; `(=|$)` so a VALUELESS
# tracking param (`?utm_source`, `?gclid`) is removed too instead of
# splitting what should be one canonical URL (ADVICE r11 #4).
TRACKING_PARAM_RE = "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)(=|$)"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)"


def normalize_url_col(url: Column) -> Column:
    """Canonical form of `url` (see module doc for the rule set and
    policy). Pure built-in Column expression — runs inside
    whole-stage codegen, no UDF, no shuffle."""
    u0 = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u0, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u0, _AUTH_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_replace(F.regexp_extract(u0, _PATH_RE, 1), "/+$", "")
    q = F.regexp_extract(u0, "\\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    q2 = F.array_join(kept, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when(scheme == "", F.trim(F.lower(url))).otherwise(rebuilt)


def normalize_url_cte(src: str, url_col: str = "url") -> str:
    """DuckDB twin of `normalize_url_col` as a WITH-fragment: consumes
    relation `src` (which must expose `url_col`), defines relations
    `_n0.._n2` and `normed` = src + `url_norm`. Kept next to the
    Column version so the dialects cannot drift. DuckDB gotchas
    pinned here: regexp_extract returns '' on no-match (same as
    Spark), string_split('') is [''] (same), but array_to_string([])
    is NULL where Spark's array_join([]) is '' — hence the coalesce."""
    return f"""_n0 AS (
        SELECT *, regexp_replace({url_col}, '#.*$', '') AS _u0 FROM {src}
    ),
    _n1 AS (
        SELECT *,
            lower(regexp_extract(_u0, '{_SCHEME_RE}', 1)) AS _scheme,
            lower(regexp_extract(_u0, '{_AUTH_RE}', 1)) AS _auth,
            regexp_extract(_u0, '{_PATH_RE}', 1) AS _rawpath,
            regexp_extract(_u0, '\\?(.*)$', 1) AS _q
        FROM _n0
    ),
    _n2 AS (
        SELECT *,
            CASE WHEN _scheme = 'http' THEN regexp_replace(_auth, ':80$', '')
                 WHEN _scheme = 'https' THEN regexp_replace(_auth, ':443$', '')
                 ELSE _auth END AS _host,
            regexp_replace(_rawpath, '/+$', '') AS _path,
            coalesce(array_to_string(list_sort(list_filter(
                string_split(_q, '&'),
                x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')
            )), '&'), '') AS _q2
        FROM _n1
    ),
    normed AS (
        SELECT * EXCLUDE (_u0, _scheme, _auth, _rawpath, _q, _host,
                          _path, _q2),
            CASE WHEN _scheme = '' THEN trim(lower({url_col}))
                 ELSE _scheme || '://' || _host || _path ||
                      (CASE WHEN _q2 = '' THEN ''
                            ELSE '?' || _q2 END) END AS url_norm
        FROM _n2
    )"""


def url_host_col(url_norm: Column) -> Column:
    """Hostname of a NORMALIZED url (port stripped even when
    non-default — a domain gate keys on the name, not the port)."""
    return F.regexp_replace(
        F.regexp_extract(url_norm, _AUTH_RE, 1), ":[0-9]+$", ""
    )


def registrable_domain_col(host: Column) -> Column:
    """Last two labels of the host — the naive registrable-domain cut
    (module-doc policy note: production consults the Public Suffix
    List; two labels is the deterministic, dependency-free floor).
    Single-label hosts (e.g. 'localhost') pass through whole."""
    two = F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    return F.when(two == "", host).otherwise(two)


def url_host_sql(url_norm: str) -> str:
    """DuckDB twin of `url_host_col`."""
    return (
        f"regexp_replace(regexp_extract({url_norm}, '{_AUTH_RE}', 1),"
        " ':[0-9]+$', '')"
    )


def registrable_domain_sql(host: str) -> str:
    """DuckDB twin of `registrable_domain_col`."""
    return (
        f"(CASE WHEN regexp_extract({host}, '([^.]+\\.[^.]+)$', 1) = ''"
        f" THEN {host}"
        f" ELSE regexp_extract({host}, '([^.]+\\.[^.]+)$', 1) END)"
    )


def url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_date",
) -> DataFrame:
    """URL-level exact dedup: one row per CANONICAL url, keeping the
    first fetch (min `ts_col`, raw-url tiebreak — a total order, so
    the keeper is engine-independent even when the fetch clock
    collides). Output: every `pages` column of the kept row, plus
    `url_norm` and `n_dups` (group size — the re-crawl count a
    curation report wants).

    Scale shape: ONE hash shuffle on url_norm (the window's
    partitionBy); row_number and the group count share that single
    window pass. At crawl scale the canonical URL is a
    high-cardinality nearly-unique key — skew only where real crawls
    have it (hot pages re-fetched constantly), which AQE's skew-join
    handling and the 2-column narrowness of the exchanged row keep
    benign."""
    w = Window.partitionBy("url_norm").orderBy(ts_col, url_col)
    grp = Window.partitionBy("url_norm")
    return (
        pages.withColumn("url_norm", normalize_url_col(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(grp))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def domain_rollup(
    pages: DataFrame,
    url_col: str = "url",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Per-registrable-domain aggregation with the C4-shape blocklist
    verdict: (domain, n_pages, n_hosts, n_urls, blocked). `blocklist`
    entries are registrable domains — matching is at that grain, so
    one entry covers every subdomain. One partial-agg shuffle onto
    the domain grain (bounded by the web's registrable-domain count,
    ~milllions — trivially clustered at 100 TB); the blocklist is a
    literal isin against the bounded list (a real pipeline would
    broadcast-join a blocklist table; isin keeps the fixture's plan
    free of a join on a 2-element list)."""
    norm = normalize_url_col(F.col(url_col))
    host = url_host_col(F.col("url_norm"))
    dom = registrable_domain_col(F.col("_host"))
    enriched = (
        pages.withColumn("url_norm", norm)
        .withColumn("_host", host)
        .withColumn("domain", dom)
    )
    blocked = (
        F.col("domain").isin(*blocklist) if blocklist else F.lit(False)
    )
    return (
        enriched.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("_host").alias("n_hosts"),
            F.countDistinct("url_norm").alias("n_urls"),
        )
        .withColumn("blocked", blocked)
    )


def domain_gate(
    pages: DataFrame,
    blocklist: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose registrable domain is blocklisted (the C4
    bad-domain filter). Map-only: the verdict is a per-row expression
    against the bounded literal list — zero shuffles, composes in
    front of any curation gate."""
    dom = registrable_domain_col(
        url_host_col(normalize_url_col(F.col(url_col)))
    )
    return pages.filter(~dom.isin(*blocklist))
