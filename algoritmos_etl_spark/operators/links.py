"""Host-graph link analytics — the RefinedWeb/CommonCrawl curation
prior the HTML tier was throwing away: harvest `<a href>` targets
during extraction, resolve them against the page's own host, roll the
endpoints up to the Public-Suffix-List registrable-domain grain, and
run the engine's integer fixed-point PageRank (`operators/graph.py`)
over the resulting edge list. The rank is a DOMAIN-quality signal a
crawl pipeline joins back as a gate input (`plans/crawl.py` takes it
as the optional `host_rank` argument).

Scale shape: href extraction and resolution are map-only Column
expressions (whole-stage codegen — no Python anywhere); the edge
rollup is one partial-agg shuffle onto the (src domain, dst domain)
pair grain, which is bounded by the square of the web's registrable-
domain count but in practice by the link structure (~edges of the
host graph: billions of rows from 100 TB of pages, trivially
shuffled); the fixed-point loop then runs on the BOUNDED domain
graph, exactly like `textrank_keywords` runs on the vocabulary graph
— 100 TB of HTML feeds one partial-agg shuffle, and the 10 iterations
cost 10 bounded shuffles on the domain key.

Reference scope note: the reference (/root/reference) has no link or
graph surface; this module is extension surface for the 100 TB
training-data brief (VERDICT r11 task #3 — "host-graph link
analytics"), composing the r10/r11 WARC + URL tiers with the r9
integer PageRank engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph import pagerank
from .url_ops import _AUTH_RE, url_host_col, with_registrable_domain_psl

# href attribute inside an anchor tag, either quote style — bounded
# lookahead so a pathological tag can't make the regex scan the page
_HREF_RE = "(?i)<a\\s[^>]{0,500}?href\\s*=\\s*[\"']([^\"']*)[\"']"

# href schemes that are not navigation — no edge, not even a self-edge
_SKIP_RE = "^(mailto:|javascript:|tel:|data:|about:)"


def extract_hrefs_col(html: Column) -> Column:
    """All `<a href>` values in `html`, document order, as
    array<string> — one JVM regex pass, no Python."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1))


def link_target_host_col(href: Column, page_host: Column) -> Column:
    """The lowercase port-stripped host a href NAVIGATES to, resolved
    against the page's own (already-normalized) host: absolute URLs
    keep their authority, protocol-relative `//host/..` borrows
    https, anything else (rooted or relative paths, bare `?query`)
    stays on the page host; fragments-only, empty, and non-navigation
    schemes (mailto/javascript/tel/data/about) yield NULL."""
    h = F.regexp_replace(F.trim(href), "#.*$", "")
    widened = F.when(
        h.rlike("^//"), F.concat(F.lit("https:"), h)
    ).otherwise(h)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(widened, _AUTH_RE, 1)), ":[0-9]+$", ""
    )
    is_abs = widened.rlike(_AUTH_RE)
    return (
        F.when(h.rlike(_SKIP_RE) | (h == ""), F.lit(None))
        .when(is_abs, host)
        .otherwise(page_host)
    )


def host_link_edges(
    pages: DataFrame,
    url_col: str = "url_norm",
    html_col: str = "html",
) -> DataFrame:
    """(u, v, w) — the registrable-domain link graph of `pages`
    (already URL-deduped rows exposing a normalized URL and the raw
    HTML): u links to v with weight w = number of anchors. Self-edges
    at the domain grain (site navigation — the overwhelming majority
    of real links) are dropped; domains come from the PSL
    longest-suffix match (broadcast joins, map-only). One shuffle:
    the partial-agg count onto the (u, v) pair grain."""
    exploded = pages.select(
        url_host_col(F.col(url_col)).alias("_page_host"),
        F.explode(extract_hrefs_col(F.col(html_col))).alias("_href"),
    )
    targeted = exploded.select(
        "_page_host",
        link_target_host_col(F.col("_href"), F.col("_page_host")).alias(
            "_tgt_host"
        ),
    ).filter(F.col("_tgt_host").isNotNull() & (F.col("_tgt_host") != ""))
    src = with_registrable_domain_psl(targeted, "_page_host", out_col="u")
    both = with_registrable_domain_psl(src, "_tgt_host", out_col="v")
    return (
        both.filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def host_pagerank(
    pages: DataFrame,
    iterations: int = 10,
    url_col: str = "url_norm",
    html_col: str = "html",
) -> DataFrame:
    """Domain-grain PageRank over the crawl's link graph — the
    RefinedWeb-style quality prior: (domain, rank_e12, n_out, n_in)
    with rank in the engine's 1e12 integer fixed point (bit-identical
    on any engine/partitioning — `graph.pagerank`'s contract, so the
    iterative algorithm carries a full value-hash oracle). n_out /
    n_in are distinct linked-domain degrees; external domains the
    crawl never fetched appear with n_out = 0 (they receive rank,
    emit none — the simple dangling convention)."""
    # the domain-grain edge list is BOUNDED (the host graph, not the
    # corpus); checkpoint it EAGERLY so the rank loop and the two
    # degree rollups share one materialization — with a lazy
    # checkpoint, the three branches of the final join race to
    # compute the unmaterialized block inside one job and each pays
    # the full crawl-parse subtree (measured 18 s -> ~5 s at sf0.01)
    edges = host_link_edges(
        pages, url_col=url_col, html_col=html_col
    ).localCheckpoint()
    ranks = pagerank(edges, iterations=iterations)
    n_out = edges.groupBy(F.col("u").alias("node")).agg(
        F.count_distinct("v").alias("n_out")
    )
    n_in = edges.groupBy(F.col("v").alias("node")).agg(
        F.count_distinct("u").alias("n_in")
    )
    return (
        ranks.join(n_out, "node", "left")
        .join(n_in, "node", "left")
        .select(
            F.col("node").alias("domain"),
            "rank_e12",
            F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"),
            F.coalesce("n_in", F.lit(0)).cast("long").alias("n_in"),
        )
        .orderBy(F.col("rank_e12").desc(), F.col("domain").asc())
    )
