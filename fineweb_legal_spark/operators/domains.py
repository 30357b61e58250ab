"""Domain blocklist filtering — the FineWeb-style URL gate the substring
reject (webfilter F2) can't express: a blocklist entry must match the
URL's host EXACTLY or as a PARENT domain ("spam.example" blocks
"cdn.a.spam.example") without ever matching inside an unrelated host
("notspam.example" stays clean — substring matching gets this wrong both
ways).

Scale shape: each URL's host explodes into its O(labels) suffix chain
(a.b.c → a.b.c, b.c, c — bounded by label count, ~4-6 in practice), and
the chain semi-joins against the blocklist. With a blocklist that fits a
broadcast (millions of entries — the realistic case) the plan is scan →
explode → BroadcastHashJoin(LeftSemi) → dedup back to one verdict per
row, zero shuffles of the corpus. Pass `broadcast_list=False` to fall
back to a shuffle semi-join on the suffix when the blocklist is
adversarially huge — the same decision documented for boilerplate.py.

Everything is native columns: host via parse_url + lower + strip port,
the suffix chain via a sequence/transform over split labels (HOFs here
run once per URL, not per char — the cheap place for them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(col: Column) -> Column:
    """Lowercased host of a URL, port stripped, trailing dot dropped;
    NULL when the URL has no parseable host."""
    # try_parse_url: Spark 4 parse_url THROWS on malformed URLs (ANSI);
    # web corpora always contain junk URLs, so NULL-on-invalid is the
    # only shippable semantic
    host = F.lower(F.try_parse_url(col, F.lit("HOST")))
    host = F.regexp_replace(host, r":\d+$", "")
    return F.nullif(F.regexp_replace(host, r"\.$", ""), F.lit(""))


def domain_suffix_chain(host: Column) -> Column:
    """Array of the host and every parent domain with >= 2 labels, plus
    the TLD itself: a.b.co -> [a.b.co, b.co, co]. Built with one split +
    transform (per-URL, label-bounded)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


# Query parameters that identify a click, not a page — the standard
# strip-set of web-corpus URL canonicalizers (anchored; utm_* is a family).
_TRACKING_PARAM_RX = (
    r"^(?:utm_[^=&]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src)"
    r"(?:=.*)?$"
)


def canonicalize_url(
    col: Column,
    strip_www: bool = True,
    sort_query: bool = True,
    fold_scheme: bool = False,
) -> Column:
    """Canonical form of a URL for URL-level dedup (the FineWeb-style
    pre-text-dedup pass: crawls re-fetch the same page under trivially
    different URLs, and dropping those BEFORE text dedup removes most
    duplicate mass for the cost of a string key, no shingling).

    Normalizations: fragment dropped; scheme + authority lowercased;
    default ports (:80 http / :443 https) and empty ports stripped;
    host trailing dot dropped; leading ``www.`` dropped (also after a
    userinfo ``@``) when `strip_www`; trailing path slashes dropped
    (``/a/`` == ``/a``, root collapses to empty); tracking query params
    (utm_*, gclid, fbclid, ...) removed; remaining params sorted when
    `sort_query` (param order is transport noise); `fold_scheme` drops
    the scheme entirely so http/https fetches of one page share a key.
    Path and query VALUES keep their case — those are semantic. Inputs
    with no scheme pass through the same authority/path/query pipeline;
    junk that parses as nothing comes back lowercased-authority-only,
    which is still a stable dedup key. NULL in, NULL out.

    All native expressions (regexp + one split/filter/sort HOF over the
    query params — per-URL, param-bounded work); no UDF, no shuffle."""
    u = F.regexp_replace(F.trim(col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # tail offset from the RAW authority: Unicode lowercasing can change
    # character length (e.g. a dotted capital I), which would shift it
    auth_raw = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = rest.substr(F.length(auth_raw) + 1, F.length(rest))
    auth = F.lower(auth_raw)
    auth = F.regexp_replace(auth, r":$", "")
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    auth = F.regexp_replace(auth, r"(\.)(:\d+)?$", "$2")  # host trailing dot
    if strip_www:
        auth = F.regexp_replace(auth, r"^www\.", "")
        auth = F.regexp_replace(auth, r"@www\.", "@")
    path = F.regexp_replace(F.regexp_extract(tail, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(tail, r"^[^?]*\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RX),
    )
    if sort_query:
        params = F.array_sort(params)
    q = F.array_join(params, "&")
    base = (
        auth
        if fold_scheme
        else F.when(scheme != "", F.concat(scheme, F.lit("://"), auth)).otherwise(auth)
    )
    out = F.concat(
        base, path, F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(out)


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = True,
    sort_query: bool = True,
    fold_scheme: bool = False,
    broadcast_losers: bool = True,
) -> DataFrame:
    """Keep one deterministic winner (min `id_col`) per canonical URL;
    rows whose URL is NULL are never dropped (no key, no duplicate
    claim). Same slim-exchange strategy as the pipeline's text dedup:
    the window shuffles (id, canonical-url) pairs only — never document
    text — and the LOSER id set (typically a small fraction of a crawl)
    comes back as a broadcast anti-join, so the corpus itself is never
    shuffled. `broadcast_losers=False` degrades to a shuffle anti-join
    on id for adversarial duplicate rates (the documented fallback
    shared with pipeline.py's dedup)."""
    from pyspark.sql import Window

    key = canonicalize_url(
        F.col(url_col),
        strip_www=strip_www,
        sort_query=sort_query,
        fold_scheme=fold_scheme,
    )
    slim = df.select(F.col(id_col).alias("_id"), key.alias("_k")).filter(
        F.col("_k").isNotNull()
    )
    w = Window.partitionBy("_k").orderBy("_id")
    losers = (
        slim.select("_id", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") > 1)
        .select("_id")
    )
    if broadcast_losers:
        losers = F.broadcast(losers)
    return df.join(losers, df[id_col] == losers["_id"], "left_anti")


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    broadcast_list: bool = True,
) -> DataFrame:
    """Append `blocked` (boolean) per row: true iff the URL's host or any
    parent domain appears in `blocklist` (a one-column `domain` frame,
    entries lowercase). Rows with no parseable host are never blocked.

    Implementation: explode the suffix chain, LEFT SEMI join the chain
    against the blocklist, then mark the surviving original rows via the
    row's host — the corpus row itself is never shuffled when the
    blocklist broadcasts; only (host, suffix) pairs exist transiently
    inside one stage."""
    bl = blocklist.select(F.lower("domain").alias("_bl_domain")).distinct()
    if broadcast_list:
        bl = F.broadcast(bl)
    hosts = (
        df.select(url_host(F.col(url_col)).alias("_host"))
        .filter(F.col("_host").isNotNull())
        .distinct()
    )
    hit_hosts = (
        hosts.select(
            "_host", F.explode(domain_suffix_chain(F.col("_host"))).alias("_sfx")
        )
        .join(bl, F.col("_sfx") == F.col("_bl_domain"), "left_semi")
        .select("_host")
        .distinct()
        .withColumn("_blocked_hit", F.lit(True))
    )
    # join the verdict back by host. The blocked-host set scales with
    # blocklist coverage, not corpus size; force the broadcast only on
    # the same flag as the blocklist itself. With broadcast_list=False
    # this verdict join degrades to a corpus shuffle on host — the
    # honest cost of an un-broadcastable blocklist; at that point prefer
    # slicing the blocklist and unioning broadcast-path verdicts.
    if broadcast_list:
        hit_hosts = F.broadcast(hit_hosts)
    out = (
        df.withColumn("_host", url_host(F.col(url_col)))
        .join(hit_hosts, "_host", "left")
        .withColumn("blocked", F.coalesce("_blocked_hit", F.lit(False)))
        .drop("_host", "_blocked_hit")
    )
    return out
