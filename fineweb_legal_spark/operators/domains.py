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
