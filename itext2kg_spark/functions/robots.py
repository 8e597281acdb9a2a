"""robots.txt evaluation at corpus scale — which crawled URLs were
allowed, computed as a broadcast longest-match join.

A webtext pipeline audits its crawl against robots rules (and filters
re-crawl frontiers with them). The rule table is tiny (one row per
(host, directive, path-prefix)); the URL table is the corpus. So the
join must broadcast the rules and never shuffle the URLs — this module
does exactly that:

1. parse_robots: robots.txt bodies -> (host, agent, directive, prefix)
   rows, pure Catalyst (split lines / trim / comment strip / lower-case
   directives). Only the groups matching `agent` (plus '*') apply,
   mirroring RFC 9309 group selection at its common-case core.
2. robots_filter: urls x broadcast(rules) LEFT join on host +
   starts-with(path, prefix); per URL keep the LONGEST matching prefix,
   Allow beating Disallow on equal length (RFC 9309 / Google semantics);
   no matching rule or no rules for the host => allowed.

The host equality hash-keys the join, so Catalyst plans a
BroadcastHashJoin (build side = the broadcast rule table) with the
startswith as the join residual — each URL probes only its own host's
rules, and the corpus side never shuffles for the join. The
longest-match reduction is a groupBy(url) max over the joined
candidates — map-side combinable.

Simplifications (documented contract): no '*' wildcards or '$' anchors
inside rule paths (prefix semantics only — the dominant case in real
robots files), no Crawl-delay/Sitemap handling (parsed rows carry the
directive, downstream can filter), agent matching is exact-or-'*'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from itext2kg_spark.functions.url import HOST_RE

# path = everything after the origin (scheme://host[:port]); '' -> '/'
ORIGIN_STRIP_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?[^/?#]+"


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """(host, directive, prefix) — allow/disallow rules applying to
    `agent`: rules from its exact user-agent groups if any exist for a
    host, else that host's '*' groups (RFC 9309 group selection)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\r?\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace(F.col("line"), "#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    kv = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))).alias("key"),
        F.trim(
            F.expr("substring(line, instr(line, ':') + 1, length(line))")
        ).alias("value"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow"))
    # group id = running count of user-agent lines that START a group (a
    # user-agent line following a rule line, or the first line)
    w = F.expr(
        "sum(CASE WHEN key = 'user-agent' AND (lag_key IS NULL OR"
        " lag_key != 'user-agent') THEN 1 ELSE 0 END)"
        " OVER (PARTITION BY host ORDER BY line_no)"
    )
    from pyspark.sql import Window

    lag = Window.partitionBy("host").orderBy("line_no")
    g = kv.withColumn("lag_key", F.lag("key").over(lag)).withColumn("grp", w)
    agents = (
        g.where(F.col("key") == "user-agent")
        .groupBy("host", "grp")
        .agg(F.collect_set(F.lower(F.col("value"))).alias("agents"))
    )
    # every join below is robots-table-sized (rows ~ lines of robots.txt
    # across the crawl's hosts) — broadcast by construction
    rules = g.where(F.col("key") != "user-agent").join(
        F.broadcast(agents), ["host", "grp"]
    )
    mine = F.array_contains("agents", agent.lower())
    star = F.array_contains("agents", "*")
    cand = rules.where(mine | star).withColumn("exact", mine)
    # exact-agent groups shadow '*' groups per host
    has_exact = F.broadcast(cand.where("exact").select("host").distinct())
    chosen = cand.join(has_exact, "host", "left_semi").where("exact").unionByName(
        cand.join(has_exact, "host", "left_anti")
    )
    return chosen.where(F.col("value") != "").select(
        "host",
        F.col("key").alias("directive"),
        F.col("value").alias("prefix"),
    ).distinct()


def robots_filter(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """url, matched_prefix, matched_directive, allowed — RFC 9309
    longest-match evaluation of every URL against the (broadcast) rule
    table. URLs with no applicable rule are allowed."""
    u = urls.select(
        F.col(url_col).alias("url"),
        # hostnames are case-insensitive (RFC 4343); paths are not
        F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1)).alias("__host"),
        F.coalesce(
            F.nullif(F.regexp_replace(F.col(url_col), ORIGIN_STRIP_RE, ""), F.lit("")),
            F.lit("/"),
        ).alias("__path"),
    )
    r = rules.select(
        F.lower(F.col("host")).alias("__rhost"),
        F.col("directive"),
        F.col("prefix"),
        F.length("prefix").alias("__plen"),
    )
    j = u.join(
        F.broadcast(r),
        (F.col("__host") == F.col("__rhost"))
        & F.col("__path").startswith(F.col("prefix")),
        "left",
    )
    # longest prefix wins; Allow beats Disallow on equal length
    pick = F.max(
        F.struct(
            F.coalesce(F.col("__plen"), F.lit(-1)).alias("plen"),
            (F.col("directive") == "allow").cast("int").alias("is_allow"),
            F.col("prefix").alias("prefix"),
            F.col("directive").alias("directive"),
        )
    ).alias("m")
    agg = j.groupBy("url").agg(pick)
    return agg.select(
        "url",
        F.col("m.prefix").alias("matched_prefix"),
        F.col("m.directive").alias("matched_directive"),
        (F.coalesce(F.col("m.directive"), F.lit("allow")) == "allow").alias(
            "allowed"
        ),
    )
