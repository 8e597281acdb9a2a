"""URL/domain operators for web corpora — pure Catalyst, cross-engine regex.

Web-crawl pipelines key politeness, per-site dedup, quality priors, and
blocklists by domain; crawls are domain-skewed (north rule: hot-domain
salting — see functions/skew.py for the partitioning side). These are the
query-side operators: host extraction, registrable-domain rollup, per-domain
corpus stats with corpus share, and allow/blocklist filtering.

`host_col` deliberately uses a plain regex instead of Spark's `parse_url`:
the contract must hold bit-for-bit in the DuckDB oracle (and any other
engine a lineage consumer uses), and `parse_url`'s Java URI semantics are
not portable. The regex handles scheme (any RFC 3986 scheme token),
userinfo, port, path/query/fragment; no-scheme strings yield '' (they are
not URLs — callers decide whether to drop or default them).

Registrable domains come in two contracts. `registrable_domain_col` uses a
small fixed two-level suffix list shared verbatim with the SQL oracle (the
standard last-2-or-3-labels approximation, cross-engine replicable).
`psl_registrable_domain_col` + `load_public_suffix_list` implement the FULL
publicsuffix.org algorithm (exception > longest exact/wildcard > implicit
'*') over a caller-supplied snapshot of the real ~9k-rule `.dat` file —
production-true eTLD+1, still a pure Column expression (InSet membership
probes, no joins/UDFs). domain_stats/filter_domains accept either via
`suffixes=`/`psl=`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme '://' [userinfo '@'] host [':' port] [/?#...]
HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)"

# shared verbatim with the SQL oracle (see __spark_entry__.py web_domain_stats)
TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.mx",
]


def host_col(url: Column) -> Column:
    """Lowercased host of a URL; '' when the string has no scheme+host."""
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


@dataclass
class PublicSuffixList:
    """Parsed publicsuffix.org rules, partitioned by rule label count.

    exact[k]     — k-label rules ("co.uk" -> exact[2])
    wildcard[k]  — k-label wildcard rules, stored WITHOUT the "*." prefix
                   ("*.ck" -> wildcard[2] holds "ck")
    exception[k] — k-label exception rules, stored without the "!"
                   ("!www.ck" -> exception[2] holds "www.ck")
    """

    exact: dict[int, set[str]] = field(default_factory=dict)
    wildcard: dict[int, set[str]] = field(default_factory=dict)
    exception: dict[int, set[str]] = field(default_factory=dict)

    @property
    def max_labels(self) -> int:
        return max(
            [*self.exact, *self.wildcard, *self.exception], default=1
        )


def load_public_suffix_list(source: str | Iterable[str]) -> PublicSuffixList:
    """Parse the public `.dat` format (https://publicsuffix.org/list/):
    one rule per line, '//' comments and blank lines ignored, '*.' wildcard
    rules, '!' exception rules; anything after whitespace on a rule line is
    ignored (the spec: the rule is 'up to the first whitespace'). `source`
    is a file path or an iterable of lines. Rules are lowercased; hosts are
    matched lowercased (IDNA/punycode normalization is the caller's
    contract — the list ships unicode rules, a punycoded crawl should load
    a punycoded list)."""
    if isinstance(source, str):
        with open(source, encoding="utf-8") as f:
            lines = f.readlines()
    else:
        lines = list(source)
    psl = PublicSuffixList()
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0].lower()
        if rule.startswith("!"):
            body = rule[1:]
            psl.exception.setdefault(body.count(".") + 1, set()).add(body)
        elif rule.startswith("*."):
            body = rule[2:]
            psl.wildcard.setdefault(body.count(".") + 2, set()).add(body)
        else:
            psl.exact.setdefault(rule.count(".") + 1, set()).add(rule)
    return psl


def psl_registrable_domain_col(host: Column, psl: PublicSuffixList) -> Column:
    """Registrable domain (eTLD+1) under the FULL public-suffix algorithm:
    prevailing rule = any matching exception rule, else the longest
    matching exact/wildcard rule, else the implicit '*' (1 label); public
    suffix = prevailing rule's labels (exception: minus its leftmost);
    registrable = public suffix + 1 label. A host that IS a public suffix
    (or '') passes through unchanged — same contract as
    `registrable_domain_col`.

    Plan shape: pure Column expression — per rule-length-k membership tests
    compile to InSet (hash-set probe, whole-stage codegen); no joins, no
    UDF, so it composes into the domain_stats/filter_domains scans with
    zero added exchanges even with the real ~9k-rule list."""
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def sfx(k: int) -> Column:
        # last k labels as a dotted string. The slice start is CLAMPED to 1
        # (Spark errors on start <= 0, and branch guards don't short-circuit
        # evaluation): when n < k this yields the whole host, which has
        # fewer dots than any k-label rule and so can never spuriously match
        return F.array_join(
            F.slice(labels, F.greatest(n - (k - 1), F.lit(1)), k), "."
        )

    def member(k: int, values: set[str]) -> Column:
        return (n >= k) & sfx(k).isin(*sorted(values))

    # candidate public-suffix lengths; -1 = no match at this rule
    cands = [F.lit(1)]  # the spec's implicit '*' default rule
    for k, vals in psl.exact.items():
        cands.append(F.when(member(k, vals), F.lit(k)).otherwise(F.lit(-1)))
    for k, vals in psl.wildcard.items():
        # '*.ck' (k=2): matches a k-label suffix whose last k-1 labels are
        # the stored body and whose '*' position holds a real label
        cands.append(
            F.when(member(k - 1, vals) & (n >= k), F.lit(k)).otherwise(
                F.lit(-1)
            )
        )
    ps_len = F.greatest(*cands) if len(cands) > 1 else cands[0]
    # exception rules prevail over everything; their public suffix is the
    # rule minus its leftmost label
    for k, vals in psl.exception.items():
        ps_len = F.when(member(k, vals), F.lit(k - 1)).otherwise(ps_len)

    # same clamp rationale as sfx(): the n > ps_len guard selects the
    # branch, but Spark still evaluates the slice on every row
    reg = F.array_join(
        F.slice(labels, F.greatest(n - ps_len, F.lit(1)), ps_len + 1), "."
    )
    return F.when((host != "") & (n > ps_len), reg).otherwise(host)


def registrable_domain_col(
    host: Column, suffixes: list[str] | None = None
) -> Column:
    """eTLD+1 approximation: last two labels, or last three when the last
    two form a listed two-level suffix; hosts with < 2 labels (or '')
    pass through unchanged."""
    sfx = TWO_LEVEL_SUFFIXES if suffixes is None else suffixes
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when((n >= 3) & last2.isin(*sfx), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def domain_stats(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    suffixes: list[str] | None = None,
    psl: PublicSuffixList | None = None,
) -> DataFrame:
    """Per-registrable-domain corpus stats:
    (domain, n_pages, n_hosts, n_chars, share_10k) where share_10k =
    floor(10000 * n_pages / total_pages).

    Shape at scale: one groupBy on domain with map-side partial aggregation
    (count/sum/approx-free distinct via a two-level agg on (domain, host)),
    plus a one-row broadcast for the corpus total. The output is
    domain-cardinality-sized — the natural input for hot-domain detection
    (share_10k filter) and blocklist joins."""
    host = host_col(F.col(url_col))
    dom = (psl_registrable_domain_col(host, psl) if psl is not None
           else registrable_domain_col(host, suffixes))
    per_host = (
        pages.select(
            dom.alias("domain"),
            host.alias("host"),
            F.length(F.col(text_col)).alias("n_chars"),
        )
        .groupBy("domain", "host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    per_dom = per_host.groupBy("domain").agg(
        F.sum("n_pages").alias("n_pages"),
        F.count(F.lit(1)).alias("n_hosts"),
        F.sum("n_chars").alias("n_chars"),
    )
    total = per_dom.agg(F.sum("n_pages").alias("total_pages"))
    return (
        per_dom.crossJoin(F.broadcast(total))
        .select(
            "domain",
            "n_pages",
            "n_hosts",
            "n_chars",
            F.floor(F.col("n_pages") * 10000.0 / F.col("total_pages"))
            .cast("long")
            .alias("share_10k"),
        )
    )


def filter_domains(
    pages: DataFrame,
    blocklist: DataFrame | list[str] | None = None,
    allowlist: DataFrame | list[str] | None = None,
    url_col: str = "url",
    suffixes: list[str] | None = None,
    psl: PublicSuffixList | None = None,
) -> DataFrame:
    """Drop pages whose registrable domain is blocklisted (anti-join) and,
    if an allowlist is given, keep only allowlisted domains (semi-join).
    List inputs become single-column DataFrames; both joins broadcast the
    list side — domain lists are dimension-table sized even when the pages
    side is the whole crawl."""
    spark = pages.sparkSession
    h = host_col(F.col(url_col))
    dom = (psl_registrable_domain_col(h, psl) if psl is not None
           else registrable_domain_col(h, suffixes))
    out = pages.withColumn("__domain", dom)

    def _as_df(lst):
        if isinstance(lst, DataFrame):
            return lst.toDF("__domain")
        return spark.createDataFrame(
            [(d,) for d in lst], "__domain string"
        )

    if blocklist is not None:
        out = out.join(
            F.broadcast(_as_df(blocklist)), "__domain", "left_anti"
        )
    if allowlist is not None:
        out = out.join(
            F.broadcast(_as_df(allowlist)), "__domain", "left_semi"
        )
    return out.drop("__domain")
