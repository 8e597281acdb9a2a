"""robots.txt parsing + longest-match URL filtering (functions/robots.py)."""

import pyspark.sql.functions as F

from itext2kg_spark.functions.robots import parse_robots, robots_filter

BODY_A = """# robots for a.example.com
User-agent: *
Disallow: /private/   # trailing comment
Allow: /private/ok

User-agent: mybot
User-agent: otherbot
Disallow: /d/
"""

BODY_B = """User-agent: *
Disallow: /blocked
"""


def _robots(spark):
    return spark.createDataFrame(
        [("a.example.com", BODY_A), ("b.example.com", BODY_B)],
        "host string, body string",
    )


def test_group_selection_and_shadowing(spark):
    # mybot has an exact group on host a -> '*' group is shadowed there
    rules = {
        (r["host"], r["directive"], r["prefix"])
        for r in parse_robots(_robots(spark), agent="mybot").collect()
    }
    assert rules == {
        ("a.example.com", "disallow", "/d/"),
        ("b.example.com", "disallow", "/blocked"),
    }
    # an agent with no exact group gets the '*' groups, comments stripped
    star = {
        (r["host"], r["directive"], r["prefix"])
        for r in parse_robots(_robots(spark), agent="somebot").collect()
    }
    assert star == {
        ("a.example.com", "disallow", "/private/"),
        ("a.example.com", "allow", "/private/ok"),
        ("b.example.com", "disallow", "/blocked"),
    }


def test_longest_match_and_allow_tie(spark):
    rules = parse_robots(_robots(spark), agent="somebot")
    urls = spark.createDataFrame(
        [
            ("http://a.example.com/private/x",),
            ("http://a.example.com/private/okpage",),
            ("http://a.example.com/pub/p",),
            ("http://b.example.com/blocked/deep",),
            ("http://b.example.com/",),
            ("http://norules.example.com/anything",),
        ],
        "url string",
    )
    got = {r["url"]: r for r in robots_filter(urls, rules).collect()}
    assert not got["http://a.example.com/private/x"]["allowed"]
    # Allow '/private/ok' (len 11) beats Disallow '/private/' (len 9)
    assert got["http://a.example.com/private/okpage"]["allowed"]
    assert got["http://a.example.com/private/okpage"]["matched_prefix"] == "/private/ok"
    assert got["http://a.example.com/pub/p"]["allowed"]
    assert not got["http://b.example.com/blocked/deep"]["allowed"]
    assert got["http://b.example.com/"]["allowed"]
    # no rules for the host at all -> allowed, no match columns
    nr = got["http://norules.example.com/anything"]
    assert nr["allowed"] and nr["matched_prefix"] is None


def test_host_match_is_case_insensitive(spark):
    rules = parse_robots(_robots(spark), agent="somebot")
    urls = spark.createDataFrame(
        [("http://B.EXAMPLE.com/blocked/x",)], "url string"
    )
    got = robots_filter(urls, rules).collect()[0]
    assert not got["allowed"] and got["matched_prefix"] == "/blocked"


def test_filter_plan_broadcasts_rules(spark):
    rules = parse_robots(_robots(spark), agent="somebot")
    urls = spark.createDataFrame([("http://a.example.com/p",)], "url string")
    df = robots_filter(urls, rules)
    df.collect()  # finalize the AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # host equality hash-keys the join; startswith rides as the residual —
    # the corpus side is never shuffled for the join
    assert "BroadcastHashJoin" in plan and "StartsWith" in plan
    assert "SortMergeJoin" not in plan
