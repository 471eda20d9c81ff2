"""robots.txt compliance operator (RFC 9309 semantics: groups,
longest-match, Allow-on-tie, wildcards, end anchor)."""

from pyspark.sql import functions as F

from py_sema_spark.operators.robots import parse_robots, robots_filter

ROBOTS = """\
# crawl policy
User-agent: evilbot
Disallow: /

User-agent: helper
User-agent: *
Allow: /p/1*
Disallow: /p/1
Disallow: /p/2$
Disallow: /q
Disallow:
"""


def rules_df(spark, agent="*"):
    robots = spark.createDataFrame(
        [("ex.org", ROBOTS)], "domain string, robots_txt string"
    )
    return parse_robots(robots, agent=agent)


class TestParse:
    def test_group_and_rule_extraction(self, spark):
        rows = {
            (r["pattern"], r["allow"]) for r in rules_df(spark).collect()
        }
        # evilbot group excluded; empty Disallow dropped; comments ok
        assert rows == {
            ("/p/1*", True),
            ("/p/1", False),
            ("/p/2$", False),
            ("/q", False),
        }

    def test_named_agent_gets_only_its_group(self, spark):
        rows = {r["pattern"] for r in rules_df(spark, "EvilBot").collect()}
        # named agent matches case-insensitively; per RFC 9309 §2.2.1
        # the '*' group is a fallback, NOT merged with the specific one
        assert rows == {"/"}

    def test_star_group_is_fallback_for_unnamed_agent(self, spark):
        rows = {r["pattern"] for r in rules_df(spark, "otherbot").collect()}
        assert rows == {"/p/1*", "/p/1", "/p/2$", "/q"}

    def test_consecutive_ua_lines_share_a_group(self, spark):
        rows = {r["pattern"] for r in rules_df(spark, "helper").collect()}
        assert "/p/1" in rows and "/" not in rows

    def test_specificity_is_pattern_length(self, spark):
        spec = {
            r["pattern"]: r["spec"] for r in rules_df(spark).collect()
        }
        assert spec["/p/1*"] == 5 and spec["/p/1"] == 4


class TestFilter:
    def pages(self, spark, paths):
        return spark.createDataFrame(
            [(i, f"http://ex.org{p}") for i, p in enumerate(paths)],
            "doc_id long, url string",
        )

    def allowed_map(self, spark, paths):
        out = robots_filter(self.pages(spark, paths), rules_df(spark))
        return {
            r["url"].replace("http://ex.org", ""): r["allowed"]
            for r in out.collect()
        }

    def test_longest_match_and_anchor(self, spark):
        got = self.allowed_map(
            spark,
            ["/p/1", "/p/15", "/p/2", "/p/25", "/q", "/qx", "/r", "/"],
        )
        assert got == {
            "/p/1": True,   # Allow /p/1* (5) beats Disallow /p/1 (4)
            "/p/15": True,  # same
            "/p/2": False,  # /p/2$ anchored match
            "/p/25": True,  # anchor does NOT match → no rule → allowed
            "/q": False,    # prefix
            "/qx": False,   # prefix matches continuations
            "/r": True,     # no rule
            "/": True,
        }

    def test_unknown_domain_allowed(self, spark):
        pages = spark.createDataFrame(
            [(1, "http://other.org/q")], "doc_id long, url string"
        )
        (row,) = robots_filter(pages, rules_df(spark)).collect()
        assert row["allowed"] is True

    def test_query_string_included_in_path(self, spark):
        got = self.allowed_map(spark, ["/q?x=1", "/p/2?x=1"])
        # /q prefix matches the query form; the $-anchored rule doesn't
        assert got == {"/q?x=1": False, "/p/2?x=1": True}
