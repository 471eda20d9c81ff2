"""robots.txt compliance filtering (RFC 9309 / REP) as column algebra.

A crawl-derived training corpus needs a robots pass: pages whose path
a site's robots.txt disallows for the harvesting agent must be
droppable *at corpus scale*, i.e. parsing and matching both run as
DataFrame plans — no per-row Python. The reference engine has no
robots operator (its discovery module fetches single URLs
interactively); this belongs to the large-scale-pipeline surface the
PySpark engine adds.

Semantics implemented (RFC 9309, matching Google's reference parser):

- group structure: one or more ``User-agent:`` lines start a group;
  a group applies to an agent if any of its ``User-agent`` lines
  names the agent (case-insensitive); groups whose only match is
  ``*`` apply ONLY when no group anywhere in the file specifically
  names the agent (RFC 9309 §2.2.1 — the ``*`` group is a fallback,
  not a merge);
- comments (``#…``) and blank lines are ignored; an EMPTY
  ``Disallow:`` value means "no restriction" and contributes no rule;
- path patterns: prefix match, ``*`` matches any octet sequence,
  a trailing ``$`` anchors the end;
- rule selection per URL: the most specific match wins — longest
  pattern (octet length, as Google counts it: the raw pattern string)
  — and on a length tie ``Allow`` wins;
- no matching rule (or no robots entry for the domain) → allowed.

Scale shape: parsing is posexplode(lines) → two windows per domain
(group id via a lag-based running sum, ordered by line index —
robots files are small, so per-domain windows are tiny); matching is
one equi-join on ``domain`` followed by a per-page WindowGroupLimit
pick of the winning rule. The only exchanges are the domain join and
the per-page window; both are keyed on high-cardinality columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame, agent: str = "*") -> DataFrame:
    """``(domain, robots_txt)`` → ``(domain, pattern, allow, rx,
    spec)`` rules applicable to ``agent``.

    ``rx`` is the compiled match regex, ``spec`` the RFC specificity
    (pattern octet length) used for longest-match selection.
    """
    lines = robots.select(
        "domain",
        F.posexplode(F.split(F.col("robots_txt"), "\n")).alias(
            "i", "raw"
        ),
    )
    line = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    lines = lines.select("domain", "i", line.alias("line")).where(
        F.col("line") != ""
    )
    kv = lines.select(
        "domain",
        "i",
        F.lower(
            F.trim(F.split_part(F.col("line"), F.lit(":"), F.lit(1)))
        ).alias("key"),
        F.trim(
            F.expr("substring(line, instr(line, ':') + 1)")
        ).alias("value"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow"))

    # group id: a user-agent line starts a new group iff the previous
    # retained line was not itself a user-agent line (RFC 9309 §2.1:
    # consecutive user-agent lines share one group)
    w = Window.partitionBy("domain").orderBy("i")
    starts = F.when(
        (F.col("key") == "user-agent")
        & (
            F.lag("key").over(w).isNull()
            | (F.lag("key").over(w) != "user-agent")
        ),
        1,
    ).otherwise(0)
    kv = kv.withColumn("gid", F.sum(starts).over(w))

    # RFC 9309 §2.2.1: groups that specifically name the agent win;
    # '*' groups are a per-domain fallback used only when no specific
    # group exists anywhere in that robots file (never merged in)
    groups = (
        kv.where(F.col("key") == "user-agent")
        .groupBy("domain", "gid")
        .agg(
            F.max(F.lower(F.col("value")) == agent.lower()).alias("named"),
            F.max(F.col("value") == "*").alias("star"),
        )
    )
    has_named = F.max("named").over(Window.partitionBy("domain"))
    applies = (
        groups.withColumn("has_named", has_named)
        .where(F.col("named") | (F.col("star") & ~F.col("has_named")))
        .select("domain", "gid")
    )
    rules = (
        kv.where(F.col("key") != "user-agent")
        .join(applies, ["domain", "gid"], "left_semi")
        .where(F.col("value") != "")  # empty Disallow: no restriction
        .select(
            "domain",
            F.col("value").alias("pattern"),
            (F.col("key") == "allow").alias("allow"),
        )
    )
    # pattern → anchored Java regex: escape metacharacters, ``*`` →
    # ``.*``; the trailing ``$`` was escaped to ``\$`` by the first
    # replace, so only the very-end occurrence converts back into a
    # real anchor (an inner ``$`` stays literal, per the REP)
    esc = F.regexp_replace(
        F.col("pattern"), r"([.^$+?(){}\[\]\\|])", r"\\$1"
    )
    esc = F.regexp_replace(esc, r"\*", ".*")
    rx = F.when(
        esc.endswith("\\$"),
        F.concat(
            F.lit("^"),
            esc.substr(F.lit(1), F.length(esc) - F.lit(2)),
            F.lit("$"),
        ),
    ).otherwise(F.concat(F.lit("^"), esc))
    return rules.select(
        "domain",
        "pattern",
        "allow",
        rx.alias("rx"),
        F.length("pattern").alias("spec"),
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Pages + parsed rules → pages with an ``allowed`` flag.

    The winning rule per page is the longest-pattern match (Allow wins
    length ties); pages with no matching rule — including domains with
    no robots entry at all — are allowed.
    """
    p = pages.withColumn(
        "_domain",
        F.lower(F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/:?#]+)", 1)),
    ).withColumn(
        "_path",
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    F.col(url_col), r"^[a-z]+://[^/]+(/[^#]*)", 1
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ),
    )
    cand = p.join(
        rules.withColumnRenamed("domain", "_domain"), "_domain", "inner"
    ).where(F.expr("_path rlike rx"))
    w = Window.partitionBy(*[F.col(c) for c in pages.columns]).orderBy(
        F.col("spec").desc(), F.col("allow").desc()
    )
    winners = (
        cand.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") == 1)
        .select(*pages.columns, F.col("allow").alias("_win_allow"))
    )
    return (
        p.join(winners, list(pages.columns), "left")
        .select(
            *pages.columns,
            F.coalesce(F.col("_win_allow"), F.lit(True)).alias("allowed"),
        )
    )
