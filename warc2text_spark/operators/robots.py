"""robots.txt parsing + rule application (RFC 9309).

Beyond-reference (graft mandate): warc2text side-routes robots.txt
records into a separate WARC (`src/warcpreprocessor.cc` robots route,
F3) and stops there; a crawl-curation pipeline's natural next step is to
PARSE those records and apply the exclusion rules to the fetched URLs —
e.g. to drop pages a polite crawler should not have kept, or to audit a
crawl against the current rules.  Grammar and precedence follow RFC
9309: ``user-agent`` lines open a group (consecutive UA lines share the
group), ``allow``/``disallow`` rules attach to the open group(s),
``#`` starts a comment, keys are case-insensitive, the ``*`` and ``$``
metacharacters in rule paths are supported, the longest-path match
decides, and ``allow`` wins length ties.  A product token picks its
group by exact (case-insensitive) token match, else the ``*`` group;
no matching rule means allowed.

Two documented deviations from the full RFC (ADVICE r6, accepted):
rule paths and URL paths are compared byte-literal — the §2.2.2
percent-encoding equivalence (``/a%20b`` vs ``/a b``) is not
canonicalized, so rules and URLs must agree on encoding; and the
matched URL path deliberately includes the query string
(``/s?q=x`` can be blocked by ``Disallow: /s?``), the Google-crawler
interpretation rather than path-only matching.

Scale shape: robots.txt documents are a tiny fraction of a crawl (one
per host), so the parsed rule table is broadcast; documents contribute
only (id, host, path) to the match join and never shuffle their
payloads.  Rule matching is JVM-side (`regexp_like` over the
pre-compiled per-rule regex column); the winner per document is one
map-side-combined ``max_by`` aggregate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

RULES_SCHEMA = "host string, agent string, rule string, path string, " \
               "pattern string"


def parse_robots_txt(text: str) -> list[tuple[str, str, str]]:
    """(agent, rule, path) triples from one robots.txt body — the RFC
    9309 group grammar (never raises; unparseable lines are skipped).
    An empty-path rule is dropped (an empty ``Disallow:`` means
    allow-everything and matches nothing), but the GROUP's existence is
    preserved as an ``(agent, 'group', '')`` marker — a rule-less
    exact-agent group must still shadow the ``*`` group (RFC 9309
    precedence; review r6 finding)."""
    out: list[tuple[str, str, str]] = []
    agents: list[str] = []
    rules_open = False       # rules seen since the last user-agent line
    try:
        # real-world robots.txt bodies frequently lead with a UTF-8 BOM
        # — without stripping it the first user-agent key fails to parse
        # and the whole first group vanishes (review r6 finding)
        for raw in text.lstrip("\ufeff").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if rules_open:
                    agents = []
                    rules_open = False
                if val:
                    agents.append(val.lower())
                    out.append((val.lower(), "group", ""))
            elif key in ("allow", "disallow"):
                rules_open = True
                if not agents or not val:
                    continue
                for a in agents:
                    out.append((a, key, val))
            else:
                # crawl-delay, sitemap, unknown keys: rules_open per RFC
                # (a group ends at the next user-agent line after rules)
                rules_open = rules_open or key in ("crawl-delay",)
    except Exception:
        pass
    return out


def _rule_regex(path: str) -> str:
    """Anchored regex for an RFC 9309 rule path: ``*`` matches any run,
    a trailing ``$`` anchors the end, everything else is literal."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    parts = [re.escape(p) for p in path.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def robots_rules(robots_df: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Parse a frame of robots.txt documents into the rule table
    (host, agent, rule, path, pattern).  Parsing is per-file Python
    (mapInPandas over the tiny robots side-route), the host comes from
    the fetch URL."""
    from collections.abc import Iterator

    import pandas as pd

    src = robots_df.select(
        F.lower(F.regexp_extract(
            F.col(url_col),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
        .alias("host"),
        F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("host", "agent", "rule", "path",
                                    "pattern")}
            for host, text in zip(pdf["host"], pdf["text"]):
                for agent, rule, path in parse_robots_txt(text or ""):
                    rows["host"].append(host)
                    rows["agent"].append(agent)
                    rows["rule"].append(rule)
                    rows["path"].append(path)
                    # group markers must never join URL matching — an
                    # empty path would compile to '^' (match-all)
                    rows["pattern"].append(
                        _rule_regex(path) if rule != "group" else "")
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, RULES_SCHEMA)


def apply_robots(docs: DataFrame, rules: DataFrame, agent: str = "*",
                 url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, url, allowed) for every document: RFC 9309 precedence under
    the given product token.  Hosts with a group exactly matching
    ``agent`` use ONLY that group; others fall back to their ``*``
    group; no matching rule (or no robots.txt) means allowed.

    The rule table is broadcast (one robots.txt per host — bounded by
    the host count, not the corpus); documents contribute (id, host,
    path) only and their payloads never shuffle."""
    agent = agent.lower()
    base = docs.select(
        F.col(id_col),
        F.col(url_col).alias("_url"),
        F.lower(F.regexp_extract(
            F.col(url_col),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)).alias("_host"),
        F.coalesce(
            F.nullif(F.regexp_extract(
                F.col(url_col),
                r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^#]*)",
                1), F.lit("")),
            F.lit("/")).alias("_path"))
    # per host: does a group for this exact agent exist?  Group markers
    # count here (a rule-less exact group still shadows '*'), but only
    # allow/disallow rows may join URL matching below.
    host_has = (rules.groupBy("host")
                .agg(F.max(F.when(F.col("agent") == agent, 1)
                           .otherwise(0)).alias("_exact")))
    scoped = (rules.join(host_has, "host")
              .filter((F.col("agent") == agent)
                      | ((F.col("_exact") == 0)
                         & (F.col("agent") == "*")))
              .filter(F.col("rule").isin("allow", "disallow"))
              .select(F.col("host").alias("_host"), "rule", "path",
                      "pattern"))
    hits = (base.join(F.broadcast(scoped), "_host", "left")
            .withColumn("_match",
                        F.col("pattern").isNotNull()
                        & F.regexp_like(F.col("_path"), F.col("pattern"))))
    # longest match wins, allow beats disallow on ties
    # min, not first: if a doc_id ever carried two distinct URLs the
    # reported url would be partition-order-nondeterministic (ADVICE r6);
    # identical output under the one-url-per-doc_id contract
    verdict = (hits.groupBy(id_col)
               .agg(F.min("_url").alias("url"),
                    F.max_by(
                        F.col("rule") == "allow",
                        F.when(F.col("_match"),
                               F.struct(F.length("path").alias("l"),
                                        (F.col("rule") == "allow")
                                        .alias("a"))))
                    .alias("_winner")))
    return verdict.select(id_col, "url",
                          F.coalesce("_winner", F.lit(True))
                          .alias("allowed"))
