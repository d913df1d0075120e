"""robots.txt parsing + RFC 9309 rule application (operators/robots.py)."""

from warc2text_spark.operators.robots import (_rule_regex, apply_robots,
                                              parse_robots_txt, robots_rules)

ROBOTS_A = """\
# comment line
User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /*.pdf$

User-agent: megabot
User-agent: gigabot
Disallow: /

User-agent: nicebot
Disallow:
"""


def test_parse_groups_and_rules():
    rules = parse_robots_txt(ROBOTS_A)
    assert ("*", "disallow", "/private/") in rules
    assert ("*", "allow", "/private/pub/") in rules
    assert ("*", "disallow", "/*.pdf$") in rules
    # consecutive UA lines share the group
    assert ("megabot", "disallow", "/") in rules
    assert ("gigabot", "disallow", "/") in rules
    # empty Disallow matches nothing -> only the group marker remains
    assert [r for r in rules if r[0] == "nicebot"] \
        == [("nicebot", "group", "")]
    # malformed input never raises
    assert parse_robots_txt("") == []
    assert parse_robots_txt("Disallow: /x\n") == []       # rule before UA
    assert parse_robots_txt("junk\n:::\nUser-agent\n") == []


def test_rule_regex_wildcards():
    import re
    pat = _rule_regex("/*.pdf$")
    assert re.search(pat, "/docs/file.pdf")
    assert not re.search(pat, "/docs/file.pdf?x=1")
    pat2 = _rule_regex("/a/*/b")
    assert re.search(pat2, "/a/x/b/c")
    assert not re.search(pat2, "/c/a/x/b")                # anchored start


def test_apply_robots_precedence(spark):
    robots = spark.createDataFrame(
        [("https://s1.example/robots.txt", ROBOTS_A),
         ("https://s2.example/robots.txt",
          "User-agent: *\nDisallow: /\nUser-agent: megabot\nAllow: /")],
        "url string, text string")
    rules = robots_rules(robots)
    docs = spark.createDataFrame(
        [("1", "https://s1.example/private/x.html"),
         ("2", "https://s1.example/private/pub/x.html"),   # allow wins (longer)
         ("3", "https://s1.example/open/x.html"),
         ("4", "https://s1.example/docs/file.pdf"),        # $ anchor
         ("5", "https://s3.example/anything"),             # no robots.txt
         ("6", "https://s2.example/page.html"),            # * disallow all
         ("7", "https://s1.example/")],
        "doc_id string, url string")
    got = {r.doc_id: r.allowed for r in apply_robots(docs, rules).collect()}
    assert got == {"1": False, "2": True, "3": True, "4": False,
                   "5": True, "6": False, "7": True}
    # exact-agent group REPLACES the * group for that host
    got_mega = {r.doc_id: r.allowed
                for r in apply_robots(docs, rules, agent="megabot").collect()}
    assert got_mega["6"] is True          # s2 megabot group allows all
    assert got_mega["1"] is False         # s1 megabot group disallows /
    assert got_mega["3"] is False


def test_apply_robots_rules_table_shape(spark):
    robots = spark.createDataFrame(
        [("https://h.example/robots.txt", ROBOTS_A)],
        "url string, text string")
    rules = robots_rules(robots).collect()
    assert all(r.host == "h.example" for r in rules)
    assert {(r.agent, r.rule, r.path) for r in rules} >= {
        ("*", "disallow", "/private/"), ("megabot", "disallow", "/")}
    assert all(r.pattern.startswith("^") for r in rules
               if r.rule != "group")
    assert all(r.pattern == "" for r in rules if r.rule == "group")


def test_apply_robots_plan_broadcasts_rules(spark):
    """Scale shape: the per-host rule table broadcasts; document
    payloads never shuffle (only id/host/path reach the join)."""
    robots = spark.createDataFrame(
        [("https://h.example/robots.txt", "User-agent: *\nDisallow: /n/")],
        "url string, text string")
    docs = spark.createDataFrame([("1", "https://h.example/n/x")],
                                 "doc_id string, url string")
    plan = apply_robots(docs, robots_rules(robots))._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_ruleless_exact_group_shadows_star(spark):
    """Review r6: a rule-less exact-agent group must still replace the
    * group (empty Disallow = allow everything for that agent)."""
    txt = ("User-agent: nicebot\nDisallow:\n\n"
           "User-agent: *\nDisallow: /\n")
    rules = parse_robots_txt(txt)
    assert ("nicebot", "group", "") in rules          # existence preserved
    assert not [r for r in rules if r[0] == "nicebot"
                and r[1] in ("allow", "disallow")]
    robots = spark.createDataFrame(
        [("https://h.example/robots.txt", txt)], "url string, text string")
    docs = spark.createDataFrame([("1", "https://h.example/x")],
                                 "doc_id string, url string")
    r = robots_rules(robots)
    assert {x.doc_id: x.allowed
            for x in apply_robots(docs, r, agent="nicebot").collect()} \
        == {"1": True}
    assert {x.doc_id: x.allowed
            for x in apply_robots(docs, r).collect()} == {"1": False}


def test_bom_and_host_case(spark):
    """Review r6: UTF-8 BOM before the first group, and case-varying
    hosts/schemes, must not bypass the rules."""
    txt = "﻿User-agent: *\nDisallow: /private/\n"
    assert ("*", "disallow", "/private/") in parse_robots_txt(txt)
    robots = spark.createDataFrame(
        [("https://Example.com/robots.txt", txt)], "url string, text string")
    docs = spark.createDataFrame(
        [("1", "HTTPS://EXAMPLE.com/private/x"),
         ("2", "https://example.com/open/x")],
        "doc_id string, url string")
    got = {r.doc_id: r.allowed
           for r in apply_robots(docs, robots_rules(robots)).collect()}
    assert got == {"1": False, "2": True}
