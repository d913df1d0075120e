"""The cleaning-layer build sides (repeated paragraphs/lines/winnow
fingerprints, contaminated ids) GROW with corpus duplication — at crawl
scale a hardcoded broadcast hint OOMs executors.  These tests pin the
round-5 contract: the hint is gated (textops.hinted), the default lets
the optimizer choose from actual sizes, and forcing the scale path flips
the physical join to SortMergeJoin with IDENTICAL output."""

import contextlib

import pytest
from pyspark.sql import functions as F

from warc2text_spark.operators import textops
from warc2text_spark.operators.selection import decontaminate


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextlib.contextmanager
def _no_auto_broadcast(spark):
    """Simulate a build side past the broadcast gate: with the threshold
    disabled, ANY non-hinted join must plan shuffle-side (what a too-big
    build side gets at runtime under AQE)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def _para_docs(spark):
    return spark.createDataFrame(
        [(i, f"SHARED\n\nbody {i}\nFOOTER {i % 2}") for i in range(12)],
        "doc_id long, text string")


@pytest.mark.parametrize("op", [
    lambda d, hint: textops.paragraph_dedup(d, build_hint=hint),
    lambda d, hint: textops.remove_boilerplate(d, build_hint=hint),
    lambda d, hint: textops.substring_dedup(d, build_hint=hint),
])
def test_cleaning_ops_flip_to_smj_past_the_gate(spark, op):
    docs = _para_docs(spark)
    # past the gate (build side "too big to broadcast"): default auto
    # plans the scale-safe shuffle join — no forced broadcast survives
    with _no_auto_broadcast(spark):
        plan = _plan(op(docs, "auto"))
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "BroadcastHashJoin" not in plan, plan
        # explicit "merge" pins SMJ
        assert "SortMergeJoin" in _plan(op(docs, "merge"))
    # under the gate: forcing broadcast still works for known-small sets
    assert "BroadcastHashJoin" in _plan(op(docs, "broadcast"))


@pytest.mark.parametrize("hint", ["broadcast", "merge"])
def test_paragraph_dedup_output_identical_across_hints(spark, hint):
    docs = _para_docs(spark)
    base = sorted(map(tuple, textops.paragraph_dedup(docs).collect()))
    got = sorted(map(tuple,
                     textops.paragraph_dedup(docs, build_hint=hint)
                     .collect()))
    assert got == base


def test_paragraph_dedup_keeps_blank_lines_everywhere(spark):
    # blank separator lines are structure, not content: duplicated
    # corpus-wide yet exempt from the winners join (CCNet dedups
    # nonempty paragraphs) — every doc keeps its blank line and it never
    # counts toward n_removed
    docs = spark.createDataFrame([
        (1, "HDR\n\nbody one\n\nFOOTER"),
        (2, "HDR\n\nbody two\n\nFOOTER"),
        (3, "solo\n\ntail"),
    ], "doc_id long, text string")
    rows = {r.doc_id: r for r in textops.paragraph_dedup(docs).collect()}
    assert rows["1"].clean_text == "HDR\n\nbody one\n\nFOOTER"
    assert rows["1"].n_removed == 0
    assert rows["2"].clean_text == "\nbody two\n"  # HDR/FOOTER lost, blanks kept
    assert rows["2"].n_removed == 2
    assert rows["3"].clean_text == "solo\n\ntail"
    assert rows["3"].n_removed == 0


def test_decontaminate_bucketed_route_matches_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(10))) for i in range(20)]
        + [(100, " ".join(f"w3t{j}" for j in range(10)))],  # clone of 3
        "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 3)
    base = sorted(r.doc_id for r in decontaminate(docs, bench).collect())
    assert 3 not in base and 100 not in base and 4 in base
    with _no_auto_broadcast(spark):
        merge_df = decontaminate(docs, bench, build_hint="merge")
        plan = _plan(merge_df)
        assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
        assert sorted(r.doc_id for r in merge_df.collect()) == base


def test_curate_inherits_two_phase_host_cap(spark):
    from warc2text_spark.operators.curate import curate
    docs = spark.createDataFrame(
        [(i, f"https://h{i % 3}.example/p{i}",
          "the quick brown fox and the lazy dog sentence number "
          f"{i} of this corpus is long enough to pass the gopher gate")
         for i in range(30)],
        "doc_id long, url string, text string")
    salted = curate(docs, cap=2, min_words=5)
    single = curate(docs, cap=2, salted_hosts=False, min_words=5)
    # the default plan carries the two-phase (host,salt)->host window
    # shape: one extra Window exec node over the single-window variant
    # (plans read BEFORE any action — post-collect AQE prints the
    # initial plan a second time and doubles node counts)
    def n_windows(df):
        import re
        return len(re.findall(r"\bWindow \[", _plan(df)))
    assert n_windows(salted) == n_windows(single) + 1 == 3
    # and the output is exactly the same either way (top-N associative
    # under union)
    rows = sorted(map(tuple, salted.collect()))
    assert rows  # gopher gate must not empty the fixture
    assert rows == sorted(map(tuple, single.collect()))


def test_paragraph_dedup_exempts_tab_only_lines(spark):
    # code-review r5 regression: F.trim strips only spaces — tab/formfeed
    # separator lines must also be exempt from corpus-wide dedup
    docs = spark.createDataFrame([
        (1, "HDR\n\t\nbody one"),
        (2, "HDR\n\t\nbody two"),
    ], "doc_id long, text string")
    rows = {r.doc_id: r for r in textops.paragraph_dedup(docs).collect()}
    assert rows["2"].clean_text == "\t\nbody two"
    assert rows["2"].n_removed == 1  # only HDR


def test_curate_classifier_gate(spark):
    """clf_threshold composes the trained quality classifier into the
    sweep: junky pages fall out even when they pass the rule gate."""
    from warc2text_spark.operators.curate import curate
    prose = ("the committee met on tuesday and most of the members were "
             "of the opinion that the plan would not be possible without "
             "more money from the city and some help from other towns")
    # varied enough to pass the gopher repetition rules, junky enough
    # in register to fail the classifier
    junk = ("click here now for the best deal on cheap watches and free "
            "bonus offers win big money online casino poker with no "
            "deposit required today only limited offer act fast")
    docs = spark.createDataFrame(
        [(1, "https://a.example/p1", prose),
         (2, "https://a.example/p2", junk)],
        "doc_id long, url string, text string")
    base = {r.doc_id for r in curate(docs, cap=5, min_words=5).collect()}
    assert base == {"1", "2"}           # rule gate alone keeps both
    gated = {r.doc_id for r in
             curate(docs, cap=5, min_words=5,
                    clf_threshold=0.5).collect()}
    assert gated == {"1"}               # classifier drops the junk
