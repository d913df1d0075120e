"""LSH-bucketed embedding near-dup: the 10^12-row path must agree with the
exact crossJoin baseline on identical-vector clones (which always share a
bucket), and its plan must contain no cartesian product."""

import pytest

from warc2text_spark.operators.dedup import (
    embedding_near_duplicates,
    embedding_near_duplicates_lsh,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from pyspark.sql import functions as F
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet") \
        .select("vec_id", "embedding")
    extra = e.filter(F.col("vec_id") % 50 == 0) \
             .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    return e.unionByName(extra)


def _planes(spark):
    from pyspark.sql import functions as F
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return [[float(x) for x in r.embedding] for r in
            e.filter(F.col("vec_id").between(1, 8)).orderBy("vec_id").collect()]


def test_lsh_neardup_matches_exact_on_clones(spark, emb):
    exact = {(r.a_id, r.b_id) for r in embedding_near_duplicates(emb).collect()}
    lsh = {(r.a_id, r.b_id)
           for r in embedding_near_duplicates_lsh(emb, _planes(spark)).collect()}
    # identical vectors hash to identical buckets: full recall on clones
    assert lsh == exact and exact  # (this corpus has no borderline pairs)


def test_lsh_neardup_plan_has_no_cartesian_product(spark, emb):
    df = embedding_near_duplicates_lsh(emb, _planes(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
