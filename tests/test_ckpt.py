"""Checkpoint-strategy switch (VERDICT r4 #8): iterative operators route
lineage truncation through operators/ckpt.materialize, which picks
executor-local localCheckpoint (default) or a reliable checkpoint dir
(lossy-cluster mode) from the session conf."""

import tempfile

import pytest
from pyspark.sql import functions as F

from gqlite_spark.operators.ckpt import RELIABLE_KEY, materialize


@pytest.fixture
def reliable(spark):
    d = tempfile.mkdtemp(prefix="gqlite-ckpt-")
    spark.sparkContext.setCheckpointDir(d)
    spark.conf.set(RELIABLE_KEY, "true")
    yield d
    spark.conf.set(RELIABLE_KEY, "false")


def test_default_is_local_checkpoint(spark):
    df = materialize(spark.range(10))
    assert df.count() == 10
    # a checkpointed DataFrame's plan is a materialized RDD scan, not the
    # original Range node
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan


def test_reliable_requires_checkpoint_dir(spark):
    spark.conf.set(RELIABLE_KEY, "true")
    try:
        if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
            with pytest.raises(RuntimeError, match="checkpoint dir"):
                materialize(spark.range(3))
    finally:
        spark.conf.set(RELIABLE_KEY, "false")


def test_reliable_mode_writes_checkpoint(spark, reliable):
    import glob
    import os
    df = materialize(spark.range(10).withColumn("x", F.col("id") * 2))
    assert df.count() == 10
    # reliable checkpoints land as rdd-* partition files under the dir
    files = glob.glob(os.path.join(reliable, "**", "rdd-*", "part-*"),
                      recursive=True)
    assert files, f"no checkpoint partitions under {reliable}"


def test_graph_algo_under_reliable_mode(spark, reliable):
    """pagerank's superstep loop runs unchanged under the reliable
    strategy and produces the same ranks as the default path."""
    from gqlite_spark.operators.graph_algos import pagerank
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long")
    rel = {r["id"]: round(r["rank"], 6)
           for r in pagerank(edges, iterations=3).collect()}
    spark.conf.set(RELIABLE_KEY, "false")
    loc = {r["id"]: round(r["rank"], 6)
           for r in pagerank(edges, iterations=3).collect()}
    assert rel == loc


def test_funnel_under_reliable_mode(spark, reliable):
    from gqlite_spark.operators.temporal import funnel
    rows = [(1, 10, "view"), (1, 20, "click"), (2, 10, "view")]
    df = spark.createDataFrame(
        [(u, t * 1_000_000_000, ty) for u, t, ty in rows],
        "user_id long, e long, t string")
    out = {r["step"]: r["n_users"]
           for r in funnel(df, ["view", "click"],
                           type_col="t", ts_col="e").collect()}
    assert out == {"view": 2, "click": 1}


def test_materialize_probed_truncates_and_probes(spark):
    """The fused checkpoint+probe (one job: the aggregate action
    materializes the lazy local checkpoint) must still truncate lineage
    AND return the same probe value as a separate aggregate."""
    from gqlite_spark.operators.ckpt import materialize_probed
    base = spark.range(100).withColumn("component", F.col("id") % 7)
    agg = F.sum(F.xxhash64("id", "component").cast("decimal(38,0)"))
    out, probe = materialize_probed(base, agg)
    expected = base.agg(agg).collect()[0][0]
    assert probe[0] == expected
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan          # lineage truncated
    assert out.count() == 100           # fully materialized, all rows


def test_materialize_probed_reliable_stays_eager(spark, reliable):
    """Reliable mode must checkpoint eagerly (a lazy reliable checkpoint
    recomputes the lineage when the files are written) and still return
    the correct probe."""
    import glob
    import os
    from gqlite_spark.operators.ckpt import materialize_probed
    base = spark.range(50).withColumn("x", F.col("id") * 3)
    agg = F.sum(F.xxhash64("id", "x").cast("decimal(38,0)"))
    out, probe = materialize_probed(base, agg)
    assert probe[0] == base.agg(agg).collect()[0][0]
    files = glob.glob(os.path.join(reliable, "**", "rdd-*", "part-*"),
                      recursive=True)
    assert files, f"no checkpoint partitions under {reliable}"
    assert out.count() == 50


def test_lazy_parent_materializes_with_probe_job(spark):
    """The r15 within-batch convergence shape: a LAZY local checkpoint of
    a parent state is fully materialized by a child aggregate job (every
    partition feeds the aggregate), so a follow-up digest of the parent
    reads stored blocks and agrees with a from-scratch computation."""
    from gqlite_spark.operators.ckpt import materialize, materialize_probed
    agg = F.sum(F.xxhash64("id", "v").cast("decimal(38,0)"))
    base = spark.range(200).withColumn("v", F.col("id") % 13)
    penult = materialize(base, eager=False, coalesce=True)
    child = penult.withColumn("v", F.col("v") + 1).groupBy("id") \
                  .agg(F.min("v").alias("v"))
    child, probe = materialize_probed(child, agg)
    # parent digest from the (now materialized) lazy checkpoint
    got = penult.agg(agg).collect()[0][0]
    want = base.agg(agg).collect()[0][0]
    assert got == want
    # lineage of the parent is truncated after the covering job
    plan = penult._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan
    assert penult.count() == 200


def test_min_propagate_within_batch_detection(spark):
    """SCC/CC fixpoints detect convergence at +1-superstep granularity:
    a depth-4 directed 5-cycle converges to the same labels as the
    reference computation, and the loop's result is the unique min-label
    fixpoint regardless of batching."""
    from gqlite_spark.operators.graph_algos import (
        strongly_connected_components, connected_components)
    ring = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long")
    scc = {r["id"]: r["component"]
           for r in strongly_connected_components(ring).collect()}
    assert scc == {i: 0 for i in range(5)}
    cc = {r["id"]: r["component"]
          for r in connected_components(ring).collect()}
    assert cc == {i: 0 for i in range(5)}


def test_iterative_scope_aqe_gate_restores_conf(spark):
    """The size-aware AQE gate disables AQE only inside the scope and
    only for single-advisory-partition state; the session conf is
    restored on exit either way."""
    from gqlite_spark.operators.graph_algos import _iterative_shuffle_scope
    tiny = spark.createDataFrame([(1, 2)], "src long, dst long")
    before = spark.conf.get("spark.sql.adaptive.enabled")
    with _iterative_shuffle_scope(tiny, approx_rows=1):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == before
    # a huge claimed state keeps AQE on
    with _iterative_shuffle_scope(tiny, approx_rows=10**12):
        assert spark.conf.get("spark.sql.adaptive.enabled") == before
    assert spark.conf.get("spark.sql.adaptive.enabled") == before


def test_parse_bytes_conf_forms():
    from gqlite_spark.operators.graph_algos import _parse_bytes_conf
    assert _parse_bytes_conf("67108864", 0) == 64 * 1024 * 1024
    assert _parse_bytes_conf("64m", 0) == 64 * 1024 * 1024
    assert _parse_bytes_conf("64MB", 0) == 64 * 1024 * 1024
    assert _parse_bytes_conf("1g", 0) == 1024 ** 3
    assert _parse_bytes_conf("bogus", 7) == 7
