"""Physical-plan regression guards: the scale-killing shapes the round-1
verdict flagged must never reappear.  Each assertion pins the *plan*, not
the result — results are covered by the oracle suite; these tests fail if
someone reintroduces a cartesian/nested-loop join or an unbounded window.
"""

import pytest

from crumble_spark.pipeline import dedup, relational, simsearch

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_simhash_pairs_is_banded_equi_join_not_cartesian(spark):
    plan = _plan(dedup.q_dedup_simhash(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_verified_has_no_nested_loop_join(spark):
    plan = _plan(dedup.q_dedup_lsh_verified(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jaccard_has_no_nested_loop_join(spark):
    plan = _plan(dedup.q_dedup_jaccard(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_top_users_uses_take_ordered_not_global_window(spark):
    plan = _plan(relational.q_events_top_users(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_ann_scaled_is_equi_join(spark):
    # the 1-row nb scalar broadcast legitimately compiles to a nested-loop
    # join (it has no key); the *candidate* join must be a hash equi-join
    # on the bucket value — that's the part that touches the corpus
    plan = _plan(simsearch.q_ann_scaled_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    hash_join_lines = [
        ln for ln in plan.splitlines()
        if ("BroadcastHashJoin" in ln or "SortMergeJoin" in ln or "ShuffledHashJoin" in ln)
    ]
    assert any("bucket" in ln for ln in hash_join_lines), plan[:2000]


def test_late_orders_is_left_semi(spark):
    plan = _plan(relational.q_late_orders(spark, SF_DIR))
    assert "LeftSemi" in plan and "CartesianProduct" not in plan


def test_vocab_topk_uses_take_ordered(spark):
    from crumble_spark.pipeline import textqc

    assert "TakeOrderedAndProject" in _plan(textqc.q_vocab_topk(spark, SF_DIR))


def test_sessions_single_user_shuffle(spark):
    import re

    plan = _plan(relational.q_event_sessions(spark, SF_DIR))
    # lag window + per-session groupBy + per-user groupBy must all reuse
    # ONE hashpartitioning(user_id) exchange
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_simhash48_is_banded_equi_join(spark):
    plan = _plan(dedup.q_simhash48_pairs(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_simhash48_banding_is_complete_vs_brute_force(spark):
    # the 48-bit oracle SQL uses the SAME banding, so completeness isn't
    # independently checked there; compare against an explicit brute-force
    # hamming filter over all signature pairs at small scale
    from itertools import combinations

    from crumble_spark.pipeline.dedup import (
        SIMHASH64_HAM_MAX,
        q_simhash48_pairs,
    )

    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.q_simhash48_pairs(spark, SF_DIR).collect()
    }
    # recompute signatures exactly as the query does, then brute-force
    import pyspark.sql.functions as F

    from crumble_spark.pipeline import shared

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = d.select("doc_id", F.explode(shared.words(F.col("text"))).alias("w"))
    h48 = (F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")).alias("h")
    from crumble_spark.pipeline.dedup import _simhash48_cols

    sums, val = _simhash48_cols()
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in w.select("doc_id", h48)
        .groupBy("doc_id")
        .agg(*sums)
        .select("doc_id", val.alias("simhash"))
        .collect()
    }
    brute = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= SIMHASH64_HAM_MAX
    }
    assert banded == brute


def test_encode_scan_prunes_and_pushes(spark):
    # the flagship encode path must push the column prune to parquet:
    # reading documents for tokenization needs only doc_id/text/source
    from crumble_spark.pipeline import tokenize

    plan = _plan(tokenize.tokens_table(spark, SF_DIR))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "ts" not in read_schema
