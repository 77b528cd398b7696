"""conversations.conv_curation: the composed curation pass must (a)
agree with the separate conv_dedup / conv_neardup operators row-for-row
and (b) actually SHARE the conversation assembly exchange — one
|turns|-sized shuffle serving both tiers (VERDICT r4 #7), pinned
against the executed plan, not trusted as prose.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log_formatter_spark.operators import conversations as C
from log_formatter_spark.transcripts import transcripts_from_events


def test_matches_separate_operators(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir)
    cur = {r["conv_id"]: r for r in C.conv_curation(t, min_est=0.3).collect()}
    assert cur

    # exact tier == conv_dedup (full-conversation key, no prefix)
    by_key: dict[str, list] = {}
    for r in cur.values():
        by_key.setdefault(r["conv_key"], []).append(r)
    dd = {r["conv_key"]: r for r in C.conv_dedup(t).collect()}
    assert set(by_key) == set(dd)
    for key, rows in by_key.items():
        assert dd[key]["n_convs"] == len(rows) == rows[0]["exact_group_size"]
        assert dd[key]["survivor_conv_id"] == rows[0]["exact_survivor"]
        for r in rows:
            assert r["is_exact_dup"] == (r["conv_id"] != dd[key]["survivor_conv_id"])

    # near tier == conv_neardup aggregated per conversation
    nd: dict[str, list] = {}
    for r in C.conv_neardup(t, min_est=0.3).collect():
        nd.setdefault(r["conv_a"], []).append(r["est_jaccard"])
        nd.setdefault(r["conv_b"], []).append(r["est_jaccard"])
    for cid, r in cur.items():
        ests = nd.get(cid, [])
        assert r["neardup_partners"] == len(ests)
        assert r["max_est_jaccard"] == (max(ests) if ests else -1.0)


def test_assembly_exchange_is_shared(spark, sf_dir):
    # static planner (AQE off) prints literal ReusedExchange nodes and
    # never collapses reused subtrees into opaque stage references, so
    # the one-assembly-exchange claim is countable; AQE applies the same
    # reuse rule per-stage at runtime
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            C.conv_curation(transcripts_from_events(spark, sf_dir), min_est=0.3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # the conv_id assembly aggregate ends in a shuffle consumed by all
    # three tiers (conv_key window + both band-join sides): exactly ONE
    # live partial-collect assembly, the rest read its shuffle files,
    # and the |turns|-sized source is scanned once
    assert plan.count("partial_collect_list") == 1, plan
    assert plan.count("ReusedExchange") >= 2, plan
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")


def test_empty_input(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir).limit(0)
    assert C.conv_curation(t).count() == 0
