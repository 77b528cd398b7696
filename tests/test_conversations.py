"""Unit tests for conversation-level dedup / QA and the corpus
decontamination + boilerplate operators (crafted inputs with known
answers; cross-engine parity is covered by tests/test_contract.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from log_formatter_spark.operators.conversations import conv_dedup, conv_qa
from log_formatter_spark.operators.corpus import boilerplate_fraction, decontaminate

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp_ntz"
    )


def test_conv_dedup_collapses_identical_conversations(spark):
    t = _turns(
        spark,
        [
            ("a", 0, "user", "hi", TS),
            ("a", 1, "assistant", "hello", TS),
            ("b", 0, "user", "hi", TS + dt.timedelta(hours=3)),  # retry of a
            ("b", 1, "assistant", "hello", TS + dt.timedelta(hours=3)),
            ("c", 0, "user", "different", TS),
        ],
    )
    out = {r["conv_key"]: r for r in conv_dedup(t).collect()}
    assert len(out) == 2
    dup = next(r for r in out.values() if r["n_convs"] == 2)
    assert dup["survivor_conv_id"] == "a"
    assert dup["total_turns"] == 4


def test_conv_dedup_prefix_groups_templates(spark):
    # same first turn, divergent second turn: full dedup keeps both,
    # prefix_turns=1 collapses them into one template group
    t = _turns(
        spark,
        [
            ("a", 0, "user", "hi", TS),
            ("a", 1, "assistant", "x", TS),
            ("b", 0, "user", "hi", TS),
            ("b", 1, "assistant", "y", TS),
        ],
    )
    assert conv_dedup(t).count() == 2
    pre = conv_dedup(t, prefix_turns=1).collect()
    assert len(pre) == 1 and pre[0]["n_convs"] == 2
    # prefix counts only key turns, n_turns of the prefix frame
    assert pre[0]["total_turns"] == 2


def test_conv_dedup_canon_expr(spark):
    # canonicalizer strips a volatile prefix -> rows collapse
    t = _turns(
        spark,
        [("a", 0, "user", "t1 payload", TS), ("b", 0, "user", "t2 payload", TS)],
    )
    assert conv_dedup(t).count() == 2
    out = conv_dedup(t, canon=F.expr("substr(text, 4)")).collect()
    assert len(out) == 1 and out[0]["n_convs"] == 2


def test_conv_qa_counts(spark):
    pat = r"(?P<word>\w+) ok"
    t = _turns(
        spark,
        [
            ("a", 0, "user", "fine ok", TS),
            ("a", 1, "user", "fine ok", TS + dt.timedelta(microseconds=1500)),
            ("a", 2, "assistant", "broken", TS + dt.timedelta(seconds=2)),
            ("b", 0, "tool", "fine ok", TS),
        ],
    )
    rows = {r["conv_id"]: r for r in conv_qa(t, pat).collect()}
    a = rows["a"]
    assert a["n_turns"] == 3
    assert a["n_malformed"] == 1
    assert a["n_role_repeats"] == 1  # user->user at turn 1
    assert a["n_roles"] == 2
    assert a["span_us"] == 2_000_000
    b = rows["b"]
    assert (b["n_malformed"], b["n_role_repeats"], b["span_us"]) == (0, 0, 0)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_eval_overlap(spark):
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon"),  # eval doc
            (1, "x alpha beta gamma delta y"),  # shares 1 eval 4-gram
            (2, "totally unrelated words here now"),
            (3, "alpha beta gamma delta epsilon"),  # exact copy of eval
        ],
    )
    out = {r["doc_id"]: r["n_hit_shingles"] for r in
           decontaminate(docs, eval_pred=F.col("doc_id") == 0, n=4).collect()}
    assert out == {1: 1, 3: 2}  # eval doc itself excluded; doc 2 clean


def test_boilerplate_fraction(spark):
    # "a b c" appears in 3 docs (df=3 >= min_df=3); each doc also has a
    # unique trailing 3-gram -> frac 0.5 for the boilerplate docs
    docs = _docs(
        spark,
        [
            (0, "a b c u0 v0"),
            (1, "a b c u1 v1"),
            (2, "a b c u2 v2"),
            (3, "p q r s t"),
        ],
    )
    out = {r["doc_id"]: r for r in boilerplate_fraction(docs, n=3, min_df=3).collect()}
    # doc 0: shingles {a b c, b c u0, c u0 v0} -> 1 boiler of 3
    assert out[0]["n_shingles"] == 3 and out[0]["n_boiler"] == 1
    assert abs(out[0]["boiler_frac"] - 1 / 3) < 1e-15
    assert out[3]["n_boiler"] == 0 and out[3]["boiler_frac"] == 0.0


def test_conv_neardup_finds_edited_rerun(spark):
    from log_formatter_spark.operators.conversations import conv_neardup, conv_text

    # 30 distinct-content turns: one edited turn keeps est ~0.94 and a
    # full band still matches (detection is DETERMINISTIC for fixed
    # texts — the md5 band family either collides or it doesn't)
    base = [
        (
            "c1",
            i,
            f"shared turn content alpha beta gamma delta epsilon count {i} word{i * 7 % 13}",
        )
        for i in range(30)
    ]
    # c2 = c1 re-logged with ONE edited turn (near-dup, not exact);
    # c3 = unrelated
    edited = [
        ("c2", i, t if i != 29 else "an entirely different edited turn body")
        for (_, i, t) in base
    ]
    other = [("c3", i, f"totally unrelated conversation text {i} xyz") for i in range(30)]
    def rows(tuples):
        return [
            (c, i, "user", txt, dt.datetime(2024, 1, 1, 0, i)) for c, i, txt in tuples
        ]

    t = _turns(spark, rows(base + edited + other))
    pairs = {
        (r["conv_a"], r["conv_b"]): r["est_jaccard"]
        for r in conv_neardup(t, min_est=0.5).collect()
    }
    assert set(pairs) == {("c1", "c2")}
    assert 0.5 <= pairs[("c1", "c2")] < 1.0  # near, not exact
    # exact re-log IS est 1.0
    relog = [("c4", i, t2) for (_, i, t2) in base]
    t2 = _turns(spark, rows(base + edited + other + relog))
    pairs2 = {
        (r["conv_a"], r["conv_b"]): r["est_jaccard"]
        for r in conv_neardup(t2, min_est=0.5).collect()
    }
    assert pairs2[("c1", "c4")] == 1.0


def test_conv_text_order_is_canonical(spark):
    from log_formatter_spark.operators.conversations import conv_text

    rows = [
        ("c1", 2, "user", "third", dt.datetime(2024, 1, 1)),
        ("c1", 0, "user", "first first first", dt.datetime(2024, 1, 1)),
        ("c1", 1, "user", "second", dt.datetime(2024, 1, 1)),
    ]
    t = _turns(spark, rows).repartition(3)
    out = conv_text(t).collect()
    assert out[0]["text"] == "first first first\nsecond\nthird"
