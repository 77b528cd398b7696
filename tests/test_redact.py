"""PII redaction: rule behavior, counts, rule-order contract."""

from __future__ import annotations

from log_formatter_spark.functions.redact import PII_RULES, redact_text


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = redact_text(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_rules_replace_and_count(spark):
    got = _run(
        spark,
        [
            (1, "mail a.b+c@sub.example.org now"),
            (2, "from 192.168.0.1 to 10.0.0.255 done"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "clean text, nothing to scrub"),
            (5, "x@y.io and 8.8.8.8 and +44 (020) 555-1234"),
        ],
    )
    assert got[1]["clean_text"] == "mail <EMAIL> now"
    assert got[1]["n_email"] == 1 and got[1]["n_ip"] == 0
    assert got[2]["clean_text"] == "from <IP> to <IP> done"
    assert got[2]["n_ip"] == 2
    assert got[3]["clean_text"] == "call <PHONE> today"
    assert got[3]["n_phone"] == 1
    assert got[4]["clean_text"] == "clean text, nothing to scrub"
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[5]["clean_text"] == "<EMAIL> and <IP> and <PHONE>"


def test_email_wins_over_ip_on_overlap(spark):
    """Rule order is part of the contract: an email whose domain looks
    IP-ish is consumed by the email rule first, so the ip count (measured
    on ORIGINAL text) may still see it — replacement, however, must
    yield a single <EMAIL> token, not a mangled hybrid."""
    got = _run(spark, [(1, "ping user@4.example.com ok")])
    assert got[1]["clean_text"] == "ping <EMAIL> ok"
    assert got[1]["n_email"] == 1


def test_counts_are_long_typed(spark):
    out = redact_text(
        spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    )
    kinds = dict(out.dtypes)
    for name, _p, _r in PII_RULES:
        assert kinds[f"n_{name}"] == "bigint"


def test_no_python_udfs_in_plan(spark):
    df = redact_text(
        spark.createDataFrame([(1, "a@b.co x")], "doc_id long, text string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
