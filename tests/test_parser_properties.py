"""Property-based parser parity: for arbitrary (well-formed and
garbage) input strings, both parse engines must agree exactly with the
pure-Python oracle's reference semantics (search-anywhere, all-named-
groups extraction, `_`-discard, non-participating group → \"\", no
match → discard flag)."""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log_formatter_spark.operators.parser import ParserConfig, apply_parser
from log_formatter_spark.oracle import parse_doc
from log_formatter_spark.transcripts import TRANSCRIPT_PATTERN

_LEVELS = ["INFO", "WARN", "ERROR", "DEBUG", ""]
_TOOLS = ["bash", "read", "", "grep"]


@st.composite
def log_lines(draw):
    """Mostly-well-formed lines with adversarial mutations mixed in."""
    kind = draw(st.integers(0, 4))
    ts = draw(st.integers(0, 10**9))
    t = datetime.fromtimestamp(ts, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
    level = draw(st.sampled_from(_LEVELS))
    tool = draw(st.sampled_from(_TOOLS))
    body = draw(st.text(alphabet="abc xyz=[]()0 9", min_size=0, max_size=30))
    turn = draw(st.integers(0, 999))
    if kind == 0:  # canonical
        return f"{t} {level or 'INFO'} [{tool}] {body} turn={turn}"
    if kind == 1:  # missing level (reference malformed shape)
        return f"{t} [{tool}] {body} turn={turn}"
    if kind == 2:  # prefix noise (search semantics: still matches)
        return f"noise {t} {level or 'WARN'} [{tool}] {body} turn={turn}"
    if kind == 3:  # missing turn suffix
        return f"{t} {level or 'INFO'} [{tool}] {body}"
    return draw(st.text(max_size=60))  # arbitrary garbage


def test_null_text_is_parse_failure_in_every_engine(spark):
    """NULL input text → parse_ok=false (not NULL) with null fields, in
    both vectorized engines and jvm codegen alike; fixture data never
    contains nulls, so this pins the edge the contract can't reach."""
    df = spark.createDataFrame(
        [(0, None), (1, "2024-01-02 03:04:05 INFO [bash] hi turn=1")],
        "i long, text string",
    )
    for engine in ("arrow", "jvm"):
        out = apply_parser(df, ParserConfig(TRANSCRIPT_PATTERN, "text", engine=engine))
        rows = {r["i"]: r for r in out.collect()}
        assert rows[0]["parse_ok"] is False, f"engine={engine}: null text must be False"
        assert rows[0]["level"] is None
        assert rows[1]["parse_ok"] is True


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(log_lines(), min_size=1, max_size=40))
def test_engines_match_python_oracle(spark, lines):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)], "i long, text string")
    want = []
    for s in lines:
        parsed = parse_doc({"text": s}, TRANSCRIPT_PATTERN)
        if parsed is None:
            want.append((False, None, None, None, None))
        else:
            want.append(
                (True, parsed["ts_str"], parsed["level"], parsed["tool_tag"], parsed["body"])
            )
    for engine in ("arrow", "jvm"):
        out = apply_parser(df, ParserConfig(TRANSCRIPT_PATTERN, "text", engine=engine))
        got = [
            (r["parse_ok"], r["ts_str"], r["level"], r["tool_tag"], r["body"])
            for r in out.orderBy("i").collect()
        ]
        assert got == want, f"engine={engine} diverged from oracle"
