"""Grok expansion: dictionary invariants, engine parity, planner sugar."""

from __future__ import annotations

import re

import pytest

from log_formatter_spark.contract import GROK_TRANSCRIPT
from log_formatter_spark.functions.grok import (
    GROK_PATTERNS,
    grok_field_types,
    grok_fields,
    grok_parser,
    grok_to_regex,
)
from log_formatter_spark.operators.parser import ParserConfig, apply_parser
from log_formatter_spark.transcripts import TRANSCRIPT_PATTERN, transcripts_from_events


def test_dictionary_has_no_anonymous_capturing_groups():
    """Group index == field position depends on every dictionary entry
    contributing only NAMED groups (oracles extract by index): leaf
    patterns are capture-free; composites like COMMONAPACHELOG may add
    named fields but never an unnamed capture."""
    for name in GROK_PATTERNS:
        c = re.compile(grok_to_regex("%{" + name + "}"))
        assert c.groups == len(c.groupindex), name


def test_dictionary_has_no_single_quotes():
    """Entries embed inside SQL string literals."""
    for name, pat in GROK_PATTERNS.items():
        assert "'" not in pat, name


def test_expansion_named_and_anonymous():
    r = grok_to_regex("%{INT:n} %{WORD}")
    c = re.compile(r)
    assert c.groupindex == {"n": 1}
    assert c.groups == 1
    m = c.search("x -42 abc")
    assert m.group("n") == "-42"


def test_nested_composite_fields_in_order():
    fields = grok_fields("%{COMMONAPACHELOG}")
    assert fields == [
        "clientip", "ident", "auth", "timestamp",
        "verb", "request", "httpversion", "response", "bytes",
    ]
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    m = re.search(grok_to_regex("%{COMMONAPACHELOG}"), line)
    assert m and m.group("clientip") == "127.0.0.1"
    assert m.group("verb") == "GET"
    assert m.group("response") == "200"
    assert m.group("bytes") == "2326"


def test_unknown_pattern_raises():
    with pytest.raises(ValueError, match="unknown grok pattern"):
        grok_to_regex("%{NOPE:x}")


def test_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        grok_to_regex("%{A}", extra_patterns={"A": "%{B}", "B": "%{A}"})


def test_custom_patterns_and_type_hints():
    r = grok_to_regex("%{HEXID:h}", extra_patterns={"HEXID": r"(?:0x[0-9a-f]+)"})
    assert re.search(r, "id=0xdeadbeef").group("h") == "0xdeadbeef"
    assert grok_field_types("%{INT:n:int} %{NUMBER:x:float} %{WORD:w}") == {
        "n": "int",
        "x": "float",
    }


def test_timestamp_and_loglevel_shapes():
    r = grok_to_regex("%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:lvl}")
    for line, ts, lvl in [
        ("2026-08-17 12:34:56 INFO go", "2026-08-17 12:34:56", "INFO"),
        ("2026-01-02T03:04:05Z WARN x", "2026-01-02T03:04:05Z", "WARN"),
        ("2026-12-31 23:59 error y", "2026-12-31 23:59", "error"),
    ]:
        m = re.search(r, line)
        assert m and m.group("ts") == ts and m.group("lvl") == lvl, line


def test_grok_transcript_matches_raw_pattern_semantics(spark, sf_dir):
    """The grok rendering of the transcript extraction and the raw
    TRANSCRIPT_PATTERN agree row-for-row on the driver corpus — and the
    jvm engine agrees with the arrow engine on the expanded pattern."""
    t = transcripts_from_events(spark, sf_dir).limit(400)
    cols = ["conv_id", "turn_idx", "parse_ok", "ts_str", "level", "tool_tag", "body"]
    raw = apply_parser(t, ParserConfig(TRANSCRIPT_PATTERN, "text", engine="arrow"))
    gk_arrow = apply_parser(t, grok_parser(GROK_TRANSCRIPT, engine="arrow"))
    gk_jvm = apply_parser(t, grok_parser(GROK_TRANSCRIPT, engine="jvm"))
    rows_raw = sorted(map(tuple, raw.select(cols).collect()))
    assert rows_raw == sorted(map(tuple, gk_arrow.select(cols).collect()))
    assert rows_raw == sorted(map(tuple, gk_jvm.select(cols).collect()))


def test_planner_grok_key(spark, sf_dir):
    from log_formatter_spark.plans.planner import FORMATTERS

    t = transcripts_from_events(spark, sf_dir).limit(50)
    df = FORMATTERS["parser"](t, {"grok": GROK_TRANSCRIPT})
    ok = df.filter("parse_ok").count()
    assert ok > 0
    assert "ts_str" in df.columns and "level" in df.columns
