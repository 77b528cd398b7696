"""Grok pattern language → regex expansion (Logstash-compatible subset).

The reference's parser takes a raw ``components_regex`` with Go/RE2
named groups (agent/pipeline/parser/parser.go:99-104); Logstash-style
deployments write the same extractions as grok expressions
(``%{IP:client} %{WORD:method}``). This module compiles that surface
down to the exact named-group regex the parse operator already runs,
so grok costs nothing at execution time — it is pure plan-time sugar
over :class:`~log_formatter_spark.operators.parser.ParserConfig`.

Syntax supported:

- ``%{NAME:field}``  → ``(?P<field>expansion)`` — extracted column.
- ``%{NAME}``        → ``(?:expansion)`` — matched, not extracted.
- ``%{NAME:field:int}`` / ``:float`` — Logstash type hints; accepted,
  the target type is reported by :func:`grok_field_types` (the parse
  operator emits strings, casting is the caller's ``select``).
- pattern definitions may reference other patterns recursively.

Engine parity contract: every dictionary entry below is RE2-safe (no
backrefs/lookaround) and CONTAINS NO CAPTURING GROUPS — all grouping is
``(?:...)``. Named groups therefore come only from ``%{NAME:field}``
sites, so group *index* equals field *position*: the same expanded
pattern drives the arrow engine (pyarrow RE2), the jvm engine (Java
regex codegen) and the DuckDB oracle's ``regexp_extract(text, p, idx)``
with identical numbering. ``tests/test_grok.py`` pins the no-capture
invariant for the whole dictionary.
"""

from __future__ import annotations

import re

from log_formatter_spark.operators.parser import ParserConfig

# Leaf and composite patterns. RE2-safe; non-capturing groups only; no
# single quotes (entries are embedded inside SQL string literals by
# oracle renderings).
GROK_PATTERNS: dict[str, str] = {
    # --- primitives -------------------------------------------------
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"(?:[+-]?\d+)",
    "NONNEGINT": r"\d+",
    "POSINT": r"(?:[1-9]\d*)",
    "NUMBER": r"(?:[+-]?(?:\d+(?:\.\d+)?|\.\d+))",
    "BASE16NUM": r"(?:0[xX][0-9a-fA-F]+|[0-9a-fA-F]+)",
    "UUID": r"(?:[0-9a-fA-F]{8}(?:-[0-9a-fA-F]{4}){3}-[0-9a-fA-F]{12})",
    # --- network ----------------------------------------------------
    "IPV4": r"(?:(?:\d{1,3}\.){3}\d{1,3})",
    "IP": r"%{IPV4}",
    "HOSTNAME": r"(?:\b[0-9A-Za-z](?:[0-9A-Za-z-]{0,62})?(?:\.[0-9A-Za-z](?:[0-9A-Za-z-]{0,62})?)*\.?)",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILADDRESS": r"(?:[a-zA-Z0-9_.+-]+@[0-9A-Za-z][0-9A-Za-z-]*(?:\.[0-9A-Za-z][0-9A-Za-z-]*)+)",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*()~_%-]*)+",
    # --- date / time ------------------------------------------------
    "YEAR": r"(?:\d{4})",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:0?[1-9]|[12]\d|3[01])",
    "HOUR": r"(?:2[0-3]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:[0-5]?\d(?:\.\d+)?|60)",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    # --- misc -------------------------------------------------------
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE"
        r"|[Ii]nfo(?:rmation)?|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?"
        r"|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?"
        r"|[Ff]atal|FATAL|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)"
    ),
    "QUOTEDSTRING": r'(?:"[^"]*")',
    # Composite with named fields: the classic access-log line.
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] "
        r'"%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?" '
        r"%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
}

_GROK_SITE = re.compile(r"%\{(\w+)(?::([A-Za-z_]\w*)(?::(int|float))?)?\}")
_MAX_DEPTH = 16


def grok_to_regex(expr: str, extra_patterns: dict[str, str] | None = None) -> str:
    """Expand a grok expression to a plain named-group regex."""
    pats = dict(GROK_PATTERNS)
    if extra_patterns:
        pats.update(extra_patterns)

    def expand(e: str, depth: int) -> str:
        if depth > _MAX_DEPTH:
            raise ValueError("grok expansion too deep — pattern cycle?")

        def sub(m: re.Match) -> str:
            name, fld = m.group(1), m.group(2)
            if name not in pats:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            body = expand(pats[name], depth + 1)
            return f"(?P<{fld}>{body})" if fld else f"(?:{body})"

        return _GROK_SITE.sub(sub, e)

    return expand(expr, 0)


def grok_fields(expr: str, extra_patterns: dict[str, str] | None = None) -> list[str]:
    """Field names in group-index order (composites contribute theirs)."""
    pattern = grok_to_regex(expr, extra_patterns)
    gi = re.compile(pattern).groupindex
    return sorted(gi, key=gi.__getitem__)


def grok_field_types(expr: str) -> dict[str, str]:
    """Logstash ``:int`` / ``:float`` type hints per top-level field."""
    return {
        m.group(2): m.group(3)
        for m in _GROK_SITE.finditer(expr)
        if m.group(2) and m.group(3)
    }


def grok_parser(
    grok_expr: str,
    target_field: str = "text",
    extra_patterns: dict[str, str] | None = None,
    **kwargs,
) -> ParserConfig:
    """Build a :class:`ParserConfig` from a grok expression."""
    return ParserConfig(
        components_regex=grok_to_regex(grok_expr, extra_patterns),
        target_field=target_field,
        **kwargs,
    )
