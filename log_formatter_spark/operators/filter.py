"""Field-projection operator (the reference's ``filter`` formatter).

Reference: keeps only fields whose *name* matches some ``include_fields``
regex, building a fresh doc (agent/pipeline/filter/filter.go:58-69).
``exclude_fields`` is validated as mutually exclusive with include
(filter.go:43-45) but — reference quirk — never applied in ``Format``,
so an exclude-only config emits empty docs. We implement exclude
properly (documented divergence, SURVEY.md §2.2): excluded columns are
dropped, everything else kept.

In a schema'd world this is plan-time column pruning: a ``select`` over
statically-known names, which Catalyst pushes into the scan
(``ReadSchema``) — zero runtime cost, unlike the reference's per-doc
map rebuild.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def apply_filter(
    df: DataFrame,
    include_fields: list[str] | None = None,
    exclude_fields: list[str] | None = None,
) -> DataFrame:
    if include_fields and exclude_fields:
        # filter.go:43-45: "include and exclude fields are mutually exclusive"
        raise ValueError("include_fields and exclude_fields are mutually exclusive")
    if include_fields:
        pats = [re.compile(p) for p in include_fields]
        keep = [c for c in df.columns if any(p.search(c) for p in pats)]
        return df.select(*keep)
    if exclude_fields:
        pats = [re.compile(p) for p in exclude_fields]
        drop = [c for c in df.columns if any(p.search(c) for p in pats)]
        return df.drop(*drop)
    return df
