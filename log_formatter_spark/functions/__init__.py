"""Scalar/array function library shared by the training-data operators.

Each function exists in two lockstep renderings: a Spark ``Column``
builder (the engine) and a DuckDB SQL template (the oracle the driver
compares against). Tests assert the two renderings are value-identical
over the driver testdata.
"""

from log_formatter_spark.functions.hashing import md5_60, MD5_60_SQL
from log_formatter_spark.functions.text import (
    tokens,
    TOKENS_SQL,
    STOPWORDS,
    BPE_TOKEN_RE,
)

__all__ = [
    "md5_60",
    "MD5_60_SQL",
    "tokens",
    "TOKENS_SQL",
    "STOPWORDS",
    "BPE_TOKEN_RE",
]
