"""The Spark transcript view and its DuckDB SQL rendering must be
byte-identical — this is the foundation the driver's oracle checks stand
on (__spark_entry__.oracle_sql builds on TRANSCRIPTS_SQL)."""

from __future__ import annotations

import duckdb

from log_formatter_spark.transcripts import TRANSCRIPTS_SQL, transcripts_from_events


def test_spark_matches_duckdb(spark, sf_dir):
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in transcripts_from_events(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = con.execute(TRANSCRIPTS_SQL).fetchall()
    assert len(want) == len(got)
    for conv_id, turn_idx, role, text, tool, ts in want:
        g = got[(conv_id, turn_idx)]
        assert g["role"] == role
        assert g["text"] == text
        assert g["tool"] == tool
        assert g["ts"] == ts
