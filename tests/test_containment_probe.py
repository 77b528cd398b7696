"""containment_probe (bipartite ingest containment gate) and its
streaming twin: batch ≡ streaming under micro-batch slicing, and the
semantic property the hash can't see — a short doc fully embedded in a
corpus page gates at containment 1.0 while its est-Jaccard is tiny."""

from __future__ import annotations

import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_formatter_spark.operators.dedup import containment_probe, incremental_neardup


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)]
    )


def test_probe_gates_embedded_quote(spark):
    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    page = filler + " " + quote + " " + filler.replace("w", "z")
    batch = _docs(spark, [quote])
    corpus = spark.createDataFrame([Row(doc_id=100, text=page)])
    got = containment_probe(batch, corpus, n=3, min_containment=0.5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["batch_doc"], r["corpus_doc"], r["containment"]) == (0, 100, 1.0)
    assert r["inter"] == r["n_sh"]
    # the Jaccard-style near-dup probe misses the same pair entirely
    nd = incremental_neardup(batch, corpus, n=3, min_est=0.5).collect()
    assert nd == []


def test_probe_threshold_and_disjoint(spark):
    batch = _docs(spark, ["a b c d e f", "p q r s"])
    corpus = spark.createDataFrame(
        [Row(doc_id=100, text="c d e f g h")]  # shares 'c d e','d e f' with doc 0
    )
    rows = containment_probe(batch, corpus, n=3, min_containment=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["batch_doc"], r["corpus_doc"]) == (0, 100)
    assert r["containment"] == 0.5  # 2 of doc 0's 4 shingles


def test_probe_hot_shingle_guard(spark):
    """max_doc_freq removes corpus-boilerplate shingles from BOTH join
    sides but leaves the denominator alone: overlap through the hot
    shingle stops counting, genuine overlap still does, and the guarded
    containment is always <= the unguarded one."""
    boiler = "click here to subscribe"
    corpus = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"u{i} v{i} w{i} " + boiler) for i in range(6)]
        + [Row(doc_id=200, text="a b c d e f " + boiler)]
    )
    batch = _docs(spark, ["a b c d e f " + boiler])
    raw = containment_probe(batch, corpus, n=3, min_containment=0.0).collect()
    guarded = containment_probe(
        batch, corpus, n=3, min_containment=0.0, max_doc_freq=3
    ).collect()
    raw_m = {(r["batch_doc"], r["corpus_doc"]): r for r in raw}
    g_m = {(r["batch_doc"], r["corpus_doc"]): r for r in guarded}
    # boilerplate-only pairs vanish entirely under the guard
    assert any(c >= 100 and c < 200 for _, c in raw_m)
    assert all(not (100 <= c < 200) for _, c in g_m)
    # the genuine-content pair survives with boilerplate overlap removed
    r, g = raw_m[(0, 200)], g_m[(0, 200)]
    assert g["n_sh"] == r["n_sh"]  # denominator untouched
    assert g["inter"] < r["inter"]
    assert g["containment"] < r["containment"]
    # DuckDB twin agrees under the guard
    import duckdb

    from log_formatter_spark.operators.dedup import containment_probe_sql

    con = duckdb.connect()
    con.register("bt_in", batch.toPandas())
    con.register("cp_in", corpus.toPandas())
    sql = containment_probe_sql(
        "SELECT * FROM bt_in", "SELECT * FROM cp_in", n=3,
        min_containment=0.0, max_doc_freq=3,
    )
    oracle = {
        (r.batch_doc, r.corpus_doc): (r.n_sh, r.inter, r.containment)
        for r in con.execute(sql).df().itertuples()
    }
    got = {
        (r["batch_doc"], r["corpus_doc"]): (r["n_sh"], r["inter"], r["containment"])
        for r in guarded
    }
    assert got == oracle


def test_streaming_equals_batch_under_slicing(spark, sf_dir):
    """One file per trigger over 4 files: the complete-mode final table
    must equal the batch definition row-for-row."""
    work = tempfile.mkdtemp(prefix="lfs_stream_containment_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.where(F.col("doc_id") % 5 == 0)
    corpus = docs.where(F.col("doc_id") % 5 != 0)
    src = f"{work}/in"
    batch.repartition(4).write.mode("overwrite").parquet(src)
    q = (
        containment_probe(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
            n=3,
            min_containment=0.2,
        )
        .writeStream.format("memory")
        .queryName("t_containment_slicing")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.table("t_containment_slicing").collect()}
    expected = {
        tuple(r)
        for r in containment_probe(batch, corpus, n=3, min_containment=0.2).collect()
    }
    assert streamed == expected
    assert streamed  # the fixture must actually produce pairs
