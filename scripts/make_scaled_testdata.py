#!/usr/bin/env python
"""Deterministic K× scale-up of the driver testdata (default 10×),
for the one-notch-up bench run recorded in BENCH.md.

Design goal: K× the *work*, not K²×. Naive replication makes every
replica an exact duplicate of every other, so pair-forming dedup joins
blow up quadratically in K (bucket sizes ×K → join rows ×K²) — a
duplication-rate artifact, not a scale-up. Instead each replica is
transformed so that within-replica structure is IDENTICAL to the
original while cross-replica collisions vanish:

- documents: per-replica Caesar rotation of letters (+ digit rotation).
  Token boundaries, lengths and duplicate groups are preserved within a
  replica; across replicas no shingle ever matches.
- embeddings: per-replica deterministic sign-flip pattern over
  dimensions — an orthogonal transform, so within-replica cosines are
  bit-identical to the original corpus; across replicas vectors
  decorrelate.
- events: user_id shifted by a replica offset (new conversations, same
  per-conversation turn structure).

Usage: python scripts/make_scaled_testdata.py [K] [src_dir] [out_dir]
"""

from __future__ import annotations

import string
import sys

from pyspark.sql import functions as F

from log_formatter_spark.session import get_spark


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/lfs_sf1"
    spark = get_spark("make-scaled-testdata", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    digits = string.digits

    def _union_write(parts, path, n_part):
        d = parts[0]
        for p in parts[1:]:
            d = d.unionAll(p)
        d.repartition(n_part).write.mode("overwrite").parquet(path)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    doc_parts = []
    for r in range(k):
        # Affine letter permutation i -> (a*i + r) mod 26 with a
        # multiplier that changes every 26 replicas: a plain Caesar
        # shift repeats with period 26, so at K > 26 digit-free docs
        # became exact cross-replica duplicates (caught by the 100x
        # sweep — a duplication-rate artifact, not scale). Affine maps
        # with distinct (a, b) are distinct permutations, so letter
        # transforms are unique for all r < 26 * len(mults).
        a = (1, 3, 5, 7, 9)[r // 26 % 5]
        b = r % 26
        lrot = "".join(lower[(a * i + b) % 26] for i in range(26))
        urot = "".join(upper[(a * i + b) % 26] for i in range(26))
        drot = digits[r % 10:] + digits[: r % 10]
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_docs)).alias("doc_id"),
                F.translate(F.col("text"), lower + upper + digits, lrot + urot + drot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    _union_write(doc_parts, f"{out}/documents.parquet", 32)

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    emb_parts = []
    for r in range(k):
        # sign of dim j in replica r: flip iff bit (j % 7) of (r * 2654435761) is set
        mask = (r * 2654435761) & 0x7F
        signs = [(-1.0 if (mask >> (j % 7)) & 1 else 1.0) for j in range(64)]
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * n_vec)).alias("vec_id"),
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(s) for s in signs]).cast("array<float>"),
                    lambda x, s: x * s,
                ).alias("embedding"),
                "label",
            )
        )
    _union_write(emb_parts, f"{out}/embeddings.parquet", 16)

    ev = spark.read.parquet(f"{src}/events.parquet")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    ev_parts = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(r * n_users)) for r in range(k)
    ]
    _union_write(ev_parts, f"{out}/events.parquet", 32)

    # warehouse tables (round 2b: the OLAP trio + rollup/pivot/asof run
    # at 10× too). Facts replicate with key offsets — new orders for the
    # same replicated customer population; dims (part/supplier/nation/
    # region) stay fixed, as dims do at real scale.
    orders = spark.read.parquet(f"{src}/orders.parquet")
    cust = spark.read.parquet(f"{src}/customer.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    n_cust = cust.agg(F.max("c_custkey")).first()[0] + 1
    ord_parts = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(r * n_ord))
        .withColumn("o_custkey", F.col("o_custkey") + F.lit((r % 2) * n_cust))
        for r in range(k)
    ]
    cust_parts = [
        cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(r * n_cust))
        for r in range(2)  # customer pop grows slower than the fact tables
    ]
    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * n_ord))
        for r in range(k)
    ]

    _union_write(ord_parts, f"{out}/orders.parquet", 16)
    _union_write(cust_parts, f"{out}/customer.parquet", 4)
    _union_write(li_parts, f"{out}/lineitem.parquet", 32)
    for dim in ("supplier", "nation", "region", "part"):
        spark.read.parquet(f"{src}/{dim}.parquet").write.mode("overwrite").parquet(
            f"{out}/{dim}.parquet"
        )

    print(
        f"wrote {k}x scale-up of {src} to {out}: "
        f"{spark.read.parquet(f'{out}/documents.parquet').count()} docs, "
        f"{spark.read.parquet(f'{out}/embeddings.parquet').count()} vecs, "
        f"{spark.read.parquet(f'{out}/events.parquet').count()} events"
    )
    spark.stop()


if __name__ == "__main__":
    main()
