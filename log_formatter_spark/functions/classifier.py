"""Hashed linear text classifier — fastText-shaped quality inference.

The fastText / CCNet quality-classifier step every production corpus
pipeline runs: score each document with a linear model over hashed
bag-of-words features ("the hashing trick": token → bucket via a hash,
weight per bucket, score = Σ weights). What makes this a *Spark* problem
is the inference plan, not the weights:

- feature hashing + weight lookup + accumulation are ONE map-only
  projection over the text scan — a higher-order ``aggregate`` fold over
  the token array, so a corpus-sized scoring pass has ZERO exchanges and
  never materializes a (doc, token) table;
- a trained model drops in as ``F.element_at(F.lit(weights), bucket+1)``
  (a literal/broadcast array lookup, still codegen) in place of the
  hash-derived weight used here.

The weights in this module are a deterministic stand-in — each bucket's
weight is a small signed integer derived from md5 of the bucket id — so
the operator has a bit-exact DuckDB oracle (integer sums are order-free;
no trained-float reproducibility question). That makes the *plumbing*
(hashing, bucketing, fold, margin, threshold decision) verifiable
end-to-end, which is the part that survives a model swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from log_formatter_spark.functions.hashing import MD5_60_SQL, md5_60
from log_formatter_spark.functions.text import TOKENS_SQL, tokens

N_BUCKETS = 256
# weight(bucket) = md5_60("w:" || bucket) % 17 - 8  ∈ [-8, 8]
_W_SPAN = 17
_W_SHIFT = 8


def _bucket(tok: Column) -> Column:
    return md5_60(tok) % F.lit(N_BUCKETS)


def _weight(tok: Column) -> Column:
    h = md5_60(F.concat(F.lit("w:"), _bucket(tok).cast("string")))
    return h % F.lit(_W_SPAN) - F.lit(_W_SHIFT)


def _check_weights(weights) -> None:
    """A weight table of the wrong size would make ``element_at`` read
    past the array end — NULL in non-ANSI Spark, i.e. silently NULL
    margins for every doc touching a high bucket — so fail loudly."""
    if len(weights) != N_BUCKETS:
        raise ValueError(
            f"weights must have exactly {N_BUCKETS} entries, got {len(weights)}"
        )


def _fold_margin(toks: Column, weights: list[float] | None) -> Column:
    """Zero-exchange margin fold over the token array: stand-in integer
    weights (long accumulator, the oracle path) or a trained
    ``list[float]`` embedded as one array literal (double accumulator —
    the ``element_at`` lookup stays codegen)."""
    if weights is None:
        return F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + _weight(t))
    _check_weights(weights)
    w_lit = F.lit([float(w) for w in weights])
    return F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(w_lit, (_bucket(t) + 1).cast("int")),
    )


def hashed_margin(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: list[float] | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, margin, mean_margin, pred): linear margin of
    the hashed bag-of-words model, with multiplicity (a token scores
    once per occurrence, exactly fastText's sum-of-input-vectors with
    dim=1). ``mean_margin`` is one IEEE division (length-normalized
    score, fastText's default); ``pred`` thresholds the margin at 0.

    ``weights``: None keeps the deterministic stand-in model (integer
    margin — the driver-oracle path); a ``list[float]`` of
    ``N_BUCKETS`` weights — e.g. from :func:`train_hashed_logreg` —
    swaps in the trained model (double margin, same plan shape).

    Map-only: the fold runs inside the projection, so scoring 10^12
    docs is a scan — no shuffle, no join, no Python. NULL text scores
    as empty (coalesce) — Spark's legacy size(NULL) = -1 would
    otherwise diverge from DuckDB's len(NULL) = NULL."""
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    margin = _fold_margin(toks, weights)
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        margin.alias("margin"),
    )
    return base.select(
        id_col,
        "n_tokens",
        "margin",
        F.when(
            F.col("n_tokens") > 0,
            F.col("margin").cast("double") / F.col("n_tokens").cast("double"),
        ).alias("mean_margin"),
        (F.col("margin") > 0).alias("pred"),
    )


def hashed_margin_sql(
    src: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    toks = TOKENS_SQL.format(x=f"COALESCE({text_col}, '')")
    bucket = f"({MD5_60_SQL.format(x='t')} % {N_BUCKETS})"
    weight = (
        MD5_60_SQL.format(x=f"'w:' || CAST({bucket} AS VARCHAR)")
        + f" % {_W_SPAN} - {_W_SHIFT}"
    )
    return f"""
SELECT {id_col}, n_tokens, margin,
       CASE WHEN n_tokens > 0
            THEN CAST(margin AS DOUBLE) / CAST(n_tokens AS DOUBLE) END AS mean_margin,
       margin > 0 AS pred
FROM (
  SELECT {id_col},
         CAST(len({toks}) AS INTEGER) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform({toks}, t -> {weight})), (a, b) -> a + b) AS margin
  FROM {src}
)
"""


# --- in-engine training (r3 VERDICT #5) ------------------------------------
#
# Full-batch logistic-regression gradient descent over the same hashed
# bag-of-words features, expressed so that every step is (a) one
# corpus SCAN + one 256-row aggregate — the distributed-training shape
# that works at 10^12 docs — and (b) bit-reproducible across engines:
#
# - the link is the RATIONAL "fast sigmoid" p = 0.5 + 0.5·m/(1+|m|)
#   instead of exp: composed of + * / abs only, it is IEEE-exact and
#   identical in Spark, DuckDB and Python (exp differs in the last ulp
#   across libms, which breaks hash gates). fastText itself evaluates
#   its sigmoid from a 512-entry precomputed table, so an approximated
#   link is faithful to the reference implementation; the loss stays
#   convex-shaped and sign-correct.
# - per-document residuals are quantized to FIXED POINT,
#   floor((y − p)·2^32) as int64, so the per-bucket gradient is an
#   integer sum — order-free, map-side combinable, and immune to float
#   reduction-order nondeterminism. |rfx| ≤ 2^32, so the int64 sum is
#   exact up to 2^31 token occurrences per bucket per step; beyond
#   that, lower fx scaling (the doc_lm_score trick at 2^40 has the
#   same ceiling analysis).
# - the default lr = 0.5 is a power of two: the driver-side weight
#   update w + lr·((grad/2^32)/n_docs) then carries exactly ONE
#   rounding (the /n_docs), identical everywhere.

FX_SCALE = 4294967296.0  # 2^32, exact in binary64
DEFAULT_LR = 0.5


def _label_col(label) -> Column:
    # default task: language ID (en vs rest) — the fastText/CCNet
    # curation classifier's actual job — from the documents table
    if label is None:
        return F.col("lang") == F.lit("en")
    return label


def train_step(
    docs: DataFrame,
    weights: list[float] | None = None,
    lr: float = DEFAULT_LR,
    label: Column | None = None,
    n_docs: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One full-batch gradient step: (bucket, n_hits, grad_fx, w_next)
    for every feature bucket that occurs in the corpus.

    ``weights=None`` starts from the stand-in integer model (the
    configuration the driver oracle pins — see
    ``classifier_train_step`` in the contract catalog); a
    ``list[float]`` continues from trained weights. ``n_hits`` is the
    bucket's token-occurrence count, ``grad_fx`` the fixed-point
    residual sum Σ floor((y−p)·2^32) over those occurrences, and
    ``w_next = w + lr·((grad_fx/2^32)/n_docs)`` the updated weight.

    Plan: margin + residual are a map-only projection (the fold runs
    inside the scan); the only exchange is the 256-key groupBy, whose
    partials combine map-side — per-step cost is one corpus scan
    regardless of corpus size. Buckets absent from the corpus carry a
    zero gradient and are simply not emitted."""
    if n_docs is None:
        n_docs = docs.count()
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    m = _fold_margin(toks, weights).cast("double")
    q = m / (F.lit(1.0) + F.abs(m))
    p = F.lit(0.5) + F.lit(0.5) * q
    y = F.when(_label_col(label), F.lit(1.0)).otherwise(F.lit(0.0))
    rfx = F.floor((y - p) * F.lit(FX_SCALE)).cast("long")

    # rfx must be projected BELOW the explode: select(rfx, explode(toks))
    # puts rfx in the Project ABOVE Generate, re-evaluating the whole
    # O(n_tokens) margin fold once PER TOKEN ROW (quadratic per doc —
    # measured 3.5 s vs 0.25 s on 500 docs). Two selects pin it to one
    # evaluation per document, carried through Generate as a column.
    per_doc = docs.select(rfx.alias("rfx"), toks.alias("toks"))
    per_tok = per_doc.select("rfx", F.explode("toks").alias("tok"))
    grads = per_tok.groupBy(
        _bucket(F.col("tok")).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("rfx").alias("grad_fx"),
    )
    if weights is None:
        h = md5_60(F.concat(F.lit("w:"), F.col("bucket").cast("string")))
        w0 = (h % F.lit(_W_SPAN) - F.lit(_W_SHIFT)).cast("double")
    else:
        _check_weights(weights)
        w_lit = F.lit([float(w) for w in weights])
        w0 = F.element_at(w_lit, (F.col("bucket") + 1).cast("int"))
    w_next = w0 + F.lit(lr) * (
        (F.col("grad_fx").cast("double") / F.lit(FX_SCALE))
        / F.lit(float(n_docs))
    )
    return grads.select("bucket", "n_hits", "grad_fx", w_next.alias("w_next"))


def train_step_sql(
    src: str = "documents",
    lr: float = DEFAULT_LR,
    label_sql: str = "lang = 'en'",
    text_col: str = "text",
) -> str:
    """DuckDB rendering of the stand-in-initialized step — same fold,
    same rational link, same fixed-point floor, same pinned float-op
    order. ``sum(rfx)`` must be cast back to BIGINT (DuckDB group sums
    of BIGINT widen to HUGEINT; Spark stays int64)."""
    toks = TOKENS_SQL.format(x=f"COALESCE({text_col}, '')")
    bucket_t = f"({MD5_60_SQL.format(x='t')} % {N_BUCKETS})"
    weight_t = (
        MD5_60_SQL.format(x=f"'w:' || CAST({bucket_t} AS VARCHAR)")
        + f" % {_W_SPAN} - {_W_SHIFT}"
    )
    w0 = (
        MD5_60_SQL.format(x="'w:' || CAST(bucket AS VARCHAR)")
        + f" % {_W_SPAN} - {_W_SHIFT}"
    )
    return f"""
WITH scored AS (
  SELECT {toks} AS toks,
         CASE WHEN {label_sql} THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform({toks}, t -> {weight_t})), (a, b) -> a + b) AS DOUBLE) AS m
  FROM {src}
),
resid AS (
  SELECT toks,
         CAST(floor((y - (CAST(0.5 AS DOUBLE) + CAST(0.5 AS DOUBLE) * (m / (CAST(1 AS DOUBLE) + abs(m)))))
              * {FX_SCALE!r}) AS BIGINT) AS rfx
  FROM scored
),
tok AS (
  SELECT CAST({bucket_t} AS INTEGER) AS bucket, rfx
  FROM resid, unnest(toks) AS u(t)
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST(sum(rfx) AS BIGINT) AS grad_fx,
       CAST({w0} AS DOUBLE)
         + {lr!r} * ((CAST(CAST(sum(rfx) AS BIGINT) AS DOUBLE) / {FX_SCALE!r})
                     / CAST((SELECT count(*) FROM {src}) AS DOUBLE)) AS w_next
FROM tok
GROUP BY bucket
"""


def train_hashed_logreg(
    docs: DataFrame,
    n_iter: int = 8,
    lr: float = DEFAULT_LR,
    label: Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[float]:
    """Train the hashed logistic model in-engine: ``n_iter`` full-batch
    gradient steps from zero init, each one corpus scan + one 256-row
    aggregate collected to the driver (the anchors/BPE pattern — the
    collect is bucket-count-sized, never corpus-sized). Returns the
    ``N_BUCKETS`` weights for ``hashed_margin(docs, weights=...)``.

    Deterministic end-to-end: the per-step gradient is an exact integer
    sum (partitioning-independent) and the driver-side update is plain
    Python float arithmetic — pinned against a pure-Python replica in
    tests/test_classifier_train.py. Memoized like the LSH anchors /
    k-means centroids (training is a pure function of input + knobs)."""
    from log_formatter_spark.operators.similarity import _ANCHOR_MEMO, _memo_key

    # the label EXPRESSION must be part of the key: two trainings with
    # different label columns on the same input are different models
    # (`label is None` alone would hand the second caller the first
    # caller's cached weights)
    label_repr = "default" if label is None else str(_label_col(label)._jc)
    memo_key = _memo_key(docs, "logreg", n_iter, lr, id_col, text_col,
                         label_repr)
    if memo_key is not None and memo_key in _ANCHOR_MEMO:
        return list(_ANCHOR_MEMO[memo_key])

    n = docs.count()
    w = [0.0] * N_BUCKETS
    for _ in range(n_iter):
        rows = train_step(
            docs, weights=w, lr=lr, label=label, n_docs=n,
            id_col=id_col, text_col=text_col,
        ).collect()
        for r in rows:
            w[r["bucket"]] = r["w_next"]
    if memo_key is not None:
        if len(_ANCHOR_MEMO) > 64:
            _ANCHOR_MEMO.clear()
        _ANCHOR_MEMO[memo_key] = list(w)
    return w


EVAL_THRESHOLDS = tuple(range(-4, 5))


def classifier_eval(
    docs: DataFrame,
    thresholds: tuple[int, ...] = EVAL_THRESHOLDS,
    weights: list[float] | None = None,
    label: Column | None = None,
    eval_pred: Column | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Operating-point evaluation of the hashed classifier on a HELD-OUT
    split — the report that closes the train → score → DECIDE loop (a
    curation pipeline doesn't ship a margin, it ships a threshold; this
    is how the threshold gets picked). One row per candidate threshold:
    ``(threshold, tp, fp, fn, tn, precision, recall)`` over the eval
    slice (default ``doc_id % 5 == 0``, the held-out convention), label
    defaulting to the language-ID task the trainer optimizes.

    Plan: the margin fold is the same zero-exchange map-only projection
    as ``hashed_margin``; each eval doc then explodes against the
    THRESHOLD literal array (|thresholds|× expansion of the EVAL slice
    only — never a crossJoin, and eval is the small side by
    construction) into one |thresholds|-key aggregate with map-side
    partials. Evaluating 10^9 held-out docs at 9 operating points is
    one scan + one 9-row shuffle.

    ``weights=None`` keeps the deterministic stand-in model (integer
    margins — the driver-oracle path); pass
    ``train_hashed_logreg(...)`` output to evaluate the trained model
    (same plan, double margins). precision/recall are single IEEE
    divisions of exact integer counts (NULL when the denominator is 0,
    identically in both engines).
    """
    if eval_pred is None:
        eval_pred = F.col(id_col) % 5 == 0
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    m = _fold_margin(toks, weights)
    y = _label_col(label)
    per_doc = docs.where(eval_pred).select(m.alias("margin"), y.alias("y"))
    ex = per_doc.select(
        "margin",
        "y",
        F.explode(F.array(*[F.lit(int(t)) for t in thresholds])).alias(
            "threshold"
        ),
    )
    pred = F.col("margin") > F.col("threshold")

    def _n(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    agg = ex.groupBy("threshold").agg(
        _n(pred & F.col("y")).alias("tp"),
        _n(pred & ~F.col("y")).alias("fp"),
        _n(~pred & F.col("y")).alias("fn"),
        _n(~pred & ~F.col("y")).alias("tn"),
    )
    return agg.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
    )


def classifier_eval_sql(
    src: str = "documents",
    thresholds: tuple[int, ...] = EVAL_THRESHOLDS,
    label_sql: str = "lang = 'en'",
    eval_pred_sql: str = "doc_id % 5 = 0",
    text_col: str = "text",
) -> str:
    """DuckDB rendering of :func:`classifier_eval` (stand-in weights) —
    same integer margin fold as ``train_step_sql``, same explode-agg."""
    toks = TOKENS_SQL.format(x=f"COALESCE({text_col}, '')")
    bucket_t = f"({MD5_60_SQL.format(x='t')} % {N_BUCKETS})"
    weight_t = (
        MD5_60_SQL.format(x=f"'w:' || CAST({bucket_t} AS VARCHAR)")
        + f" % {_W_SPAN} - {_W_SHIFT}"
    )
    th_list = ", ".join(str(int(t)) for t in thresholds)
    return f"""
WITH ev AS (
  SELECT CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform({toks}, t -> {weight_t})), (a, b) -> a + b) AS BIGINT)
           AS margin,
         ({label_sql}) AS y
  FROM {src} WHERE {eval_pred_sql}
),
ex AS (SELECT margin, y, unnest([{th_list}]) AS threshold FROM ev),
agg AS (
  SELECT threshold,
         CAST(sum(CASE WHEN margin > threshold AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN margin > threshold AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN margin <= threshold AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN margin <= threshold AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM ex GROUP BY threshold
)
SELECT threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
FROM agg
"""
