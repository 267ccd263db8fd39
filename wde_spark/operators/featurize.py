"""Model-free text featurization: the hashing trick + sparse cosine join.

`hashed_tf` maps documents to fixed-dimension signed term-frequency
vectors with ZERO vocabulary state (Weinberger et al., "Feature Hashing
for Large Scale Multitask Learning", ICML 2009): bucket = hash(term) mod
D, sign = parity bit of an independent hash — the unbiased estimator
variant. No fitted vocabulary means no driver-side dictionary, no OOV
handling, and byte-identical features on any cluster size — the
featurizer a 100 TB corpus pipeline can actually run before any model
exists (dedup candidate generation, cheap clustering, drift detection).

`sparse_cosine_pairs` is the classic inverted-index similarity join over
those vectors: group features by bucket (the posting list), join within
buckets, sum integer component products. Dot products and squared norms
are exact BIGINT sums of signed counts — only the final
`dot / (sqrt(ssq_a) * sqrt(ssq_b))` touches floating point (one sqrt +
one divide, then ROUND), so Spark and any SQL twin agree bit-for-bit.

Scale shape: the join cost is sum over buckets of |posting list|² — with
D chosen >> mean document vocabulary the lists are token-sparse, and
`max_df` prunes hot buckets (features present in more than max_df docs
carry ~zero IDF anyway) BEFORE norms are taken, the standard
prefix-filtering guard that keeps the join from going quadratic on
stopword-like features. Same discipline as `dedup.minhash_lsh_pairs`'
max_bucket cap (the r5 verdict's hot-bucket rule).

Hash convention: md5 hex nibbles, as everywhere else in the engine —
first 3 nibbles (4096-value space) mod D for the bucket, 4th nibble
parity for the sign; engine-portable and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.strings import tokens


def hashed_tf(docs: DataFrame, n_buckets: int = 64,
              text_col: str = "text", id_col: str = "doc_id",
              max_df: int | None = None) -> DataFrame:
    """Signed hashed-TF vectors in sparse long form: one row per
    (id, bucket) with a non-zero component. `val` is the exact signed
    count (BIGINT); `wt` is the L2-normalized component rounded to 6
    (for consumers that want unit vectors). Components that cancel to
    exactly 0 are dropped (they carry no mass); documents whose whole
    vector cancels drop out.

    With `max_df`, buckets hit by more than max_df DOCUMENTS are pruned
    corpus-wide before normalization — pruning first keeps the output an
    exact unit vector of the pruned feature space.

    One explode + two hash aggregations (id,bucket then id); row-local
    otherwise, no UDFs."""
    tok = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t"))
        .filter(F.col("t") != "")
    )
    h = F.md5(F.col("t"))
    bucket = (F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
              % F.lit(n_buckets))
    sign = F.when(F.conv(F.substring(h, 4, 1), 16, 10).cast("int") % 2 == 0,
                  F.lit(1)).otherwise(F.lit(-1))
    comp = (
        tok.select(F.col(id_col), bucket.alias("bucket"), sign.alias("s"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("s").cast("long").alias("val"))
        .filter(F.col("val") != 0)
    )
    if max_df is not None:
        hot = (
            comp.groupBy("bucket").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df).select("bucket")
        )
        comp = comp.join(F.broadcast(hot), "bucket", "left_anti")
    ssq = comp.groupBy(id_col).agg(
        F.sum(F.col("val") * F.col("val")).cast("long").alias("ssq"))
    return (
        comp.join(ssq, id_col)
        .select(
            id_col, "bucket", "val",
            F.round(F.col("val") / F.sqrt(F.col("ssq").cast("double")), 6)
            .alias("wt"),
        )
    )


def sparse_cosine_pairs(feats: DataFrame, top_k: int = 3,
                        id_col: str = "doc_id") -> DataFrame:
    """Top-k nearest neighbors per document by exact cosine over sparse
    hashed-TF vectors (`feats` = hashed_tf output incl. `val`): posting
    lists join on `bucket`, the dot product is an exact BIGINT sum of
    val_a*val_b, and cosine = dot / (||a||·||b||) rounded to 6 with an
    id tiebreak — a deterministic total order, so the kept neighbor set
    is engine-portable.

    Scale: cost = Σ_bucket |postings|² (pre-prune hot buckets via
    hashed_tf(max_df=...)); the per-doc top-k is a window over each
    doc's candidate list, never the corpus."""
    ssq = (
        feats.select(id_col, "val").groupBy(id_col)
        .agg(F.sum(F.col("val") * F.col("val")).cast("long").alias("ssq"))
    )
    a = feats.select(F.col(id_col).alias("id_a"), "bucket",
                     F.col("val").alias("va"))
    b = feats.select(F.col(id_col).alias("id_b"), "bucket",
                     F.col("val").alias("vb"))
    dots = (
        a.join(b, "bucket")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).cast("long").alias("dot"))
    )
    sa = ssq.select(F.col(id_col).alias("id_a"), F.col("ssq").alias("ssq_a"))
    sb = ssq.select(F.col(id_col).alias("id_b"), F.col("ssq").alias("ssq_b"))
    scored = (
        dots.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("ssq_a").cast("double"))
                   * F.sqrt(F.col("ssq_b").cast("double"))),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("cos_sim").desc(), F.col("id_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("id_a", "id_b", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )
