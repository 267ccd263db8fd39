"""Deterministic corpus sampling operators.

Two primitives the inline registry samplers (stratified / mixture /
train-val split in `queries_ext.py`) don't cover:

- `weighted_sample`: weighted sampling WITHOUT replacement
  (Efraimidis–Spirakis A-ES, "Weighted random sampling with a reservoir",
  IPL 2006): draw k items with inclusion probability proportional to a
  weight column — the primitive behind token-weighted corpus draws
  ("sample 1M documents proportional to token count"). The classic
  streaming form keeps a size-k heap of u^(1/w) keys; the distributed
  form is rank-by-key: key_i = ln(u_i)/w_i with u_i uniform, take the
  global top-k — a TakeOrdered (per-partition top-k + driver merge of
  k-row heads), never a full sort. u_i is md5-derived, so the draw is
  reproducible across engines, runs, and cluster sizes, and every key is
  ROUND()ed before ranking so the order is libm-independent (house rule,
  cf. tfidf_topk).

- `quantile_gate`: per-group relative filtering — keep the top
  num/den quantile of each group by a score column (the FineWeb /
  CCNet-head shape: "keep the most fluent quartile PER LANGUAGE", so
  high-resource languages don't eat low-resource ones' budget). The
  exact form ranks inside each group (one shuffle on the group key;
  partitions are group-sized); the quantile test is pure integer
  arithmetic (rn * den <= n * num), no float thresholds to disagree on.
  `quantile_gate_approx` is the 100 TB path: a per-group
  `percentile_approx` threshold (one agg, broadcast back, one scan) —
  no per-group sort at all; the exact form is its oracle.

Reference scope note: the reference pipeline (katabase/3_WikidataEnrichment)
has no sampling stage — these extend the engine's training-data surface
per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5 first-12-hex-chars value space: 16^12 buckets.
_U_DEN = float(16 ** 12) + 1.0


def es_key(id_col: str, weight_col: str, salt: str = "es",
           ndigits: int = 6):
    """The Efraimidis–Spirakis rank key ln(u)/w as a Column: u uniform in
    (0,1) from the first 12 md5 hex chars of the salted id (exact in a
    double: 16^12 < 2^53). Larger key (closer to 0) = more likely kept;
    E-S proves top-k by this key IS weighted sampling without
    replacement. Rounded so Spark and any SQL twin rank identically."""
    v = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))),
            1, 12),
        16, 10,
    ).cast("double")
    u = (v + F.lit(1.0)) / F.lit(_U_DEN)
    return F.round(F.log(u) / F.col(weight_col).cast("double"), ndigits)


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id", salt: str = "es") -> DataFrame:
    """Draw k rows with probability proportional to `weight_col`, without
    replacement, deterministically. Rows with weight <= 0 are excluded
    (E-S requires positive weights). Adds `es_key`; ties on the rounded
    key break by id, so the kept set is a total-order prefix.

    Scale shape: one row-local key computation + TakeOrderedAndProject —
    each task keeps its local top-k, the driver merges k-row heads; no
    global sort, no shuffle of the data itself."""
    keyed = (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("es_key", es_key(id_col, weight_col, salt))
    )
    return keyed.orderBy(F.col("es_key").desc(), F.col(id_col)).limit(k)


def quantile_gate(scored: DataFrame, score_col: str, group_col: str,
                  keep_num: int = 1, keep_den: int = 4,
                  id_col: str = "doc_id") -> DataFrame:
    """Keep the top keep_num/keep_den fraction of each group by score
    (score desc, id asc — rank the score ROUNDED upstream per house
    determinism rules). NULL scores never pass (ranked last, and the
    integer test already excludes them only if the group quota is hit —
    so they are filtered explicitly). Adds `grp_rank` and `grp_n`.

    The quantile test `rn * den <= n * num` is integer-exact: both
    engines agree on ceil/floor behavior without any float threshold.
    One shuffle on the group key; each window partition is one group."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col))
    ranked = (
        scored.filter(F.col(score_col).isNotNull())
        .withColumn("grp_rank", F.row_number().over(w))
        .withColumn("grp_n", F.count("*").over(Window.partitionBy(group_col)))
    )
    return ranked.filter(
        F.col("grp_rank") * keep_den <= F.col("grp_n") * keep_num)


def quantile_gate_approx(scored: DataFrame, score_col: str, group_col: str,
                         keep_frac: float = 0.25,
                         accuracy: int = 10000) -> DataFrame:
    """Scale path for `quantile_gate`: per-group approx threshold
    (Greenwald-Khanna via percentile_approx) broadcast back, then one
    filter scan — no per-group sort, so a 10-billion-doc language costs
    an agg + a scan. Admits slightly more/fewer rows than the exact gate
    near the threshold (bounded by the sketch accuracy); the exact form
    is the correctness oracle."""
    thr = (
        scored.filter(F.col(score_col).isNotNull())
        .groupBy(group_col)
        .agg(F.percentile_approx(
            F.col(score_col), F.lit(1.0 - keep_frac), F.lit(accuracy)
        ).alias("_thr"))
    )
    return (
        scored.join(F.broadcast(thr), group_col)
        .filter(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )


def _staged(docs: DataFrame, difficulty_col, n_stages: int,
            id_col: str, max_domain: int,
            keep_cols: tuple = ()) -> DataFrame | None:
    """Shared STAGING core of `curriculum_order` / `curriculum_pacing`
    (phases 1-2): the bounded-domain two-phase global (difficulty, id)
    rank followed by NTILE arithmetic. Returns a frame with
    (id, *keep_cols, stage) — or None for an empty input (callers map
    that to their own empty shape).

    Optimization (r12, guide §2.3/§5): the input is PROJECTED to
    (id, _dnull, _diff, *keep_cols) BEFORE anything runs, so no exchange
    ever carries the text payload (previously the full text column
    flowed through the staging window's exchange, and any token-count
    keep_col was re-tokenized per pass). The phase-1 offsets collect
    prunes keep_cols entirely (count-only), so an expensive keep_col is
    first evaluated when the caller materializes the returned frame —
    the public callers persist it, sharing one evaluation of the
    projection AND the phase-1 rank window across their second eager
    collect and the final execution."""
    spark = docs.sparkSession
    # The difficulty domain must be INTEGRAL: a float score in (0, 1)
    # — the common shape for model-scored difficulty — would truncate
    # to 0 under the long cast and silently collapse every stage into
    # tie-broken-by-id order. Fail loudly; the caller bucketizes
    # (e.g. floor(score * 1000)) and thereby also bounds the domain.
    dtype = docs.select(difficulty_col.alias("_d")).schema[0].dataType
    if dtype.typeName() in ("float", "double") or (
            dtype.typeName() == "decimal" and dtype.scale > 0):
        raise TypeError(
            f"curriculum_order needs an integral difficulty column, got "
            f"{dtype.simpleString()}: a fractional score would truncate "
            f"under the long cast — bucketize first, e.g. "
            f"floor(score * 1000).cast('long')"
        )
    # NULL difficulty sorts LAST (unknown = hardest), tracked by an
    # explicit flag so the offsets sort and the rejoin are both
    # null-safe — a NULL must neither crash the driver sort nor
    # silently drop the row
    dn = difficulty_col.cast("long")
    d = docs.select(
        F.col(id_col),
        dn.isNull().cast("int").alias("_dnull"),
        F.coalesce(dn, F.lit(0)).alias("_diff"),
        *[c if not isinstance(c, str) else F.col(c) for c in keep_cols],
    )
    # phase 1: exclusive offsets per difficulty value (bounded domain);
    # the same collect yields n_total — no separate count job. The
    # domain is capped: an unbounded domain (raw byte lengths over a
    # 100 TB corpus, say) must fail loudly here with coarsening
    # guidance. A plain collect + post-check beats .limit(cap+1): the
    # CollectLimit path costs an extra ~0.3 s per call (measured) on
    # every legitimate invocation, while the check differs only in the
    # pathological first-encounter case the error exists to teach.
    totals_rows = (d.groupBy("_dnull", "_diff")
                   .agg(F.count("*").alias("cnt")).collect())
    if len(totals_rows) > max_domain:
        raise ValueError(
            f"difficulty domain exceeds max_domain={max_domain} distinct "
            f"values — the per-value offset table would not fit the "
            f"driver; coarsen the difficulty column first (e.g. 64-byte "
            f"length buckets: floor(octet_length(text) / 64))"
        )
    totals = sorted((r["_dnull"], r["_diff"], r["cnt"])
                    for r in totals_rows)
    n_total = sum(c for _n, _v, c in totals)
    if n_total == 0:
        return None
    offs, acc = [], 0
    for nn, v, c in totals:
        offs.append((nn, v, acc))
        acc += c
    off_df = spark.createDataFrame(
        offs, "_dnull int, _diff long, _off long")
    w = (Window.partitionBy("_dnull", "_diff").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = (
        d.join(F.broadcast(off_df), ["_dnull", "_diff"])
        .withColumn("_rank", (F.col("_off") + F.count("*").over(w))
                    .cast("long"))
        .drop("_off")
    )
    # phase 2: NTILE arithmetic — first `rem` stages get q+1 rows
    q, rem = divmod(n_total, n_stages)
    big = rem * (q + 1)
    stage = F.when(
        F.col("_rank") <= big,
        F.ceil(F.col("_rank") / F.lit(q + 1))
    ).otherwise(
        F.lit(rem) + F.ceil((F.col("_rank") - big) / F.lit(max(q, 1))))
    return (ranked.withColumn("stage", stage.cast("int"))
            .drop("_rank", "_dnull", "_diff"))


def curriculum_order(docs: DataFrame, difficulty_col, n_stages: int = 3,
                     id_col: str = "doc_id",
                     salt: str = "cur",
                     max_domain: int = 200_000,
                     keep_cols: tuple | None = None) -> DataFrame:
    """Curriculum schedule: split the corpus into `n_stages` difficulty
    stages (exact NTILE terciles under (difficulty, id) order), shuffle
    WITHIN each stage (salted md5), and interleave the stages round-robin
    — training round r sees one doc from every stage, easy to hard, so
    the model never starves of either. Output adds `stage` (1-based) and
    `sched_pos` (the deterministic total order: (in-stage rank − 1) ·
    n_stages + stage − 1).

    `keep_cols` — which non-id input columns survive into the output
    (default None = all of them, the historical contract). Callers that
    only consume (id, stage, sched_pos) pass `()` so the persisted
    staging projection stays metadata-narrow and wide payload columns
    (document text!) never enter the staging cache or any exchange.

    Scale shape — NO global window anywhere:
      * the global (difficulty, id) rank is two-phase: per-difficulty
        counts to the driver (bounded by the difficulty domain; coarsen
        the column first if it is unbounded) → exclusive offsets
        broadcast back → window partitioned BY difficulty value;
      * NTILE is then pure arithmetic on that rank (group sizes
        ceil/floor of n/n_stages, exactly SQL NTILE's split);
      * the in-stage shuffle rank is the same two-phase primitive in
        ONE job for all stages, keyed by (stage, md5-prefix bucket);
      * the staging input is projected narrow up front (no payload
        column ever enters an exchange); `persist_staging=True` shares
        one evaluation of an expensive projection across the eager
        collects and the final execution (r12, guide §1.2/§2.3).
    """
    assert 2 <= n_stages <= 16
    spark = docs.sparkSession
    if keep_cols is None:
        keep_cols = tuple(c for c in docs.columns if c != id_col)
    staged = _staged(docs, difficulty_col, n_stages, id_col, max_domain,
                     keep_cols=keep_cols)
    if staged is not None:
        # one evaluation of (scan -> phase-1 rank -> stage) serves both
        # the phase-3 offsets collect and the final execution (r12)
        from pyspark import StorageLevel
        staged = staged.persist(StorageLevel.MEMORY_AND_DISK)
    if staged is None:  # empty input — historical empty shape
        return (docs.select(id_col, *keep_cols)
                .withColumn("stage", F.lit(0))
                .withColumn("sched_pos", F.lit(0).cast("long")))
    # phase 3: shuffle within each stage, interleave round-robin — ONE
    # job for all stages: the prefix-sum buckets are (stage, md5 prefix),
    # so the per-bucket totals collect is n_stages·256 rows and the only
    # window partitions by (stage, bucket)
    hx = F.md5(F.concat(F.lit(salt), F.col("stage").cast("string"),
                        F.lit("|"), F.col(id_col).cast("string")))
    keyed = (staged.withColumn("_hx", hx)
             .withColumn("_bkt", F.substring("_hx", 1, 2)))
    totals = sorted(
        (r["stage"], r["_bkt"], r["cnt"]) for r in
        keyed.groupBy("stage", "_bkt")
        .agg(F.count("*").alias("cnt")).collect())
    offs2, acc2, cur_stage = [], 0, None
    for s, bkt, c in totals:
        if s != cur_stage:
            cur_stage, acc2 = s, 0
        offs2.append((s, bkt, acc2))
        acc2 += c
    off2_df = spark.createDataFrame(
        offs2, "stage int, _bkt string, _soff long")
    w2 = (Window.partitionBy("stage", "_bkt").orderBy("_hx", id_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        keyed.join(F.broadcast(off2_df), ["stage", "_bkt"])
        .withColumn("_srk", (F.col("_soff") + F.count("*").over(w2))
                    .cast("long"))
        .withColumn(
            "sched_pos",
            ((F.col("_srk") - 1) * n_stages + F.col("stage") - 1)
            .cast("long"))
        .drop("_hx", "_bkt", "_soff", "_srk")
    )


def curriculum_pacing(docs: DataFrame, difficulty_col, tok_col,
                      quotas, n_stages: int = 3,
                      id_col: str = "doc_id", salt: str = "cur",
                      n_buckets: int = 256,
                      max_domain: int = 200_000,
                      extra_cols: tuple = ()) -> DataFrame:
    """Per-stage curriculum PACING: compose `curriculum_order`'s staging
    with `token_budget_mixture`'s token-budget admission — each stage's
    docs, taken in the curriculum's own in-stage salted order, fill
    training PHASES by cumulative token quota. Phase p of stage s gets
    the docs whose inclusive in-stage running token sum lands in
    (sum(quotas[s][:p-1]), sum(quotas[s][:p])]; docs beyond the total
    stage quota drop (budget semantics — a pacing schedule is a budget,
    not a partition). `quotas[s-1][p-1]` = token budget of phase p in
    stage s; an easy-heavy first row and hard-heavy last row is the
    classic curriculum ramp.

    Scale shape: staging is `curriculum_order`'s bounded-domain
    two-phase rank; the per-stage running TOKEN sum is the same
    two-phase prefix-sum primitive keyed by (stage, md5-prefix bucket)
    — the driver sees n_stages x n_buckets count rows, never the
    corpus, and no window partition exceeds ~stage/n_buckets rows.
    The oracle states the same admission with one plain
    SUM() OVER (PARTITION BY stage ORDER BY md5) window.

    Output: id, stage, n_tok, cum_tok (inclusive, in-stage), phase.
    """
    assert len(quotas) == n_stages and all(len(q) == len(quotas[0])
                                           for q in quotas)
    spark = docs.sparkSession
    # Staging WITHOUT the schedule rank (r12, guide §1.2): pacing never
    # consumes sched_pos, so the old path's phase-3 prefix-sum collect —
    # a full extra pass over the corpus — was computed and thrown away.
    # `_staged` also persists the narrow (id, diff, tok[, extra])
    # projection, so the token count is computed once and the text
    # column never reaches an exchange.
    tok_expr = (tok_col if not isinstance(tok_col, str)
                else F.col(tok_col)).cast("long").alias("_tok")
    staged = _staged(docs, difficulty_col, n_stages, id_col, max_domain,
                     keep_cols=(tok_expr,
                                *[F.col(c) for c in extra_cols]))
    if staged is not None:
        # one evaluation of (scan -> tokenize -> phase-1 rank -> stage)
        # serves both the token-offsets collect and the final execution
        from pyspark import StorageLevel
        staged = staged.persist(StorageLevel.MEMORY_AND_DISK)
    if staged is None:  # empty input — match the historical empty shape
        id_t = dict(docs.dtypes)[id_col]
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_t}, stage int, n_tok long, cum_tok long, "
                f"phase int" + "".join(
                    f", {c} {t}" for c, t in
                    (docs.select(*extra_cols).dtypes if extra_cols
                     else [])))
    # two-phase exclusive prefix sum of tokens per (stage, hash bucket),
    # under the SAME in-stage order the curriculum schedule uses
    plen = 1
    while 16 ** plen < n_buckets:
        plen += 1
    hx = F.md5(F.concat(F.lit(salt), F.col("stage").cast("string"),
                        F.lit("|"), F.col(id_col).cast("string")))
    keyed = (staged.withColumn("_hx", hx)
             .withColumn("_bkt", F.substring("_hx", 1, plen)))
    totals = sorted(
        (r["stage"], r["_bkt"], r["t"]) for r in
        keyed.groupBy("stage", "_bkt")
        .agg(F.sum("_tok").alias("t")).collect())
    offs, acc, cur_stage = [], 0, None
    for s, bkt, t in totals:
        if s != cur_stage:
            cur_stage, acc = s, 0
        offs.append((s, bkt, acc))
        acc += t
    off_df = spark.createDataFrame(
        offs, "stage int, _bkt string, _toff long")
    w = (Window.partitionBy("stage", "_bkt").orderBy("_hx", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (F.col("_toff") + F.sum("_tok").over(w)).cast("long")
    with_cum = (keyed.join(F.broadcast(off_df), ["stage", "_bkt"])
                .withColumn("cum_tok", cum))
    # phase = first cumulative boundary the running sum fits under
    n_phases = len(quotas[0])
    bounds = [[sum(q[:p + 1]) for p in range(n_phases)] for q in quotas]
    phase = F.lit(None).cast("int")
    for p in range(n_phases - 1, -1, -1):
        b = F.lit(bounds[0][p])
        for s in range(1, n_stages):
            b = F.when(F.col("stage") == s + 1,
                       F.lit(bounds[s][p])).otherwise(b)
        phase = F.when(F.col("cum_tok") <= b,
                       F.lit(p + 1)).otherwise(phase)
    return (with_cum.withColumn("phase", phase)
            .filter(F.col("phase").isNotNull())
            .select(id_col, "stage",
                    F.col("_tok").alias("n_tok"), "cum_tok", "phase",
                    *extra_cols))


def curriculum_order_approx(docs: DataFrame, difficulty_col,
                            n_stages: int = 3, id_col: str = "doc_id",
                            salt: str = "cur",
                            accuracy: int = 10000) -> DataFrame:
    """Scale path for `curriculum_order`'s STAGING: stage boundaries
    from one `percentile_approx` agg (Greenwald-Khanna sketch, O(1)
    driver rows) instead of the exact per-value offset table — the form
    for difficulty domains too wide even for bucketing. Stages may
    differ from exact NTILE near the quantile boundaries (bounded by
    the sketch accuracy); the exact form is the correctness oracle
    (`quantile_gate` / `quantile_gate_approx` pairing discipline).

    The in-stage shuffle + round-robin interleave are the same salted
    md5 schedule as the exact form, so downstream pacing composes
    unchanged. NULL difficulty = hardest (stage n_stages), matching the
    exact form's NULLs-last rule."""
    assert 2 <= n_stages <= 16
    dn = difficulty_col.cast("double")
    probs = [i / n_stages for i in range(1, n_stages)]
    cuts = docs.select(
        F.percentile_approx(dn, F.array(*[F.lit(p) for p in probs]),
                            F.lit(accuracy)).alias("c")).first()["c"]
    # Empty input or all-NULL difficulty: percentile_approx yields NULL
    # cuts. No finite boundaries exist, so every row falls through to
    # the hardest stage (the NULLs-last rule), and on a truly empty
    # frame the two-phase rank below degenerates to an empty result —
    # mirroring the exact form's n_total == 0 early return instead of
    # raising TypeError on float(None).
    stage = F.lit(n_stages)
    if cuts is not None:
        for i in range(n_stages - 2, -1, -1):
            stage = F.when(dn <= F.lit(float(cuts[i])),
                           F.lit(i + 1)).otherwise(stage)
    stage = F.when(dn.isNull(), F.lit(n_stages)).otherwise(stage)
    staged = docs.withColumn("stage", stage.cast("int"))
    # same two-phase in-stage shuffle rank as the exact form
    spark = docs.sparkSession
    hx = F.md5(F.concat(F.lit(salt), F.col("stage").cast("string"),
                        F.lit("|"), F.col(id_col).cast("string")))
    keyed = (staged.withColumn("_hx", hx)
             .withColumn("_bkt", F.substring("_hx", 1, 2)))
    totals = sorted(
        (r["stage"], r["_bkt"], r["cnt"]) for r in
        keyed.groupBy("stage", "_bkt")
        .agg(F.count("*").alias("cnt")).collect())
    offs, acc, cur_stage = [], 0, None
    for s, bkt, c in totals:
        if s != cur_stage:
            cur_stage, acc = s, 0
        offs.append((s, bkt, acc))
        acc += c
    off_df = spark.createDataFrame(
        offs, "stage int, _bkt string, _soff long")
    w = (Window.partitionBy("stage", "_bkt").orderBy("_hx", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        keyed.join(F.broadcast(off_df), ["stage", "_bkt"])
        .withColumn("_srk", (F.col("_soff") + F.count("*").over(w))
                    .cast("long"))
        .withColumn(
            "sched_pos",
            ((F.col("_srk") - 1) * n_stages + F.col("stage") - 1)
            .cast("long"))
        .drop("_hx", "_bkt", "_soff", "_srk")
    )
