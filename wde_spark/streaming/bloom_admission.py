"""Streaming Bloom-set maintenance + decontamination admission gate.

The one-shot form (`operators/curation.decontaminate_bloom`) builds the
benchmark's Bloom BIT SET in the same job that scans the corpus. At 100 TB
the benchmark/blocklist is itself a feed — eval sets are added over time —
so the bit set must be MAINTAINED: each micro-batch of benchmark documents
contributes its shingles' bit positions, merged into a stored bit table.

The Bloom bit set is a mergeable sketch in the same sense as the HLL
registers (`streaming/sketch_maintenance.py`): the filter of a union is
the bitwise OR of the filters, and in the relational encoding (one row per
SET bit) that OR is `UNION ... DISTINCT` — associative, commutative, and
IDEMPOTENT. Idempotence buys stronger replay safety than the counter
sketches get for free: re-merging an already-applied batch after a
foreachBatch replay changes NOTHING (x OR x = x), so the copy-on-write
version ledger here is belt-and-braces rather than load-bearing.

Equivalence contract (pinned in `tests/test_streaming_bloom.py`): the
maintained set after N micro-batches is row-identical to the one-shot set
over the union of the batches, and admission against the maintained set is
row-identical to `decontaminate_bloom`'s candidate stage — proven under
the driver hash by `streaming_bloom_admission_documents`, whose DuckDB
oracle replays the one-shot filter bit-for-bit.

Admission semantics: a document is ADMITTED iff none of its shingles
passes the full n_seeds-bit membership test. Bloom false positives can
only over-reject (quarantine a clean doc for exact re-check downstream),
never under-reject — the safe direction for decontamination.

Same COW version-directory layout as `streaming/cdc.py`: deterministic
content + fixed version name per batch_id → idempotent under
foreachBatch's at-least-once replay.

At 100 TB: the stored state is ≤ min(n_seeds·|benchmark shingles|, m_bits)
bigint rows (≤ m_bits rows ~ 8 MB at 2^20 regardless of benchmark growth);
each micro-batch merge shuffles only that state; the corpus-side admission
is one broadcast join of the bit table — the corpus never shuffles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.curation import bloom_bit
from ..operators.dedup import distinct_shingle_table
from .cdc import latest_version_dir

M_BITS_DEFAULT = 1 << 20
N_SEEDS_DEFAULT = 4


def batch_bloom_bits(benchmark: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", shingle_k: int = 3,
                     m_bits: int = M_BITS_DEFAULT,
                     n_seeds: int = N_SEEDS_DEFAULT) -> DataFrame:
    """One benchmark slice's Bloom contribution: the DISTINCT `bit`
    positions its k-token shingles set. Output is the relational bit-set
    encoding shared with `decontaminate_bloom` — mergeable across slices
    by UNION DISTINCT."""
    sh = (
        distinct_shingle_table(benchmark, text_col, id_col, shingle_k)
        .select("sh").distinct()
    )
    return sh.select(
        F.explode(F.array(*[bloom_bit(F.col("sh"), i, m_bits)
                            for i in range(n_seeds)])).alias("bit")
    ).distinct()


def streaming_bloom_maintain(
    bench_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    m_bits: int = M_BITS_DEFAULT,
    n_seeds: int = N_SEEDS_DEFAULT,
) -> None:
    """Run the benchmark stream to completion (availableNow — static test
    input), maintaining the Bloom bit-set table under `target_dir` as COW
    versions. Merge = UNION DISTINCT of bit rows (the relational bitwise
    OR), so replayed batches are no-ops by idempotence."""
    os.makedirs(target_dir, exist_ok=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fresh = batch_bloom_bits(batch, text_col, id_col, shingle_k,
                                 m_bits, n_seeds)
        try:
            cur = spark.read.parquet(latest_version_dir(target_dir))
            merged = cur.unionByName(fresh).distinct()
        except FileNotFoundError:
            merged = fresh
        out = os.path.join(target_dir, f"v{batch_id + 1}")
        merged.write.mode("overwrite").parquet(out)

    q = (
        bench_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()


def read_bloom_bits(spark, target_dir: str) -> DataFrame:
    """The maintained bit set's latest version — one `bit` column."""
    return spark.read.parquet(latest_version_dir(target_dir))


def bloom_admission(docs: DataFrame, bits: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    shingle_k: int = 3, m_bits: int = M_BITS_DEFAULT,
                    n_seeds: int = N_SEEDS_DEFAULT) -> DataFrame:
    """(id, n_bloom_candidates, admitted) against a maintained bit set:
    a shingle is a candidate iff ALL n_seeds of its positions are present
    (the counting-HAVING form of the all-bits test, exactly
    `decontaminate_bloom`'s prefilter); a document is admitted iff it has
    zero candidates. The bit table broadcasts (≤ m_bits rows); the corpus
    never shuffles payloads, only (id, shingle) keys into the per-shingle
    count."""
    doc_sh = distinct_shingle_table(docs, text_col, id_col, shingle_k)
    sh_bits = doc_sh.select(
        id_col, "sh",
        F.posexplode(F.array(*[bloom_bit(F.col("sh"), i, m_bits)
                               for i in range(n_seeds)])).alias("i", "bit"),
    )
    cand = (
        sh_bits.join(F.broadcast(bits.select("bit")), "bit")
        .groupBy(id_col, "sh")
        .agg(F.countDistinct("i").alias("_nb"))
        .filter(F.col("_nb") == n_seeds)
    )
    counts = cand.groupBy(id_col).agg(
        F.count("*").alias("n_bloom_candidates"))
    return (
        docs.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bloom_candidates", F.lit(0))
            .alias("n_bloom_candidates"),
            (F.coalesce("n_bloom_candidates", F.lit(0)) == 0)
            .alias("admitted"),
        )
    )
