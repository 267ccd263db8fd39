"""Regenerate PLANS.md: live executed-plan audit of representative queries.

Usage: python tools/gen_plans.py [sf_dir]

Each pick pairs a query with the scale property its plan must exhibit; the
same properties are pinned by tests/test_plan_hygiene.py. Plans are the
AQE-final executed plans (each query is collect()ed first).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PICKS = {
    "q1_pricing_summary": "TPC-H Q1: the scan must carry the pushed shipdate filter and prune to the 7 needed columns; one hash agg.",
    "q6_forecast_revenue": "Every predicate (date band, discount band, quantity cap) pushed to the parquet scan; 4 of 11 columns read.",
    "merge_changeset_orders": "MERGE: broadcast left join + union — ZERO hash-partition exchanges, so a 100 TB snapshot merges in one scan.",
    "asof_join_purchase_view": "As-of join as union+carry-forward: ONE exchange on the key, never a range-pair explosion.",
    "exact_dedup_documents": "Tier-1 dedup: exactly one exchange (the fingerprint groupBy).",
    "neardup_lsh_verified": "LSH near-dup: shingle table reused (InMemoryTableScan), candidates via band-hash equi-join, Jaccard only on candidates.",
    "lsh_ann_embeddings": "Multi-table ANN: signature equi-join + distinct candidate ids; payloads fetched back by id; no nested loop.",
    "session_events_bucketed": "Skew-proof sessionization: windows on (user, bucket); the cross-bucket stitch joins a per-bucket summary on the same key.",
    "chunk_documents_windows": "Context-window chunking: zero exchanges — pure scan-side array arithmetic + posexplode.",
    "topk_orders_salted": "Hot-key top-k: local rank within (key, salt), final rank over bounded survivors.",
    "pq_ann_embeddings": "PQ ANN: ADC scan scores codes via a JVM fold against the broadcast per-query LUTs (the declared bounded nested loop); exact re-rank touches only k*refine rows per query, fetched back by id.",
    "data_quality_orders": "Expectations: every row-local check plus uniqueness computes in ONE aggregation over one scan (Expand for the mixed distinct agg), exploded into per-check rows; the FK check is one broadcast anti-join on the pruned key column.",
    "semantic_dedup_embeddings": "Semantic dedup: banded multi-table LSH candidates (signature equi-join behind the windowed hot-bucket cap) carry (id, sig) rows only; vectors join back per-id for verification; min-id keep via left_anti.",
    "lm_quality_documents": "Bigram-LM scoring: training is two hash aggs over the exploded bigram table; scoring is a broadcast LM join + one per-doc agg — no Python anywhere.",
    "streaming_pq_adc_ann": "Maintained-index ANN: the query side is a pure codes-table scan (parquet, the COW version the stream last wrote) joined to broadcast per-query LUTs; ranking is a JVM fold over 16 array lookups per row — no float column is ever read on the query path.",
    "duplicate_spans_documents": "ExactSubstr spans: windows hashed once inside codegen after the position explode; duplicate detection is ONE aggregation on the window hash (a corpus-wide boilerplate window costs one counter, never a pair product); island merge is a per-doc window.",
    "dsir_sample_documents": "DSIR selection: one bigram explode feeds BOTH LM scorings via broadcast joins (the two one-row vocab sides are the declared bounded nested loops); ratio + Gumbel key are row-local; top-k is a window over the doc-sized score table.",
    "nb_classify_documents": "NB inference: tokens join only classes that observed them (one equi-join against the broadcast model); the docs-x-labels grid is the declared bounded L-row nested loop; argmax is a per-doc window.",
    "frame_runs_multimodal": "Frame-run detection: the Arrow frame-slicing kernel is the only Python stage; signatures and run fingerprints are codegen md5s; duplicate detection is ONE hash agg on the fingerprint (a shared intro costs one counter, never a self-join); islands merge in a per-media window.",
    "export_shards_documents": "Two-phase global ranking: the ONLY window partitions by the 256-way hash-prefix bucket (~n/256 rows each); the offsets side is a broadcast 256-row table; no single-partition exchange anywhere.",
    "token_budget_mixture_documents": "Token-budget mixture: one window per source (running sum in hash order) over the scan; the budget CASE is row-local — no joins, no Python.",
    "kmeans_clusters_embeddings": "Corpus clustering: assignment is the Arrow-vectorized argmin against the broadcast centroid matrix (row-local); the size rollup is one hash agg joined back broadcast.",
    "packed_sequences_documents": "Concat-and-chunk packing: stream offsets from the two-phase prefix sum (bucket-partitioned window + broadcast 256-row offsets); the window-overlap explode and slice arithmetic are pure codegen.",
    "packed_bpe_sequences_documents": "Tokenizing exporter: BPE-exact counts keep Python on the DISTINCT-pretoken table only (Heaps'-law sized Arrow stage); the corpus-axis joins are broadcast; packing reuses the two-phase prefix sum.",
    "quality_quota_sample_documents": "Quality-ranked quotas: LM scoring (broadcast model) joins the Arrow argmin cluster assignment; the ONLY window partitions by cluster — partitions are cluster-sized, never corpus-sized.",
    "doremi_mixture_documents": "DoReMi EG step: one corpus-sized ratio join, one per-domain agg; everything after (token-mass total, normalizer) is a broadcast ONE-ROW side — the declared bounded nested loops.",
    "pca_scores_embeddings": "Distributed PCA: projection is pure column arithmetic inside codegen (no explode, no Python, no joins) — the trainer's per-iteration aggs have the same shape, with only the 64-double iterate leaving the executors.",
    "substr_leakage_documents": "Substring leakage matrix: distinct (slice, window-hash) membership is corpus-STATE-sized; the equi-join fans out by slices-per-hash (<= L^2); the L-row slice-pair frame is the declared bounded nested loop.",
    "knn_label_propagation_embeddings": "kNN label propagation: the labeled SEED broadcasts (the declared bounded nested loop, transpose of cosine_topk); scoring is a row-local JVM fold over the streaming corpus; only the top-k window and vote rollup shuffle on the corpus id.",
    "pca_incremental_moments_embeddings": "Moment-state PCA: the Arrow kernel emits one bounded state row per partition (numpy X.T@X); the model derives from merged state on the driver; the projection is pure codegen column arithmetic over one pruned scan.",
    "q20_potential_promotion": "TPC-H q20 decorrelated: ONE lineitem scan (part semi-join broadcast below the pair aggregate, both date windows as conditional sums); the correlated 0.5-SUM threshold is a plain column filter; the qualifying-supplier set broadcasts for the semi-join.",
    "bloom_decontaminate_documents": "Bloom decontamination: the benchmark's BIT SET broadcasts (<=128 KB), the all-bits-present test is a broadcast equi-join + counting HAVING, and the benchmark-STRING join touches only surviving candidates.",
    "cluster_scorecard_embeddings": "Cluster scorecard: Arrow argmin assignment + broadcast LM/NB model joins compose per doc; ONE grouped aggregation keyed by the 16 k-means cells — output is model-sized.",
    "ccnet_perplexity_buckets_documents": "CCNet perplexity shards: broadcast-LM score join feeds ONE NTILE window partitioned by source — partitions are source-sized, never corpus-sized.",
    "doremi_schedule_documents": "DoReMi 3-step EG schedule: same one corpus join + per-domain agg as the single step; each unrolled iterate adds only a ONE-ROW normalizer broadcast over the domain-sized frame.",
    "streaming_bloom_admission_documents": "Maintained-set Bloom admission: the stored bit table (<= 2^20 rows) broadcasts; the corpus-side shingle explode joins it and folds to per-shingle counting HAVING — only (id, shingle) keys shuffle, never payloads; the maintained set itself is read from the COW version the stream last wrote.",
    "ffd_packed_documents": "FFD packing: zero-weight filter below ONE exchange on the salted-hash bucket key feeding the grouped Arrow fold (the declared per-bucket sequential stage); no global sort, no corpus-sized window.",
    "multimodal_thumbnails": "PNG thumbnail path: a pure Arrow-kernel chain (build -> decode/resample/re-encode -> verify-decode) over one scan — ZERO exchanges; codec work scales with bytes, never with joins.",
    "ccnet_source_scorecard_documents": "CCNet rollup: the buckets plan (broadcast-LM join + per-source NTILE) feeds ONE grouped aggregation keyed by source — output is sources x 10 cells whatever the corpus size.",
    "rendezvous_sharding_documents": "HRW sharding: both shard maps are pure row-local column expressions (one md5 per shard inside codegen, argmax by string max) feeding ONE 9-group hash agg — no join, no window, nothing but the scan shuffles.",
    "curriculum_order_documents": "Curriculum schedule: NO single-partition window — the tercile rank partitions by the bounded difficulty value (broadcast offsets), NTILE is row-local arithmetic, and each stage's shuffle rank partitions by the 256-way hash bucket (broadcast 256-row offsets); the 3 stage slices union.",
    "gif_animation_frames_documents": "Animated GIF decode: container synth and composite/fingerprint are two row-local Arrow kernels over one scan — ZERO exchanges; compositing cost scales with canvas bytes, never with joins.",
    "audio_adpcm_decoded_documents": "ADPCM decode: one Arrow kernel chain (block synth -> nibble state machine -> fingerprint) over one scan — zero exchanges; the sequential state is per-row, so parallelism is row-granular.",
    "jpeg420_restart_documents": "4:2:0 JPEG with restart intervals: one row-local Arrow kernel chain (encode -> full baseline decode -> RGBA fingerprint) over one scan — zero exchanges; restart segments are the unit that makes a single huge JPEG parallel-decodable at 100 TB.",
    "streaming_shard_migration_documents": "Maintained HRW routing: the latest COW version is ONE parquet scan of the doc-sized routing table; each maintenance step was a row-local argmax rewrite + append — the corpus never shuffles, and the per-step moved set is the minimal migration workload.",
    "streaming_curriculum_documents": "Maintained curriculum: the query side is ONE scan of the text-free COW ledger (doc_id, bucket, arrived_batch) — document bytes were read once, at arrival; staging on top is the same bounded-domain two-phase rank as the one-shot form.",
    "curriculum_pacing_documents": "Curriculum pacing: staging's bounded-domain rank + ONE (stage, 256-bucket)-partitioned token prefix-sum window with broadcast offsets; phase assignment is a row-local CASE — no corpus-sized window, no join wider than 768 broadcast rows.",
    "streaming_token_budget_documents": "Maintained budget admission: the query side is ONE scan of the admitted-ledger COW version; each maintenance step was one batch-sized window plus a broadcast join against the sources x 1 spent table — the corpus is never rescanned.",
    "tiff_packbits_documents": "TIFF PackBits decode: container synth and the per-row RLE walk are row-local Arrow kernels over one scan — ZERO exchanges; codec work scales with bytes, never with joins.",
    "jpeg420_segment_parallel_documents": "Segment-parallel JPEG: split and per-segment decode are row-local kernels (the parallel grain is the SEGMENT, so one huge file fans out); reassembly is the pipeline's ONE shuffle, keyed by media_id.",
    "streaming_curriculum_pacing_documents": "Maintained pacing: ONE scan of the text-free ledger (buckets + arrival-time token counts); staging and the token prefix sums are the same bounded two-phase primitives as the one-shot form.",
    "codebook_compaction_embeddings": "Delta-ledger codebook after compaction: the merge-on-read collapses to ONE plain parquet scan of the folded base (no LWW window, no union) — the read amplification compaction exists to buy back; each maintenance step was an O(batch) delta append, never a full-state rewrite.",
    "dedup_admission_compaction_documents": "Delta-ledger dedup admission after compaction: the corpus-sized table the COW form rewrote per batch is now ONE folded base scan; each maintenance step appended only admitted upserts + revoked tombstones (corpus, fingerprints, and enumerable band keys alike).",
    "pq_codes_compaction_ann": "Delta-ledger PQ index after compaction: the ADC scan reads the folded codes base (one FileScan) joined to broadcast per-query LUTs; each maintenance step was a pure O(batch) code append with NO ledger read — per-batch cost independent of index size.",
    "ledger_clustered_range_documents": "Range read over a range-clustered folded ledger: entry-level stats pruning picks the one live base, then ONE FileScan with the range filter PUSHED to parquet — the clustered layout's footer min/max skips the out-of-range files/row groups (receipt: stress_cluster_layout_r12.json).",
}

HEADER = """# PLANS — physical-plan audit of representative queries

Generated from live `.explain` output (`python tools/gen_plans.py`, this
file) at sf0.01 on the current tree. For each query: why this plan is the
one a 1000-executor / 100 TB run wants, then the executed plan. The
properties called out here are pinned by `tests/test_plan_hygiene.py` so
they cannot silently regress.
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from wde_spark.core.session import get_session
    from wde_spark.queries import QUERIES

    spark = get_session("plans", cpus=16)
    out = [HEADER]
    for name, why in PICKS.items():
        df = QUERIES[name](spark, sf_dir)
        df.collect()  # let AQE finalize the plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        if len(lines) > 60:
            lines = lines[:60] + [f"... ({len(plan.splitlines()) - 60} more lines)"]
        out.append(f"## {name}\n\n{why}\n\n```\n" + "\n".join(lines) + "\n```\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
