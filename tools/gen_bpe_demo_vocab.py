"""Regenerate wde_spark/data/bpe_merges_demo.txt.

The demo vocabulary is trained deterministically on a fixed embedded
sample (no external artifact, no corpus dependence) — enough merges to
exercise multi-level subword composition in tests and examples. Real
deployments pass their own merges.txt to `token_stats(..., merges=...)`.

Usage: python tools/gen_bpe_demo_vocab.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from wde_spark.operators import bpe  # noqa: E402

# Fixed public-domain-style sample text; editing it changes the artifact,
# so treat it as frozen.
SAMPLE = """
the quick brown fox jumps over the lazy dog while the lazy dog sleeps
distributed query engines shuffle partition join aggregate broadcast
tokenization splits the text into subword units learned from frequency
spark catalyst optimizes the logical plan into a physical plan with
whole stage codegen and adaptive execution the executors exchange
partitions over the network and spill to disk when memory is bounded
deduplication similarity search embeddings quantiles sketches windows
streaming watermark state checkpoint lineage partition pruning pushdown
"""

NUM_MERGES = 200


def main() -> None:
    words = re.findall(bpe.PRETOKEN_RE, SAMPLE)
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    merges = bpe.train_bpe_merges(freqs, NUM_MERGES)
    bpe.save_merges(merges, bpe.DEMO_MERGES_PATH)
    print(f"wrote {len(merges)} merges to {bpe.DEMO_MERGES_PATH}")


if __name__ == "__main__":
    main()
