"""Benchmark: canonical k-mer counting throughput on the default backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured op is the reference's hot loop — rolling canonical k-mer
extraction + counting (src/io/IOUtils.java:756-769) — as the TPU-native
batched extract -> sort -> RLE pipeline.  vs_baseline compares against a
single-thread Java-equivalent rate estimate of ~10M k-mers/s (the
reference publishes no numbers; BASELINE.md "published: {}").
"""

import json
import sys
import time

import numpy as np

JAVA_EQUIV_KMERS_PER_S = 10e6  # reference-class per-core rate (no published figure)


def main():
    import jax

    from metafast_tpu.ops.count import count_batch

    k = 31
    B, L = 4096, 160                       # ~532K k-mers per batch
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    lengths = np.full(B, L, dtype=np.int32)
    n_kmers = B * (L - k + 1)

    codes_d = jax.device_put(codes)
    lengths_d = jax.device_put(lengths)

    # compile + warm up
    out = jax.block_until_ready(count_batch(codes_d, lengths_d, k))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = count_batch(codes_d, lengths_d, k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rate = n_kmers * iters / dt
    print(json.dumps({
        "metric": "kmer_count_throughput",
        "value": round(rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(rate / JAVA_EQUIV_KMERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
