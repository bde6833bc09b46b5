"""Benchmark: end-to-end canonical k-mer counting throughput.

Measures the PRODUCTION path — host parse (native C++ when available)
-> 2-bit packed device batches -> device extract+sort+RLE count with
on-device binary-counter merging — on a deterministic synthetic sample:
reads drawn from a 5 Mbp genome at ~20x coverage, the realistic
unique/total profile of a metagenomic sample (a uniform-random read set
would make every k-mer unique, which no assembler-grade workload does).

This is what the reference's kmer-counter hot loop does
(src/io/IOUtils.java:742-803).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against a Java-toolkit-class single-process rate of
~10M k-mers/s (the reference publishes no numbers; BASELINE.md
"published: {}").
"""

import json
import os
import tempfile
import time

import numpy as np

JAVA_EQUIV_KMERS_PER_S = 10e6
K = 31
GENOME_LEN = 5_000_000
READ_LEN = 150
COVERAGE = 20
N_READS = GENOME_LEN * COVERAGE // READ_LEN    # ~667K reads, ~80M kmers


def make_fasta(path: str) -> int:
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, GENOME_LEN)]
    starts = rng.integers(0, GENOME_LEN - READ_LEN, N_READS)
    idx = starts[:, None] + np.arange(READ_LEN)[None, :]
    reads = genome[idx]
    with open(path, "wb") as fh:
        for i in range(N_READS):
            fh.write(b">r%d\n" % i)
            fh.write(reads[i].tobytes())
            fh.write(b"\n")
    return N_READS * (READ_LEN - K + 1)


def main():
    from metafast_tpu import api

    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "bench.fasta")
        n_kmers = make_fasta(fasta)

        # warm-up: compile (and persist) the kernel signatures
        api.count_reads_files([fasta], K)

        # median of 3: the tunneled device link's bandwidth swings
        # run-to-run by ~30%, which would otherwise dominate the signal
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            keys, counts, stats = api.count_reads_files([fasta], K)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]

    rate = n_kmers / dt
    print(json.dumps({
        "metric": "end_to_end_kmer_count_throughput",
        "value": round(rate, 1),
        "unit": "kmers/s",
        "vs_baseline": round(rate / JAVA_EQUIV_KMERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
