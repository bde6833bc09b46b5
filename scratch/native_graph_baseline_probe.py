"""Measure the native graph-stage baselines (r5) at bench scale.

Builds the same near-chain table the bench uses (5 Mbp random genome,
k=31) and times contig_walk_baseline / bfs_components_baseline —
single-thread reference-style hash-probe loops.  These set the bar the
TPU graph stages must beat (VERDICT r4 missing #3).
"""
import ctypes
import time

import numpy as np

from metafast_tpu.native import load_library

K = 31
GENOME_LEN = 5_000_000

lib = load_library()
assert lib is not None

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
lengths = np.array([GENOME_LEN], dtype=np.int32)
keys = np.empty(GENOME_LEN, dtype=np.int64)
n = lib.extract_canonical(
    genome.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    1, K, keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    len(keys))
keys = np.unique(keys[:n].astype(np.uint64))
counts = np.full(len(keys), 2, dtype=np.int32)
print(f"table: {len(keys)} unique keys")

log2 = 24
for name in ("contig_walk", "bfs_components"):
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        if name == "contig_walk":
            a = ctypes.c_int64(0)
            b = ctypes.c_int64(0)
            r = lib.contig_walk_baseline(
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(keys), K, 0, log2, ctypes.byref(a), ctypes.byref(b))
            extra = f"n_seq={a.value} total_len={b.value} walked={r}"
        else:
            a = ctypes.c_int64(0)
            r = lib.bfs_components_baseline(
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(keys), K, log2, ctypes.byref(a))
            extra = f"n_comp={a.value} visited={r}"
        times.append(time.perf_counter() - t0)
    t = sorted(times)[1]
    print(f"{name}: {t:.2f}s median-of-3 = "
          f"{len(keys) / t / 1e6:.2f} M keys/s  ({extra})")
