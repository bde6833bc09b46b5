"""r5 probe: compact 3-stream counting vs the overlapping-column stream.

Bench workload (667k x 150bp reads, ~80.1M k-mers), device-only timing.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from metafast_tpu.ops.count import KmerCounter
from metafast_tpu.ops.stream_extract import (build_stream, build_stream3,
                                             stream3_extract, stream_extract)
from metafast_tpu.utils.device import force_sync

K = 31
N_READS = 667_000
L = 150

rng = np.random.default_rng(0)
# genome-derived reads so uniques/dupes look like the bench
genome = np.frombuffer(
    np.random.default_rng(0).integers(0, 4, 5_000_000, dtype=np.uint8)
    .tobytes(), dtype=np.uint8).copy()
starts = rng.integers(0, len(genome) - L, N_READS)
codes = genome[starts[:, None] + np.arange(L)[None, :]].reshape(-1)
lengths = np.full(N_READS, L, np.int32)
n_kmers = N_READS * (L - K + 1)

t0 = time.perf_counter()
w, v, _ = build_stream(codes, lengths, K)
t_build_old = time.perf_counter() - t0
t0 = time.perf_counter()
w0, w1, w2, vm, _ = build_stream3(codes, lengths, K)
t_build_new = time.perf_counter() - t0
print(f"host build: old {t_build_old:.2f}s ({(w.nbytes + v.nbytes)/1e6:.0f} MB) "
      f"new {t_build_new:.2f}s ({(w0.nbytes*3 + vm.nbytes)/1e6:.0f} MB)",
      flush=True)
print(f"slots: old {w.size * 16} new {w0.size * 16} "
      f"({w0.size * 16 / n_kmers:.3f} slots/kmer)", flush=True)

dw, dv = jax.device_put(w), jax.device_put(v)
d0, d1, d2, dm = [jax.device_put(x) for x in (w0, w1, w2, vm)]
force_sync(dw, dv, d0, d1, d2, dm)

# extraction kernels
def ext_old():
    force_sync(*stream_extract(dw, dv, K))

def ext_new():
    force_sync(*stream3_extract(d0, d1, d2, dm, K))

for name, f in [("extract old", ext_old), ("extract new", ext_new)]:
    f()
    ts = sorted(time.perf_counter() - t0
                for t0 in [time.perf_counter()] if f() is None) or []
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {sorted(ts)[1]*1e3:.0f} ms", flush=True)

# full device-only counting
def count_old():
    c = KmerCounter(K)
    c.add_stream_device(dw, dv, lengths)
    force_sync(*c.finish_device())

def count_new():
    c = KmerCounter(K)
    c.add_stream3_device(d0, d1, d2, dm, lengths)
    force_sync(*c.finish_device())

for name, f in [("count old", count_old), ("count new", count_new)]:
    f()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[1]
    print(f"{name}: {t*1e3:.0f} ms = {n_kmers/t/1e6:.1f} M kmers/s",
          flush=True)

# equality
ca = KmerCounter(K)
ca.add_stream_device(dw, dv, lengths)
ka, va = ca.finish()
cb = KmerCounter(K)
cb.add_stream3_device(d0, d1, d2, dm, lengths)
kb, vb = cb.finish()
print("EQ:", np.array_equal(ka, kb) and np.array_equal(va, vb))
