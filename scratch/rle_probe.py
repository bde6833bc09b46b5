"""r5 probe: per-piece cost of the hosted RLE at 2^27 (real TPU).

Identifies where the 89ms (r4) of post-sort work goes: mask+rowsort,
optimistic slice sort, counts pass.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from metafast_tpu.ops import count as oc
from metafast_tpu.utils.device import force_sync

N = 1 << 27
UNI = 5_000_000
rng = np.random.default_rng(0)
# synthetic sorted chunk with ~UNI uniques and 21% sentinel padding,
# mimicking the bench slab profile
keys = np.sort(rng.integers(0, 1 << 62, UNI).astype(np.uint64))
reps = rng.poisson(16, UNI) + 1
idx = np.repeat(np.arange(UNI), reps)[: int(N * 0.79)]
vals = keys[idx]
pad = N - len(vals)
hi = np.concatenate([(vals >> np.uint64(32)).astype(np.uint32),
                     np.full(pad, 0xFFFFFFFF, np.uint32)])
lo = np.concatenate([(vals & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                     np.full(pad, 0xFFFFFFFF, np.uint32)])
dhi = jax.device_put(jnp.asarray(hi))
dlo = jax.device_put(jnp.asarray(lo))
force_sync(dhi, dlo)
print(f"slots {N} live {len(vals)} uniques ~{UNI}")


def timed(name, f, reps=3):
    f()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name}: {t * 1e3:.1f} ms")
    return t


shi, slo = oc._sort_pair(dhi, dlo)
force_sync(shi, slo)

timed("sort_pair", lambda: force_sync(*oc._sort_pair(dhi, dlo)))
timed("starts_rowsorted",
      lambda: force_sync(*oc._starts_rowsorted(shi, slo)))
t1, t2, t3, stats_dev = oc._starts_rowsorted(shi, slo)
force_sync(t1, t2, t3, stats_dev)
timed("slice+opt_sort", lambda: force_sync(*oc._sort_starts(
    *oc._slice_flatten(t1, t2, t3, oc._OPT_COLS))))
opt = oc._sort_starts(*oc._slice_flatten(t1, t2, t3, oc._OPT_COLS))
force_sync(*opt)
stats = np.asarray(stats_dev)
m = oc._pow2(int(stats[0]))
print("n_uni", int(stats[0]), "maxl", int(stats[2]), "m", m)
timed("counts_from_sorted",
      lambda: force_sync(*oc._counts_from_sorted_starts(
          *opt, stats_dev, m)))
timed("count_flat_hosted e2e",
      lambda: force_sync(*oc.count_flat_hosted(dhi, dlo)))
