"""r5 probe: single-device star contraction vs hooking at 2^23 (real TPU).

Worst-case permuted path graph — same regime as the bench genome table.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from metafast_tpu.graph import components as C
from metafast_tpu.utils.device import force_sync

rng = np.random.default_rng(1)
LOG2 = 23
M = 1 << LOG2
perm = rng.permutation(M).astype(np.int32)
nbr = np.full((8, M), -1, dtype=np.int32)
u, v = perm[:-1], perm[1:]
nbr[0, u] = v
nbr[4, v] = u
active = np.ones(M, bool)

dn = jax.device_put(jnp.asarray(nbr))
da = jax.device_put(jnp.asarray(active))
force_sync(dn, da)

print("== star ==", flush=True)
t0 = time.perf_counter()
star = C.star_connected_labels(dn, da)
t1 = time.perf_counter()
print(f"star cold: {t1 - t0:.2f}s", flush=True)
for _ in range(2):
    t0 = time.perf_counter()
    star = C.star_connected_labels(dn, da)
    print(f"star warm: {time.perf_counter() - t0:.2f}s", flush=True)
assert (star == 0).all()

print("== hooking ==", flush=True)
t0 = time.perf_counter()
hook = C.hooking_connected_labels(dn, da)
t1 = time.perf_counter()
print(f"hook cold: {t1 - t0:.2f}s", flush=True)
t0 = time.perf_counter()
hook = C.hooking_connected_labels(dn, da)
print(f"hook warm: {time.perf_counter() - t0:.2f}s", flush=True)
assert np.array_equal(hook, star)
print("EQ")
