"""Isolate the while_loop round cost: gather-only vs +scatter vs scatter size."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from metafast_tpu.utils.device import force_sync

I32 = jnp.int32
N = 1 << 24
S = 1 << 18
R = 64

rng = np.random.default_rng(0)
enc = jax.device_put(jnp.asarray(rng.integers(0, N, N).astype(np.int32)))
cur0 = jax.device_put(jnp.asarray(rng.integers(0, N, S).astype(np.int32)))
big = jnp.zeros(N, I32)
force_sync(enc, cur0, big)


@jax.jit
def gather_only(enc, cur):
    def body(i, c):
        return enc[c]
    return jax.lax.fori_loop(0, R, body, cur)


@jax.jit
def gather_scatter(enc, cur, out):
    def body(i, c):
        cur, out = c
        nxt = enc[cur]
        out = out.at[nxt].set(i, mode="drop")
        return nxt, out
    return jax.lax.fori_loop(0, R, body, (cur, out))


@jax.jit
def scatter_small(cur, out):
    # scatter into an S-sized array instead of N-sized
    def body(i, c):
        cur, out = c
        out = out.at[cur & (S - 1)].set(i, mode="drop")
        return cur + 1, out
    return jax.lax.fori_loop(0, R, body, (cur, out))


for name, fn, args in [
    ("gather_only", gather_only, (enc, cur0)),
    ("gather_scatter_bigout", gather_scatter, (enc, cur0, big)),
    ("scatter_small", scatter_small, (cur0, jnp.zeros(S, I32))),
]:
    r = fn(*args)
    force_sync(*(r if isinstance(r, tuple) else (r,)))
    t0 = time.perf_counter()
    r = fn(*args)
    force_sync(*(r if isinstance(r, tuple) else (r,)))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f}s = {dt / R * 1e3:.2f} ms/round "
          f"({S * R / dt / 1e6:.1f} M ops/s)")
