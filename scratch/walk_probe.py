"""r5 probe: splitter-walk cost model on the real TPU.

n = 2^24 oriented nodes in one permuted path; walk starts at rate 1/B.
Measures: enc gather, inner while_loop walk rate (1 paired gather +
1 scatter per active walk per step), segment compaction.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from metafast_tpu.utils.device import force_sync

I32 = jnp.int32

rng = np.random.default_rng(2)
N = 1 << 24
B = 64

perm = rng.permutation(N).astype(np.int32)
succ = np.full(N, -1, dtype=np.int32)
succ[perm[:-1]] = perm[1:]

# walk starts: the head + hash-sampled splitters
is_start = np.zeros(N, bool)
is_start[perm[0]] = True
h = (np.arange(N, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
is_start |= (h & np.uint64(B - 1)) == 0
starts = np.nonzero(is_start)[0].astype(np.int32)
s = len(starts)
print(f"n={N} starts={s} (1/{N//s})")

# enc[v]: succ with stop bits. bit30: next is a start; terminal -> -1
START_BIT = np.int32(1 << 30)

d_succ = jax.device_put(jnp.asarray(succ))
d_isstart = jax.device_put(jnp.asarray(is_start))
force_sync(d_succ, d_isstart)


@jax.jit
def make_enc(succ, is_start):
    nxt = jnp.clip(succ, 0, succ.shape[0] - 1)
    stop = is_start[nxt] & (succ >= 0)
    return jnp.where(succ < 0, I32(-1),
                     jnp.where(stop, succ | START_BIT, succ))


t0 = time.perf_counter()
enc = make_enc(d_succ, d_isstart)
force_sync(enc)
t_enc_cold = time.perf_counter() - t0
t0 = time.perf_counter()
enc = make_enc(d_succ, d_isstart)
force_sync(enc)
print(f"enc: cold {t_enc_cold:.2f}s warm {time.perf_counter() - t0:.3f}s")


@partial(jax.jit, static_argnames=("rounds",))
def walk_segment(enc, cur, wid, t, done, walkid, rounds: int):
    """Walk up to `rounds` steps; exits early when all walks are done."""

    def cond(c):
        _, _, _, done, _, i = c
        return (~jnp.all(done)) & (i < rounds)

    def body(c):
        cur, wid, t, done, walkid, i = c
        g = enc[jnp.clip(cur, 0, enc.shape[0] - 1)]
        is_term = g < 0
        is_stop = (g & START_BIT) != 0
        nxt = g & ~START_BIT
        adv = ~done & ~is_term & ~is_stop
        ncur = jnp.where(adv, nxt, cur)
        walkid = walkid.at[jnp.where(adv, ncur, enc.shape[0])].set(
            wid, mode="drop")
        return (ncur, wid, t + adv.astype(I32), done | is_term | is_stop,
                walkid, i + 1)

    cur, wid, t, done, walkid, _ = jax.lax.while_loop(
        cond, body, (cur, wid, t, done, walkid, jnp.int32(0)))
    return cur, wid, t, done, walkid


d_starts = jax.device_put(jnp.asarray(starts))
walkid = jnp.full(N, -1, I32)
walkid = walkid.at[d_starts].set(jnp.arange(s, dtype=I32))
force_sync(walkid)

cur = d_starts
wid = jnp.arange(s, dtype=I32)
t = jnp.zeros(s, I32)
done = jnp.zeros(s, bool)

t0 = time.perf_counter()
seg_rounds = 2 * B
total_rounds = 0
while True:
    cur, wid, t, done, walkid = walk_segment(
        enc, cur, wid, t, done, walkid, seg_rounds)
    total_rounds += seg_rounds
    nd = int(jnp.sum(~done))
    el = time.perf_counter() - t0
    print(f"  width {cur.shape[0]:>8} after {total_rounds:>5} rounds: "
          f"{nd} active, {el:.2f}s", flush=True)
    if nd == 0:
        break
    # compact to pow2 >= nd
    order = jnp.argsort(done)          # not-done first
    w = 1 << max(6, int(np.ceil(np.log2(max(nd, 2)))))
    cur = cur[order][:w]
    wid = wid[order][:w]
    t = t[order][:w]
    done = done[order][:w]
t_walk = time.perf_counter() - t0
print(f"walk total: {t_walk:.2f}s = {N / t_walk / 1e6:.1f} M nodes/s")

# sanity: every node visited exactly once
wl = np.asarray(walkid)
print("unvisited:", int((wl < 0).sum()))
