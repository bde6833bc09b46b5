"""Multi-chip k-mer counting: hash-shard the key space, all-to-all merge.

The reference scales k-mer counting inside one JVM by striping its hash
table by murmur3(key) (itmo BigLong2ShortHashMap.java:40-70,
src/io/IOUtils.java:775-776).  The TPU-native equivalent spreads the same
idea over a device mesh:

  1. read batches are sharded over the mesh axis (data parallel),
  2. each device extracts canonical k-mers locally and buckets them by
     hash(key) mod n_shards,
  3. one all-to-all over ICI re-shards the buckets so device s receives
     every k-mer whose hash maps to shard s,
  4. each device sort+RLE-counts its shard locally.

Identical keys always hash to the same shard, so per-shard tables are
complete and globally disjoint: no cross-device reduction is needed after
the all-to-all, and saturating adds stay order-independent.

All shapes are static: per-shard send buckets have a fixed capacity and
overflow k-mers are dropped (counted and reported so callers can re-run
with a bigger capacity; with the mixing hash below, a 2x headroom over
the uniform share makes drops vanishingly unlikely).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import bitpack as bp
from ..core.extract import extract_canonical
from ..ops.count import count_flat

U32 = jnp.uint32
AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def hash_shard(hi: jnp.ndarray, lo: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Uniform shard id from a key; plays the role of the reference's
    murmurHash3 stripe selector (itmo HashFunctions — we need mixing, not
    that exact function, since shard layout is invisible in outputs)."""
    h = hi * U32(0x85EBCA6B) ^ lo * U32(0xC2B2AE35)
    h ^= h >> 15
    h = h * U32(0x27D4EB2F)
    h ^= h >> 13
    return (h % U32(n_shards)).astype(jnp.int32)


def _bucket_local(hi, lo, n_shards: int, cap: int):
    """Scatter a device's k-mers into [n_shards, cap] send buckets.

    Returns (buf_hi, buf_lo, n_dropped).  Invalid (sentinel) k-mers are
    routed to a virtual overflow slot and never stored.
    """
    flat_hi = hi.reshape(-1)
    flat_lo = lo.reshape(-1)
    valid = ~bp.is_sentinel(flat_hi, flat_lo)
    shard = jnp.where(valid, hash_shard(flat_hi, flat_lo, n_shards), n_shards)

    order = jnp.argsort(shard)
    s_sorted = shard[order]
    h_sorted = flat_hi[order]
    l_sorted = flat_lo[order]

    # position within its shard-run = index - first index of that shard
    idx = jnp.arange(s_sorted.shape[0], dtype=jnp.int32)
    first = jnp.searchsorted(s_sorted, jnp.arange(n_shards + 1, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    pos = idx - first[jnp.clip(s_sorted, 0, n_shards)]

    keep = (s_sorted < n_shards) & (pos < cap)
    dropped = jnp.sum((s_sorted < n_shards) & (pos >= cap))

    tgt_shard = jnp.where(keep, s_sorted, n_shards - 1)
    tgt_pos = jnp.where(keep, pos, cap - 1)

    buf_hi = jnp.full((n_shards, cap), U32(bp.SENTINEL))
    buf_lo = jnp.full((n_shards, cap), U32(bp.SENTINEL))
    buf_hi = buf_hi.at[tgt_shard, tgt_pos].set(
        jnp.where(keep, h_sorted, U32(bp.SENTINEL)), mode="drop")
    buf_lo = buf_lo.at[tgt_shard, tgt_pos].set(
        jnp.where(keep, l_sorted, U32(bp.SENTINEL)), mode="drop")
    # the .set with a masked value can overwrite a real k-mer at
    # (n_shards-1, cap-1) only when that very slot overflowed anyway.
    return buf_hi, buf_lo, dropped


@partial(jax.jit, static_argnames=("k", "mesh", "cap_per_shard"))
def sharded_count(codes, lengths, *, k: int, mesh: Mesh,
                  cap_per_shard: int = 0):
    """Count canonical k-mers of a global read batch over a device mesh.

    Args:
      codes: [B, L] uint8, B divisible by mesh size (global array).
      lengths: [B] int32.
      k: k-mer size.
      mesh: 1D mesh with axis "shards".
      cap_per_shard: per-(device,shard) send capacity; 0 = no-drop bound
        (local_kmer_count, safe but memory-heavy — fine for tests).

    Returns (hi, lo, counts, n_unique, n_dropped): per-device shard tables
    stacked on the leading axis, each [n_shards, n_shards*cap]; slots past
    n_unique[s] hold sentinels.
    """
    n = mesh.shape[AXIS]
    B, L = codes.shape
    per_dev = B // n
    local_kmers = per_dev * (L - k + 1)
    cap = cap_per_shard or local_kmers

    def step(codes_l, lengths_l):
        hi, lo, _ = extract_canonical(codes_l, lengths_l, k)
        buf_hi, buf_lo, dropped = _bucket_local(hi, lo, n, cap)
        # device i sends row s of its buckets to device s
        recv_hi = jax.lax.all_to_all(buf_hi, AXIS, split_axis=0, concat_axis=0,
                                     tiled=True)
        recv_lo = jax.lax.all_to_all(buf_lo, AXIS, split_axis=0, concat_axis=0,
                                     tiled=True)
        out_hi, out_lo, out_cnt = count_flat(
            recv_hi.reshape(-1), recv_lo.reshape(-1))
        n_unique = jnp.sum(out_cnt > 0).astype(jnp.int32)
        return (out_hi[None], out_lo[None], out_cnt[None], n_unique[None],
                dropped[None])

    return jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
    )(codes, lengths)


def gather_counts(hi, lo, counts) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: merge per-shard tables into one sorted (keys64, counts)."""
    hi = np.asarray(hi).reshape(-1).astype(np.uint64)
    lo = np.asarray(lo).reshape(-1).astype(np.uint64)
    cnt = np.asarray(counts).reshape(-1)
    keys = (hi << np.uint64(32)) | lo
    keep = cnt > 0
    keys, cnt = keys[keep].astype(np.int64), cnt[keep].astype(np.int32)
    order = np.argsort(keys)
    return keys[order], cnt[order]
