"""Device k-mer counting: lexicographic sort + run-length segment reduce.

The reference counts k-mers with a striped concurrent hash table
(itmo BigLong2ShortHashMap, src/io/IOUtils.java:742-803).  Random-access hash
tables are hostile to TPU hardware; the TPU-native formulation is:

    extract -> sort (hi, lo) pairs -> run-length-encode -> merge runs

All arrays are fixed-shape; invalid slots carry the SENTINEL key which sorts
to the end and is dropped on the host.  Counts saturate at 32767 to match
the reference (itmo NumUtils.java:21-26) — since saturation is a monotone
cap, merging partial counts with saturating adds is order-independent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bitpack as bp

U32 = jnp.uint32
SATURATE = 32767


@partial(jax.jit, static_argnames=("k",))
def count_batch(codes, lengths, k: int):
    """Count canonical k-mers of one read batch.

    Returns (uhi, ulo, counts) of the same flat length N = B*P: unique keys
    compacted to the front (sorted ascending), SENTINEL-padded tail,
    counts int32 (0 on padding).
    """
    from ..core.extract import extract_canonical

    hi, lo, _valid = extract_canonical(codes, lengths, k)
    return count_flat(hi.ravel(), lo.ravel())


@jax.jit
def count_flat(hi, lo):
    """Sort + RLE a flat array of (hi, lo) keys (SENTINEL = ignore)."""
    hi, lo = jax.lax.sort((hi, lo), num_keys=2)
    ones = jnp.where(bp.is_sentinel(hi, lo), 0, 1).astype(jnp.int32)
    return _rle(hi, lo, ones)


@jax.jit
def merge_counted(hi_a, lo_a, cnt_a, hi_b, lo_b, cnt_b):
    """Merge two counted (sorted, sentinel-padded) arrays with saturating add.

    Output length = len(a) + len(b), unique keys front-compacted, sorted.
    """
    hi = jnp.concatenate([hi_a, hi_b])
    lo = jnp.concatenate([lo_a, lo_b])
    cnt = jnp.concatenate([cnt_a, cnt_b]).astype(jnp.int32)
    hi, lo, cnt = jax.lax.sort((hi, lo, cnt), num_keys=2)
    return _rle(hi, lo, cnt)


def _rle(hi, lo, weights):
    """Run-length reduce sorted keys, summing `weights` (saturating).

    Keys equal to SENTINEL contribute nothing and are emitted as padding.
    """
    n = hi.shape[0]
    sent = bp.is_sentinel(hi, lo)
    prev_hi = jnp.concatenate([jnp.zeros((1,), dtype=U32), hi[:-1]])
    prev_lo = jnp.concatenate([jnp.zeros((1,), dtype=U32), lo[:-1]])
    is_new = (hi != prev_hi) | (lo != prev_lo)
    # position 0 is always a run start
    is_new = is_new.at[0].set(True)
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1          # run id per element
    totals = jax.ops.segment_sum(weights, seg, num_segments=n)
    totals = jnp.minimum(totals, SATURATE)

    # compact run-start keys to the front
    out_hi = jnp.full((n,), bp.SENTINEL, dtype=U32)
    out_lo = jnp.full((n,), bp.SENTINEL, dtype=U32)
    idx = jnp.where(is_new & ~sent, seg, n)                  # drop sentinel run
    out_hi = out_hi.at[idx].set(hi, mode="drop")
    out_lo = out_lo.at[idx].set(lo, mode="drop")
    counts = jnp.where(bp.is_sentinel(out_hi, out_lo), 0, totals).astype(jnp.int32)
    return out_hi, out_lo, counts


# ---------------------------------------------------------------------------
# Host-side accumulator
# ---------------------------------------------------------------------------

class KmerCounter:
    """Streaming canonical k-mer counter over read batches.

    Feeds device batches through `count_batch` and folds results into a
    running counted table with `merge_counted`, doubling capacity as needed.
    Shapes are powers of two to bound jit cache size.
    """

    def __init__(self, k: int, capacity: int = 1 << 16):
        self.k = k
        self._cap = 1
        while self._cap < capacity:
            self._cap *= 2
        self._hi = jnp.full((self._cap,), bp.SENTINEL, dtype=U32)
        self._lo = jnp.full((self._cap,), bp.SENTINEL, dtype=U32)
        self._cnt = jnp.zeros((self._cap,), dtype=jnp.int32)
        self.total_kmers_seen = 0

    def add_batch(self, codes, lengths):
        """codes [B, L] uint8, lengths [B] int32 (numpy or jnp)."""
        bhi, blo, bcnt = count_batch(jnp.asarray(codes), jnp.asarray(lengths), self.k)
        self.total_kmers_seen += int(jnp.sum(bcnt))
        self._fold(bhi, blo, bcnt)

    def add_counted(self, hi, lo, cnt):
        """Fold an already-counted (sorted or unsorted unique) table in."""
        hi = jnp.asarray(hi, dtype=U32)
        lo = jnp.asarray(lo, dtype=U32)
        cnt = jnp.asarray(cnt, dtype=jnp.int32)
        self._fold(*merge_counted(
            hi, lo, cnt,
            jnp.full((1,), bp.SENTINEL, dtype=U32),
            jnp.full((1,), bp.SENTINEL, dtype=U32),
            jnp.zeros((1,), dtype=jnp.int32)))

    def _fold(self, bhi, blo, bcnt):
        while True:
            hi, lo, cnt = merge_counted(self._hi, self._lo, self._cnt, bhi, blo, bcnt)
            # number of live keys after merge
            live = int(jnp.sum(cnt > 0))
            if live <= self._cap:
                self._hi = jax.lax.slice_in_dim(hi, 0, self._cap)
                self._lo = jax.lax.slice_in_dim(lo, 0, self._cap)
                self._cnt = jax.lax.slice_in_dim(cnt, 0, self._cap)
                break
            # grow and retry
            grow = self._cap
            while live > self._cap + grow:
                grow *= 2
            self._hi = jnp.concatenate(
                [self._hi, jnp.full((grow,), bp.SENTINEL, dtype=U32)])
            self._lo = jnp.concatenate(
                [self._lo, jnp.full((grow,), bp.SENTINEL, dtype=U32)])
            self._cnt = jnp.concatenate(
                [self._cnt, jnp.zeros((grow,), dtype=jnp.int32)])
            self._cap += grow

    # -- results ----------------------------------------------------------

    def finish(self):
        """Return (keys_u64 sorted ascending, counts int32) as numpy arrays."""
        hi = np.asarray(self._hi)
        lo = np.asarray(self._lo)
        cnt = np.asarray(self._cnt)
        live = cnt > 0
        keys = (hi[live].astype(np.uint64) << np.uint64(32)) | lo[live].astype(np.uint64)
        return keys.astype(np.int64), cnt[live]
