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


# NOTE on jit granularity: fusing extract+sort+RLE into one jit blows up
# XLA optimization time (~250s vs ~37s for the parts on a 2M-element batch
# on TPU), so the stages are jitted separately.  Large-sort compiles are
# also written to the persistent compilation cache (metafast_tpu/__init__).

@partial(jax.jit, static_argnames=("k",))
def _extract_flat(codes, lengths, k: int):
    from ..core.extract import extract_canonical

    hi, lo, _valid = extract_canonical(codes, lengths, k)
    return hi.ravel(), lo.ravel()


@jax.jit
def _sort_pair(hi, lo):
    return jax.lax.sort((hi, lo), num_keys=2)


@jax.jit
def _rle_ones(hi, lo):
    ones = jnp.where(bp.is_sentinel(hi, lo), 0, 1).astype(jnp.int32)
    return _rle(hi, lo, ones)


def count_batch(codes, lengths, k: int):
    """Count canonical k-mers of one read batch.

    Returns (uhi, ulo, counts) of the same flat length N = B*P: unique keys
    compacted to the front (sorted ascending), SENTINEL-padded tail,
    counts int32 (0 on padding).
    """
    hi, lo = _extract_flat(codes, lengths, k)
    return count_flat(hi, lo)


@partial(jax.jit, static_argnames=("k", "L"))
def _extract_flat_packed(packed, lengths, k: int, L: int):
    from ..core.extract import extract_canonical_packed

    hi, lo, _valid = extract_canonical_packed(packed, lengths, k, L)
    return hi.ravel(), lo.ravel()


def count_batch_packed(packed, lengths, k: int, L: int):
    """count_batch over 2-bit packed codes ([B, L//4] bytes)."""
    hi, lo = _extract_flat_packed(jnp.asarray(packed), jnp.asarray(lengths),
                                  k, L)
    return count_flat(hi, lo)


def count_flat(hi, lo):
    """Sort + RLE a flat array of (hi, lo) keys (SENTINEL = ignore)."""
    hi, lo = _sort_pair(hi, lo)
    return _rle_ones(hi, lo)


@jax.jit
def _sort_triple(hi, lo, cnt):
    return jax.lax.sort((hi, lo, cnt), num_keys=2)


@jax.jit
def _rle_weighted(hi, lo, cnt):
    return _rle(hi, lo, cnt)


def merge_counted(hi_a, lo_a, cnt_a, hi_b, lo_b, cnt_b):
    """Merge two counted (sorted, sentinel-padded) arrays with saturating add.

    Output length = len(a) + len(b), unique keys front-compacted, sorted.
    """
    hi = jnp.concatenate([hi_a, hi_b])
    lo = jnp.concatenate([lo_a, lo_b])
    cnt = jnp.concatenate([cnt_a, cnt_b]).astype(jnp.int32)
    hi, lo, cnt = _sort_triple(hi, lo, cnt)
    return _rle_weighted(hi, lo, cnt)


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


def _pad_pow2(hi, lo, cnt):
    """Pad a counted table with sentinels up to the next power of two."""
    n = hi.shape[0]
    size = 16
    while size < n:
        size *= 2
    return _pad_to((hi, lo, cnt), size)


def _pad_to(table, size):
    hi, lo, cnt = table
    n = hi.shape[0]
    if n == size:
        return table
    pad = size - n
    return (jnp.concatenate([hi, jnp.full((pad,), bp.SENTINEL, dtype=U32)]),
            jnp.concatenate([lo, jnp.full((pad,), bp.SENTINEL, dtype=U32)]),
            jnp.concatenate([cnt, jnp.zeros((pad,), dtype=jnp.int32)]))


def _empty(n=16):
    return (jnp.full((n,), 0xFFFFFFFF, dtype=U32),
            jnp.full((n,), 0xFFFFFFFF, dtype=U32),
            jnp.zeros((n,), dtype=jnp.int32))


# ---------------------------------------------------------------------------
# Host-side accumulator
# ---------------------------------------------------------------------------

class KmerCounter:
    """Streaming canonical k-mer counter over read batches.

    The accumulation table lives ON DEVICE: host<->device transfers can be
    orders of magnitude slower than compute (tunneled TPU), so per-batch
    results are never pulled to the host.  Tables merge by a binary
    counter over power-of-two sizes — a merge only ever pairs two tables
    of the same size, so `merge_counted` sees one shape signature per
    level (XLA sort compile time grows superlinearly with size on TPU and
    each signature costs a full compile, amortized by the persistent
    compilation cache).  After each merge the table is trimmed to the
    smallest power of two holding its live uniques (a cheap slice), so
    table sizes track the unique count, not the raw stream length.
    Counts saturate at 32767 (reference parity, itmo NumUtils.java:21-26).
    """

    def __init__(self, k: int, capacity: int = 1 << 16):
        self.k = k
        self._levels: dict = {}     # pow2 size -> counted (hi, lo, cnt)
        self._total: list | int = []  # device scalars; realized lazily

    @property
    def total_kmers_seen(self) -> int:
        """Total k-mers seen (realizes the deferred device sums)."""
        if isinstance(self._total, list):
            self._total = sum(int(x) for x in self._total)
        return self._total or 0

    def _add_total(self, bcnt) -> None:
        # keep per-batch device scalars; summing on host at realization
        # avoids both a per-batch sync and int32 overflow
        if not isinstance(self._total, list):
            self._total = [self._total] if self._total else []
        self._total.append(jnp.sum(bcnt))

    def add_batch(self, codes, lengths):
        """codes [B, L] uint8, lengths [B] int32 (numpy or jnp)."""
        bhi, blo, bcnt = count_batch(jnp.asarray(codes),
                                     jnp.asarray(lengths), self.k)
        self._add_total(bcnt)
        self._insert(self._trim((bhi, blo, bcnt)))

    def add_packed_batch(self, packed, lengths, L: int):
        """packed [B, L//4] uint8 (2-bit codes), lengths [B] int32."""
        bhi, blo, bcnt = count_batch_packed(packed, lengths, self.k, L)
        self._add_total(bcnt)
        self._insert(self._trim((bhi, blo, bcnt)))

    def add_counted(self, hi, lo, cnt):
        """Fold an already-counted table in (uint32 pair + count arrays)."""
        hi = jnp.asarray(hi, dtype=U32)
        lo = jnp.asarray(lo, dtype=U32)
        cnt = jnp.asarray(cnt, dtype=jnp.int32)
        hi, lo, cnt = _pad_pow2(hi, lo, cnt)
        n = hi.shape[0]
        self._insert(self._trim(merge_counted(hi, lo, cnt, *_empty(n))))

    def add_keys(self, keys, counts):
        """Fold a host-side (int64 keys, counts) table in."""
        keys = np.asarray(keys, dtype=np.int64).astype(np.uint64)
        self.add_counted((keys >> np.uint64(32)).astype(np.uint32),
                         (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                         np.asarray(counts))

    def _trim(self, table):
        """Slice a compacted table down to pow2(live uniques)."""
        hi, lo, cnt = table
        live = int(jnp.sum(cnt > 0))
        size = 16
        while size < live:
            size *= 2
        if size >= hi.shape[0]:
            return table
        return (jax.lax.slice_in_dim(hi, 0, size),
                jax.lax.slice_in_dim(lo, 0, size),
                jax.lax.slice_in_dim(cnt, 0, size))

    def _insert(self, table) -> None:
        size = table[0].shape[0]
        while size in self._levels:
            other = self._levels.pop(size)
            table = self._trim(merge_counted(*table, *other))
            size = table[0].shape[0]
        self._levels[size] = table

    # -- results ----------------------------------------------------------

    def finish(self):
        """Return (keys int64 sorted ascending, counts int32) as numpy."""
        if not self._levels:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        while len(self._levels) > 1:
            sizes = sorted(self._levels)
            small = self._levels.pop(sizes[0])
            self._insert(_pad_to(small, sizes[1]))
        ((_, (hi, lo, cnt)),) = self._levels.items()
        hi = np.asarray(hi)
        lo = np.asarray(lo)
        cnt = np.asarray(cnt)
        live = cnt > 0
        keys = ((hi[live].astype(np.uint64) << np.uint64(32))
                | lo[live].astype(np.uint64)).astype(np.int64)
        order = np.argsort(keys)
        return keys[order], cnt[live][order]
