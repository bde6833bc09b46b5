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

def _pad1(x, out: int, fill):
    n = x.shape[0]
    if out == n:
        return x
    return jnp.concatenate([x, jnp.full((out - n,), fill, x.dtype)])


@partial(jax.jit, static_argnames=("k", "out"))
def _extract_flat(codes, lengths, k: int, out: int = 0):
    from ..core.extract import extract_canonical

    hi, lo, _valid = extract_canonical(codes, lengths, k)
    hi, lo = hi.ravel(), lo.ravel()
    if out:
        hi = _pad1(hi, out, bp.SENTINEL)
        lo = _pad1(lo, out, bp.SENTINEL)
    return hi, lo


@jax.jit
def _sort_pair(hi, lo):
    return jax.lax.sort((hi, lo), num_keys=2)


def count_batch(codes, lengths, k: int):
    """Count canonical k-mers of one read batch.

    Returns (uhi, ulo, counts) of the same flat length N = B*P: unique keys
    compacted to the front (sorted ascending), SENTINEL-padded tail,
    counts int32 (0 on padding).
    """
    hi, lo = _extract_flat(codes, lengths, k)
    return count_flat(hi, lo)


@partial(jax.jit, static_argnames=("k", "L", "out"))
def _extract_flat_packed(packed, lengths, k: int, L: int, out: int = 0):
    from ..core.extract import extract_canonical_packed

    hi, lo, _valid = extract_canonical_packed(packed, lengths, k, L)
    hi, lo = hi.ravel(), lo.ravel()
    if out:
        hi = _pad1(hi, out, bp.SENTINEL)
        lo = _pad1(lo, out, bp.SENTINEL)
    return hi, lo


def count_batch_packed(packed, lengths, k: int, L: int):
    """count_batch over 2-bit packed codes ([B, L//4] bytes)."""
    hi, lo = _extract_flat_packed(jnp.asarray(packed), jnp.asarray(lengths),
                                  k, L)
    return count_flat(hi, lo)


def count_flat(hi, lo):
    """Sort + RLE a flat array of (hi, lo) keys (SENTINEL = ignore)."""
    hi, lo = _sort_pair(hi, lo)
    return _rle_compact_ones(hi, lo)


@jax.jit
def _sort_triple(hi, lo, cnt):
    return jax.lax.sort((hi, lo, cnt), num_keys=2)


@jax.jit
def _concat_pair(hi_a, lo_a, hi_b, lo_b):
    return jnp.concatenate([hi_a, hi_b]), jnp.concatenate([lo_a, lo_b])


def merge_counted(hi_a, lo_a, cnt_a, hi_b, lo_b, cnt_b):
    """Merge two counted (sorted, sentinel-padded) arrays with saturating add.

    Output length = len(a) + len(b), unique keys front-compacted, sorted.
    """
    hi = jnp.concatenate([hi_a, hi_b])
    lo = jnp.concatenate([lo_a, lo_b])
    cnt = jnp.concatenate([cnt_a, cnt_b]).astype(jnp.int32)
    hi, lo, cnt = _sort_triple(hi, lo, cnt)
    return _rle_compact_weighted(hi, lo, cnt)


@jax.jit
def _rle_compact_ones(hi, lo):
    hi, lo, cnt = _rle_sparse(hi, lo, None)
    return _sort_triple(hi, lo, cnt)


@jax.jit
def _rle_compact_weighted(hi, lo, cnt):
    hi, lo, cnt = _rle_sparse(hi, lo, cnt)
    return _sort_triple(hi, lo, cnt)


def _rle_sparse(hi, lo, weights):
    """Run-length reduce sorted keys, summing `weights` (saturating).

    Scatter-free (TPU scatters are slow): run totals come from one gather
    into the weight prefix-sum at the next run start, so the result stays
    *in place* — run-start slots keep their key and carry the run total,
    all other slots become SENTINEL/0.  Callers compact by re-sorting
    (`_sort_triple`), which moves live entries to the front in key order.
    Keys equal to SENTINEL contribute nothing and are emitted as padding.
    """
    n = hi.shape[0]
    sent = bp.is_sentinel(hi, lo)
    prev_hi = jnp.concatenate([jnp.zeros((1,), dtype=U32), hi[:-1]])
    prev_lo = jnp.concatenate([jnp.zeros((1,), dtype=U32), lo[:-1]])
    is_new = (hi != prev_hi) | (lo != prev_lo)
    is_new = is_new.at[0].set(True)

    if weights is None:
        w = jnp.where(sent, 0, 1).astype(jnp.int64)
    else:
        w = jnp.where(sent, 0, weights).astype(jnp.int64)
    cw = jnp.cumsum(w)                                     # inclusive
    iota = jnp.arange(n, dtype=jnp.int32)
    start_idx = jnp.where(is_new, iota, n).astype(jnp.int32)
    # next run start strictly after i = reverse-inclusive cummin, shifted
    rmin = jax.lax.associative_scan(jnp.minimum, start_idx, reverse=True)
    nxt = jnp.concatenate([rmin[1:], jnp.full((1,), n, jnp.int32)])
    # total of the run starting at i = cw[nxt-1] - cw[i-1]
    #                                = cw[nxt-1] - (cw[i] - w[i])
    run_end = cw[jnp.clip(nxt - 1, 0, n - 1)]
    totals = run_end - cw + w
    live = is_new & ~sent
    out_hi = jnp.where(live, hi, U32(bp.SENTINEL))
    out_lo = jnp.where(live, lo, U32(bp.SENTINEL))
    counts = jnp.where(live, jnp.minimum(totals, SATURATE), 0).astype(jnp.int32)
    return out_hi, out_lo, counts


def _pow2(n: int) -> int:
    size = 16
    while size < n:
        size *= 2
    return size


def _pad_pow2(hi, lo, cnt):
    """Pad a counted table with sentinels up to the next power of two."""
    return _pad_to((hi, lo, cnt), _pow2(hi.shape[0]))


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

    All state lives ON DEVICE: host<->device round-trips can be orders of
    magnitude slower than compute (tunneled TPU), so the per-batch path is
    fully asynchronous — extracted keys accumulate in a concat-only binary
    counter over power-of-two sizes (every concatenate pairs two arrays of
    the same size, so XLA sees a bounded set of shape signatures).  Only
    when a raw level reaches ``chunk`` keys is it counted: one large sort
    + run-length reduce (large sorts amortize dispatch latency ~100x
    better than per-batch sorts), followed by a single host sync to trim
    the counted table down to pow2(live uniques).  Counted tables merge by
    the same binary-counter discipline via `merge_counted`.  Compiles are
    amortized by the persistent compilation cache (metafast_tpu/__init__).
    Counts saturate at 32767 (reference parity, itmo NumUtils.java:21-26).
    """

    def __init__(self, k: int, capacity: int = 1 << 16,
                 chunk: int = 1 << 27):
        self.k = k
        self._levels: dict = {}     # pow2 size -> counted (hi, lo, cnt)
        self._raw: dict = {}        # pow2 size -> raw (hi, lo) key arrays
        self._chunk = chunk         # raw keys per sort+RLE consolidation
        self._total_host = 0
        self._total_dev: list = []  # deferred device scalars

    @property
    def total_kmers_seen(self) -> int:
        """Total k-mers seen (realizes the deferred device sums)."""
        if self._total_dev:
            self._total_host += sum(int(x) for x in self._total_dev)
            self._total_dev = []
        return self._total_host

    def _add_total_from_lengths(self, lengths) -> None:
        # k-mers per read = max(len - k + 1, 0); for host arrays this
        # costs nothing, for device arrays defer the scalar fetch
        if isinstance(lengths, np.ndarray):
            self._total_host += int(
                np.maximum(lengths.astype(np.int64) - self.k + 1, 0).sum())
        else:
            self._total_dev.append(jnp.sum(jnp.maximum(
                lengths.astype(jnp.int64) - self.k + 1, 0)))

    def add_batch(self, codes, lengths):
        """codes [B, L] uint8, lengths [B] int32 (numpy or jnp)."""
        codes = jnp.asarray(codes)
        B, L = codes.shape
        out = _pow2(B * (L - self.k + 1))
        self._add_total_from_lengths(lengths)
        bhi, blo = _extract_flat(codes, jnp.asarray(lengths), self.k,
                                 out=out)
        self._raw_insert(bhi, blo)

    def add_packed_batch(self, packed, lengths, L: int):
        """packed [B, L//4] uint8 (2-bit codes), lengths [B] int32."""
        packed = jnp.asarray(packed)
        out = _pow2(packed.shape[0] * (L - self.k + 1))
        self._add_total_from_lengths(lengths)
        bhi, blo = _extract_flat_packed(packed, jnp.asarray(lengths),
                                        self.k, L, out=out)
        self._raw_insert(bhi, blo)

    # -- raw (uncounted) key accumulation ----------------------------------

    def _raw_insert(self, hi, lo) -> None:
        size = hi.shape[0]          # already a power of two
        while size in self._raw:
            ohi, olo = self._raw.pop(size)
            hi, lo = _concat_pair(hi, lo, ohi, olo)
            size *= 2
        if size >= self._chunk:
            self._insert(self._trim(count_flat(hi, lo)))
        else:
            self._raw[size] = (hi, lo)

    def _consolidate_raw(self) -> None:
        if not self._raw:
            return
        # merge levels smallest-first, sentinel-padding each to its
        # partner's size so every concat pairs two equal pow2 arrays
        # (bounded shape-signature set, same as _raw_insert)
        sizes = sorted(self._raw)
        hi, lo = self._raw[sizes[0]]
        for s in sizes[1:]:
            ohi, olo = self._raw[s]
            hi = _pad1(hi, s, bp.SENTINEL)
            lo = _pad1(lo, s, bp.SENTINEL)
            hi, lo = _concat_pair(hi, lo, ohi, olo)
        self._raw = {}
        self._insert(self._trim(count_flat(hi, lo)))

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
        self._consolidate_raw()
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
        cnt = cnt[live]
        # the device table is compacted in ascending (hi, lo) order, which
        # int64 keys preserve for k <= 31 (keys < 2^62); the sort below is
        # a guarded no-op kept for safety
        if len(keys) > 1 and not np.all(keys[:-1] < keys[1:]):
            order = np.argsort(keys)
            keys, cnt = keys[order], cnt[order]
        return keys, cnt
