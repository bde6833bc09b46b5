"""Vectorized lookups over sorted (hi, lo) uint32 key tables.

The de Bruijn graph is represented as a sorted canonical k-mer table;
membership and neighbor resolution replace the reference's
open-addressing hash probes (itmo Long2ShortHashMap.java:153-165) with
two XLA-native strategies, chosen by query volume:

  * binary search (`lower_bound`): ~32 rounds of gather + compare.
    Right for SMALL query sets — but gathers are the weakest primitive
    on TPU (measured ~50M random gathers/s on v5e, so 67M neighbor
    queries cost ~30s and can crash the worker at 2^23-key tables);
  * sort-merge join (`_find_merge`): tag table and query keys, ONE
    3-key sort brings equal keys adjacent (table entry first), a
    forward-fill carries each table entry's index+key to the queries
    behind it, and a second 2-array sort restores query order.  Sorts
    run at ~300M keys/s on v5e — ~20x the gather route at bulk sizes,
    with no per-round latency.

Both paths are pure XLA (jit- and shard_map-safe) and bit-identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import bitpack as bp

U32 = jnp.uint32
I32 = jnp.int32


@jax.jit
def lower_bound(table_hi, table_lo, qhi, qlo):
    """Index of first table key >= query, per query element.

    Table must be sorted ascending with SENTINEL padding at the tail
    (SENTINEL sorts above every valid key).
    """
    n = table_hi.shape[0]
    # search interval is [0, n] (n+1 states) -> n.bit_length() halvings
    steps = max(1, n.bit_length())
    lo = jnp.zeros(qhi.shape, dtype=I32)
    hi = jnp.full(qhi.shape, n, dtype=I32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        mhi = table_hi[mid]
        mlo = table_lo[mid]
        lt = bp.less(mhi, mlo, qhi, qlo)  # table[mid] < q
        lo = jnp.where(lt, mid + 1, lo)
        hi = jnp.where(lt, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


# query count above which the sort-merge join beats gather-round search
MERGE_MIN = 1 << 20


def _ffill_comb(a, b):
    """Last-valid-wins combine for the forward fill (associative)."""
    bv = b[0]
    return (a[0] | bv,) + tuple(
        jnp.where(bv, bx, ax) for ax, bx in zip(a[1:], b[1:]))


def _ffill_scan(elems):
    """Inclusive left-to-right last-valid fill of (valid, x1, x2, ...).

    Row-decomposed: a flat 1D associative_scan's TPU compile time grows
    superlinearly with length (same hazard as ops.count._cumsum_flat)."""
    n = elems[0].shape[0]
    C = 1024
    if n % C or n <= 8 * C:
        return jax.lax.associative_scan(_ffill_comb, elems)
    e2 = tuple(x.reshape(n // C, C) for x in elems)
    s = jax.lax.associative_scan(_ffill_comb, e2, axis=1)
    carry = _ffill_scan(tuple(x[:, -1] for x in s))
    shift = lambda x, fill: jnp.concatenate(
        [jnp.full((1,), fill, x.dtype), x[:-1]])
    c = (shift(carry[0], False),) + tuple(
        shift(x, 0) for x in carry[1:])
    out = _ffill_comb(tuple(x[:, None] for x in c), s)
    return tuple(x.reshape(n) for x in out)


@jax.jit
def _find_merge(table_hi, table_lo, qhi, qlo):
    """Bulk (index, found) via one tagged sort + fill + restore sort."""
    T = table_hi.shape[0]
    shape = qhi.shape
    qh = qhi.reshape(-1)
    ql = qlo.reshape(-1)
    Q = qh.shape[0]
    chi = jnp.concatenate([table_hi, qh])
    clo = jnp.concatenate([table_lo, ql])
    src = jnp.concatenate([jnp.arange(T, dtype=I32),
                           jnp.arange(Q, dtype=I32) + T])
    # src as third key: a table entry sorts BEFORE equal-key queries
    shi, slo, ssrc = jax.lax.sort((chi, clo, src), num_keys=3,
                                  is_stable=False)
    is_tab = ssrc < T
    fv, fidx, fhi, flo = _ffill_scan((
        is_tab,
        jnp.where(is_tab, ssrc, 0),
        jnp.where(is_tab, shi, U32(0)),
        jnp.where(is_tab, slo, U32(0))))
    hit = fv & (fhi == shi) & (flo == slo)
    res = jnp.where(hit, fidx, -1)
    # restore original order: src is unique, one 1-key sort
    _, res2 = jax.lax.sort((ssrc, res), num_keys=1, is_stable=False)
    qres = jax.lax.slice_in_dim(res2, T, T + Q)
    found = (qres >= 0) & ~bp.is_sentinel(qh, ql)
    safe = jnp.clip(qres, 0, T - 1)
    return safe.reshape(shape), found.reshape(shape)


@jax.jit
def find(table_hi, table_lo, qhi, qlo):
    """(index, found) per query; index clipped into range, found bool.

    Where found is False the index is arbitrary (but in range) — callers
    mask by `found` before use.  Bulk queries route to the sort-merge
    join; small ones to binary search (lower dispatch+sort overhead).
    """
    n = table_hi.shape[0]
    q = 1
    for d in qhi.shape:
        q *= d
    if q >= MERGE_MIN:
        return _find_merge(table_hi, table_lo, qhi, qlo)
    idx = lower_bound(table_hi, table_lo, qhi, qlo)
    safe = jnp.minimum(idx, n - 1)
    found = (table_hi[safe] == qhi) & (table_lo[safe] == qlo) & (idx < n)
    # never match sentinel padding
    found = found & ~bp.is_sentinel(qhi, qlo)
    return safe, found
