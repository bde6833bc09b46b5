"""Vectorized binary search over sorted (hi, lo) uint32 key tables.

The de Bruijn graph is represented as a sorted canonical k-mer table;
membership and neighbor resolution are lower_bound searches, fully
vectorized over query arrays (each of ~32 rounds is one gather + compare
over all queries — TPU-friendly, no data-dependent control flow).

Replaces the reference's open-addressing hash probes
(itmo Long2ShortHashMap.java:153-165) with the XLA-native equivalent.
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


@jax.jit
def find(table_hi, table_lo, qhi, qlo):
    """(index, found) per query; index clipped into range, found bool."""
    n = table_hi.shape[0]
    idx = lower_bound(table_hi, table_lo, qhi, qlo)
    safe = jnp.minimum(idx, n - 1)
    found = (table_hi[safe] == qhi) & (table_lo[safe] == qlo) & (idx < n)
    # never match sentinel padding
    found = found & ~bp.is_sentinel(qhi, qlo)
    return safe, found
