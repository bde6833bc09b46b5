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


@jax.jit
def _merge_rank(table_hi, table_lo, qh, ql):
    """Tagged 3-key sort + rank prefix sum + restore sort.

    Because the table's keys are unique and sorted, the r-th table entry
    in the merged sorted order is exactly row r of the original table —
    so the classic forward fill of (index, key) collapses to a plain
    prefix sum rank = cumsum(is_table) - 1 (ops.count._cumsum_flat, the
    compile-bounded decomposition already proven at 2^27 in the counting
    core).  The r3 formulation carried a 4-tuple through a row-decomposed
    associative_scan instead; its XLA compile ran minutes and OOM-killed
    the remote TPU compile helper at 2^22 (BENCH_r03 graph_stages_error —
    measured directly in scratch/find_merge_probe.py).
    """
    from ..ops.count import _cumsum_flat

    T = table_hi.shape[0]
    Q = qh.shape[0]
    chi = jnp.concatenate([table_hi, qh])
    clo = jnp.concatenate([table_lo, ql])
    src = jnp.concatenate([jnp.arange(T, dtype=I32),
                           jnp.arange(Q, dtype=I32) + T])
    # src as third key: a table entry sorts BEFORE equal-key queries
    _shi, _slo, ssrc = jax.lax.sort((chi, clo, src), num_keys=3,
                                    is_stable=False)
    is_tab = ssrc < T
    rank = _cumsum_flat(is_tab.astype(I32)) - 1   # last table row <= pos
    # restore original order: src is unique, one 1-key sort
    _, rres = jax.lax.sort((ssrc, rank), num_keys=1, is_stable=False)
    return jax.lax.slice_in_dim(rres, T, T + Q)


@jax.jit
def _merge_verify(table_hi, table_lo, qh, ql, qrank):
    """found iff the candidate table row holds the query key (2 gathers)."""
    T = table_hi.shape[0]
    safe = jnp.clip(qrank, 0, T - 1)
    found = ((qrank >= 0) & (table_hi[safe] == qh) & (table_lo[safe] == ql)
             & ~bp.is_sentinel(qh, ql))
    return safe, found


def _find_merge(table_hi, table_lo, qhi, qlo):
    """Bulk (index, found) via sort-merge join.

    Two jit stages (rank, verify) — kept separate so each remote TPU
    compile stays small (see graph/dbg.py for the same discipline)."""
    shape = qhi.shape
    qh = qhi.reshape(-1)
    ql = qlo.reshape(-1)
    qrank = _merge_rank(table_hi, table_lo, qh, ql)
    safe, found = _merge_verify(table_hi, table_lo, qh, ql, qrank)
    return safe.reshape(shape), found.reshape(shape)


def find(table_hi, table_lo, qhi, qlo):
    """(index, found) per query; index clipped into range, found bool.

    Where found is False the index is arbitrary (but in range) — callers
    mask by `found` before use.  Bulk queries route to the sort-merge
    join; small ones to binary search (lower dispatch+sort overhead).
    NOT itself @jax.jit: the merge path runs as separately-jitted stages
    so each remote TPU compile stays small; calling `find` under an
    outer jit would fuse them back into one compile.
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
