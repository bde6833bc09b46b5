"""Connected components with size-window splitting — label propagation.

Reference semantics (src/algo/ComponentsBuilder.java): at threshold t the
graph over surviving k-mers is BFS-partitioned; components smaller than b1
are dropped, those within [b1, b2] are emitted with weight = sum of counts
and usedFreqThreshold = t, and oversized ones are re-processed at t+1
restricted to k-mers with count >= t+1.

TPU-native reformulation: sequential BFS becomes min-label propagation with
pointer shortcutting (FastSV-style), converging in O(log n) gather rounds;
all components of one threshold level are found in a single pass, and all
oversized components advance to the next level together (they stay disjoint
automatically).  The final component multiset is identical — BFS order
never affects membership.

Emitted components are sorted by (usedFreqThreshold asc, weight desc,
size desc), matching ConnectedComponent.compareTo (ties broken
deterministically by smallest member key — the reference's tie order is
thread-scheduling-dependent).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bitpack as bp
from . import dbg

I32 = jnp.int32


@dataclass
class Component:
    kmers: np.ndarray          # sorted int64 canonical keys
    weight: int
    used_freq_threshold: int

    @property
    def size(self) -> int:
        return len(self.kmers)


@jax.jit
def _mask_adjacency(idx_l, idx_r, pres_l, pres_r):
    idx = jnp.concatenate([idx_l, idx_r], axis=0)
    present = jnp.concatenate([pres_l, pres_r], axis=0)
    return jnp.where(present, idx, -1)


def adjacency(khi, klo, k: int):
    """[8, M] neighbor table indices (-1 = absent), canonical 8-neighborhood.

    Parity: KmerOperations.possibleNeighbours (src/algo/KmerOperations.java:9-27).
    Neighbor-major layout: an [M, 8] array's 8-wide minor dim pads to 128
    lanes on TPU (16x HBM blowup); [8, M] is tight.  Not one @jax.jit:
    see dbg.neighbor_tables (inlining the merge-join lookups OOMs the
    XLA compile helper).
    """
    t = dbg.neighbor_tables(khi, klo, k)
    return _mask_adjacency(t["left"]["idx"], t["right"]["idx"],
                           t["left"]["present"], t["right"]["present"])


@jax.jit
def _label_round(labels, nbr, active):
    """One hooking round: hash-min + scatter-min onto roots + compression.

    Pure hash-min (label = min over neighbor labels) converges in
    O(diameter) rounds — ~0.4*n rounds on a path with random vertex ids
    (measured: 9,534 rounds at 2^14; pointer shortcutting does NOT fix
    it, because compression only shallows the label tree, it never moves
    information across graph edges).  The Shiloach-Vishkin move that
    restores O(log n) is HOOKING: scatter-min each vertex's neighborhood
    minimum onto its current ROOT, so label trees merge across edges and
    compression then collapses them (measured: 15 rounds at 2^20 on the
    same path).  TPU cost per round: one [8, M] gather (hash-min), one
    [M] scatter-min (~82M/s on v5e), two compression gathers.
    """
    M = labels.shape[0]
    old = jnp.where(active, labels, M)

    # push: relax every edge with ONE [8, M] scatter-min (~82M/s on v5e)
    # instead of the [8, M] neighbor-label gather (~50M/s) — min-scatter
    # is order-independent, so the result is deterministic
    safe = jnp.clip(nbr, 0, M - 1)
    tgt = jnp.where((nbr >= 0) & active[None, :], safe, M)
    vals = jnp.broadcast_to(old[None, :], tgt.shape)
    labels = old.at[tgt].min(vals, mode="drop")

    # hook: each vertex's freshly-pushed knowledge onto its OLD root —
    # this merges label trees across edges, which is what turns
    # O(diameter) hash-min into O(log n) (index M = dropped)
    labels = labels.at[old].min(labels, mode="drop")

    # compress: 2 hops suffice alongside hooking (measured)
    for _ in range(2):
        labels = jnp.minimum(labels, labels[jnp.clip(labels, 0, M - 1)])
    # inactive rows must stay M: the clip above can otherwise read row
    # M-1's label into them (latent in the pre-hooking version too)
    return jnp.where(active, labels, M)


@jax.jit
def _connected_labels_device(nbr, active):
    """Fixed-point min-label propagation, fully on device.

    The convergence check runs inside lax.while_loop — right for the CPU
    backend and small tables, where a host round-trip per round would
    dominate.  NOT used on the TPU at scale: a single dispatch running
    the whole fixed point (minutes of gathers) crashed the tunneled v5e
    worker at M = 2^22 ("TPU worker process crashed or restarted",
    scratch/labelprop_probe.py) — large-M TPU runs go per-round through
    _round_step instead."""
    M = nbr.shape[1]
    labels0 = jnp.where(active, jnp.arange(M, dtype=I32), M)

    def cond(state):
        prev, cur = state
        return jnp.any(prev != cur)

    def body(state):
        _, cur = state
        return cur, _label_round(cur, nbr, active)

    _, labels = jax.lax.while_loop(
        cond, body, (labels0, _label_round(labels0, nbr, active)))
    return labels


@jax.jit
def _round_step(labels, nbr, active):
    new = _label_round(labels, nbr, active)
    return new, jnp.any(new != labels)


@jax.jit
def _compact_targets(nbr, active):
    """Scatter-target matrix with live entries sorted to the row front.

    The push targets (edge endpoints from active sources) are constant
    across all rounds of one fixed point; sorting each column's 8 slots
    live-first lets the round loop slice to the max live degree — chain
    graphs drop from 8 scatter rows to 2.  Returns (tgt [8, M], max
    live degree)."""
    M = nbr.shape[1]
    valid = (nbr >= 0) & active[None, :]
    tgt = jnp.where(valid, jnp.clip(nbr, 0, M - 1), M)
    key = jnp.where(valid, 0, 1).astype(jnp.uint32)
    _, tgt = jax.lax.sort((key, tgt), dimension=0, num_keys=1,
                          is_stable=False)
    deg = jnp.max(jnp.sum(valid, axis=0))
    return tgt, deg


@jax.jit
def _round_step_tgt(labels, tgt, active):
    """_round_step over a pre-compacted target matrix (TPU path).

    Two compression hops: one hop needs 18 rounds at 2^20 vs 15 with
    two, and the extra rounds cost more than the saved [M] gather
    (measured on v5e at 2^23: 8.7 s vs 7.5 s)."""
    M = labels.shape[0]
    old = jnp.where(active, labels, M)
    vals = jnp.broadcast_to(old[None, :], tgt.shape)
    new = old.at[tgt].min(vals, mode="drop")
    new = new.at[old].min(new, mode="drop")
    for _ in range(2):
        new = jnp.minimum(new, new[jnp.clip(new, 0, M - 1)])
    new = jnp.where(active, new, M)
    return new, jnp.any(new != labels)


# fused fixed-point dispatches above this size risk the device watchdog
# (one dispatch = the whole fixed point); per-round dispatches instead
_FUSED_MAX = 1 << 20


def connected_labels(nbr: jnp.ndarray, active: jnp.ndarray) -> np.ndarray:
    """Min-label per vertex over the active subgraph; inactive rows get M."""
    M = int(nbr.shape[1])
    active = jnp.asarray(active)
    try:
        platform = (jax.config.jax_default_device.platform
                    if jax.config.jax_default_device is not None
                    else jax.devices()[0].platform)
    except Exception:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon") or M <= _FUSED_MAX:
        return np.asarray(_connected_labels_device(nbr, active))
    tgt, deg = _compact_targets(jnp.asarray(nbr), active)
    d = max(int(deg), 1)
    if d < tgt.shape[0]:
        tgt = jax.lax.slice_in_dim(tgt, 0, d, axis=0)
    labels = jnp.where(active, jnp.arange(M, dtype=I32), M)
    # pipelined convergence: dispatch round i+1 BEFORE fetching round
    # i's flag, so the ~40ms tunnel round trip overlaps device compute
    # (costs at most one extra round after the fixed point)
    prev = None
    for _ in range(4 * (M.bit_length() + 2)):
        labels, changed = _round_step_tgt(labels, tgt, active)
        if prev is not None and not bool(prev):
            return np.asarray(labels)
        prev = changed
    raise RuntimeError("label propagation did not converge")


def split_components(keys64: np.ndarray, counts: np.ndarray, k: int,
                     b1: int, b2: int) -> list[Component]:
    """Full size-window component splitting over a counted k-mer table.

    With a default mesh set (api.set_default_mesh, >1 devices) the label
    fixed points route through the edge-cut sharded star contraction
    (parallel/components.py) — the whole-pipeline scaling the reference
    gets from striped maps (itmo BigLong2ShortHashMap.java:40-70); the
    single-device path is unchanged otherwise.
    """
    M0 = len(keys64)
    if M0 == 0:
        return []
    from .. import api

    mesh = api.get_default_mesh()
    if mesh is not None and mesh.devices.size > 1:
        from ..parallel.components import sharded_connected_labels

        labels_fn = lambda nbr, active: sharded_connected_labels(
            np.asarray(nbr), np.asarray(active), mesh)
        return _split_components_impl(keys64, counts, k, b1, b2, labels_fn)
    from ..utils.device import small_scope
    with small_scope(M0 * 16):
        return _split_components_impl(keys64, counts, k, b1, b2,
                                      connected_labels)


def _split_components_impl(keys64, counts, k, b1, b2,
                           labels_fn=None):
    if labels_fn is None:
        labels_fn = connected_labels
    M0 = len(keys64)
    M = 1 << max(4, int(np.ceil(np.log2(M0))))
    khi = np.full(M, bp.SENTINEL, dtype=np.uint32)
    klo = np.full(M, bp.SENTINEL, dtype=np.uint32)
    u = keys64.astype(np.uint64)
    khi[:M0] = (u >> np.uint64(32)).astype(np.uint32)
    klo[:M0] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    nbr = adjacency(jnp.asarray(khi), jnp.asarray(klo), k)
    counts_full = np.zeros(M, dtype=np.int64)
    counts_full[:M0] = counts

    active = np.zeros(M, dtype=bool)
    active[:M0] = True
    thr = 1
    out: list[Component] = []

    while active.any():
        # the active set shrinks sharply per threshold level (only
        # oversized components' high-count k-mers survive), but the
        # label rounds always cost O(table size): when occupancy drops
        # below 1/4, rebuild a compacted sub-table + adjacency so later
        # levels run at their own scale, not the level-1 table's.
        # Component membership is by KEY VALUE, so compaction cannot
        # change any emitted component; edges within the active subset
        # are preserved because both endpoints' keys remain present.
        n_act = int(active.sum())
        if n_act and n_act * 4 <= M and M > 16:
            sel = np.nonzero(active)[0]     # always < len(keys64): only
            keys64 = keys64[sel]            # real rows ever activate
            counts = counts_full[sel]
            M0 = len(keys64)
            M = 1 << max(4, int(np.ceil(np.log2(max(M0, 1)))))
            khi = np.full(M, bp.SENTINEL, dtype=np.uint32)
            klo = np.full(M, bp.SENTINEL, dtype=np.uint32)
            u = keys64.astype(np.uint64)
            khi[:M0] = (u >> np.uint64(32)).astype(np.uint32)
            klo[:M0] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            nbr = adjacency(jnp.asarray(khi), jnp.asarray(klo), k)
            counts_full = np.zeros(M, dtype=np.int64)
            counts_full[:M0] = counts
            active = np.zeros(M, dtype=bool)
            active[:M0] = True
        labels = labels_fn(nbr, jnp.asarray(active))
        act_idx = np.nonzero(active)[0]
        roots = labels[act_idx]
        order = np.argsort(roots, kind="stable")
        act_sorted = act_idx[order]
        roots_sorted = roots[order]
        # component boundaries
        starts = np.nonzero(np.r_[True, roots_sorted[1:] != roots_sorted[:-1]])[0]
        ends = np.r_[starts[1:], len(roots_sorted)]

        next_active = np.zeros(M, dtype=bool)
        for s, e in zip(starts, ends):
            members = act_sorted[s:e]
            size = e - s
            if size < b1:
                continue
            if size <= b2:
                w = int(counts_full[members].sum())
                out.append(Component(
                    kmers=np.sort(keys64[members]), weight=w,
                    used_freq_threshold=thr))
            else:
                survive = members[counts_full[members] >= thr + 1]
                next_active[survive] = True
        active = next_active
        thr += 1
        if thr > 32768:
            break

    out.sort(key=lambda c: (c.used_freq_threshold, -c.weight, -c.size,
                            int(c.kmers[0]) if c.size else 0))
    return out
