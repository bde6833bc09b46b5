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

from dataclasses import dataclass
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

# ---------------------------------------------------------------------------
# Single-device star contraction.
#
# Hooking label propagation pays ~15-18 rounds of FULL-table scatter-min
# (~82M/s) + compression gathers (~50M/s) regardless of how fast the graph
# shrinks — the r4 bench measured 1.0-1.1M keys/s at 2^23, ~2x SLOWER than
# the single-thread native BFS baseline.  Star contraction (Kiveris et al.,
# SoCC 2014 — the same rewrite the sharded path uses, parallel/components.py)
# reformulates every round as 2-key sorts + cummax scans over the LIVE edge
# list, which shrinks geometrically: all work rides the ~290M keys/s sort
# instead of gather/scatter, and total volume is O(E), not O(rounds x M).

# plain numpy scalar: a jnp constant here would initialize a backend at
# import time
_VSENT = np.uint32(0xFFFFFFFF)


def _shift1(a, fill):
    return jnp.concatenate([jnp.full((1,), fill, a.dtype), a[:-1]])


@jax.jit
def _edges_from_nbr(nbr, active):
    """Active-active undirected edge list from the [8, M] adjacency —
    zero gathers.

    Membership of the FAR endpoint in the active set is decided by a
    sort semijoin: every active-active edge appears in both endpoints'
    columns, so after normalizing each directed edge to (min, max) and
    tagging which endpoint sourced it, an edge is active-active iff its
    sorted run contains both tags.  One 3-key sort replaces the [8, M]
    active[nbr] gather (67M random gathers at ~50M/s — 1.3s the sort
    does in ~0.25s).  Exactly one copy per undirected edge is kept.

    Returns (eu, ev, n_live): [8M] arrays, live edges compacted to the
    front, VSENT elsewhere.
    """
    d, M = nbr.shape
    src = jnp.broadcast_to(jnp.arange(M, dtype=I32)[None, :], nbr.shape)
    ok = (nbr >= 0) & active[None, :] & (nbr != src)
    u = jnp.where(ok, src, I32(0)).astype(jnp.uint32)
    v = jnp.where(ok, jnp.clip(nbr, 0, M - 1), I32(0)).astype(jnp.uint32)
    a = jnp.where(ok, jnp.minimum(u, v), _VSENT).reshape(-1)
    b = jnp.where(ok, jnp.maximum(u, v), _VSENT).reshape(-1)
    tag = jnp.where(ok, (u != jnp.minimum(u, v)).astype(jnp.uint32),
                    jnp.uint32(2)).reshape(-1)
    a2, b2, t2 = jax.lax.sort((a, b, tag), num_keys=3, is_stable=False)
    prev_same = (a2 == _shift1(a2, _VSENT)) & (b2 == _shift1(b2, _VSENT))
    keep = (prev_same & (t2 == 1) & (_shift1(t2, jnp.uint32(2)) == 0)
            & (a2 != _VSENT))
    eu = jnp.where(keep, a2, _VSENT)
    ev = jnp.where(keep, b2, _VSENT)
    eu, ev = jax.lax.sort((eu, ev), num_keys=2, is_stable=False)
    return eu, ev, jnp.sum(keep).astype(I32)


@partial(jax.jit, static_argnames=("large",))
def _star_round_single(eu, ev, large: bool):
    """One large/small-star rewrite over a single device's edge list.

    Same rewrite as parallel.components._star_emit, minus the bucketing
    and all-to-all: mirror, 2-key sort, per-source-run minimum via a
    cummax position fill, emit, dedup, compact.  Three sorts of the live
    width per round — every primitive is the fast one.

    Returns (eu', ev', [n_live, checksum]).
    """
    W = eu.shape[0]
    u = jnp.concatenate([eu, ev])
    v = jnp.concatenate([ev, eu])
    u, v = jax.lax.sort((u, v), num_keys=2, is_stable=False)
    valid = u != _VSENT
    start = (u != _shift1(u, _VSENT)) & valid
    pos = jnp.arange(u.shape[0], dtype=I32)
    last_start = jax.lax.cummax(jnp.where(start, pos, -1))
    vf = v[jnp.clip(last_start, 0, u.shape[0] - 1)].astype(I32)
    m = jnp.minimum(u.astype(I32), vf)
    m = jnp.where(valid, m, I32(-1)).astype(jnp.uint32)

    side = (v > u) if large else (v < u)
    emit_a = valid & side & (v != m)
    nu = jnp.where(emit_a, v, _VSENT)
    nv = jnp.where(emit_a, m, _VSENT)
    if not large:
        emit_b = start & (m != u)
        nu = jnp.concatenate([nu, jnp.where(emit_b, u, _VSENT)])
        nv = jnp.concatenate([nv, jnp.where(emit_b, m, _VSENT)])

    nu, nv = jax.lax.sort((nu, nv), num_keys=2, is_stable=False)
    fresh = (((nu != _shift1(nu, _VSENT)) | (nv != _shift1(nv, _VSENT)))
             & (nu != _VSENT))
    eu2 = jnp.where(fresh, nu, _VSENT)
    ev2 = jnp.where(fresh, nv, _VSENT)
    eu2, ev2 = jax.lax.sort((eu2, ev2), num_keys=2, is_stable=False)
    cnt = jnp.sum(fresh).astype(jnp.uint32)
    chk = jnp.sum(jnp.where(fresh, eu2 * jnp.uint32(0x85EBCA6B)
                            ^ ev2 * jnp.uint32(0xC2B2AE35), jnp.uint32(0)),
                  dtype=jnp.uint32)
    return eu2, ev2, jnp.stack([cnt, chk])


def _width_bucket(n: int) -> int:
    """Pow-4 width buckets bound the distinct jit shapes the round loop
    mints (each (width, phase) pair is one TPU compile)."""
    w = 1 << 12
    while w < n:
        w *= 4
    return w


def _star_contract(eu, ev, n_live: int, max_node: int, as_host=True):
    """Run large/small-star rounds to the fixed point; returns the final
    (child -> component-min) star edge lists (host arrays by default)."""
    width = _width_bucket(max(n_live, 1))
    if width < eu.shape[0]:
        eu = jax.lax.slice_in_dim(eu, 0, width)
        ev = jax.lax.slice_in_dim(ev, 0, width)
    prev_fp = None
    fps = []
    max_rounds = 4 * (int(np.ceil(np.log2(max(max_node, 2)))) + 2) ** 2 + 8
    done = False
    for rnd in range(max_rounds):
        large = rnd % 2 == 0
        eu, ev, stats = _star_round_single(eu, ev, large)
        fps.append((large, stats))
        # pipelined convergence: read round i's stats after dispatching
        # round i+1 (the ~40ms tunnel round trip overlaps device compute)
        if len(fps) >= 2:
            plarge, pstats = fps.pop(0)
            s = np.asarray(pstats)
            fp = (int(s[0]), int(s[1]))
            if not plarge:
                if fp == prev_fp:
                    done = True
                    break
                prev_fp = fp
            w = _width_bucket(max(fp[0], 1))
            if w < eu.shape[0]:
                eu = jax.lax.slice_in_dim(eu, 0, w)
                ev = jax.lax.slice_in_dim(ev, 0, w)
    if not done:
        for plarge, pstats in fps:
            s = np.asarray(pstats)
            if not plarge and (int(s[0]), int(s[1])) == prev_fp:
                done = True
        if not done:
            raise RuntimeError("star contraction did not converge")
    if as_host:
        return np.asarray(eu), np.asarray(ev)
    return eu, ev


def star_connected_labels(nbr, active) -> np.ndarray:
    """connected_labels via single-device star contraction.

    Contract identical to connected_labels: int32 min-label per active
    vertex, M on inactive rows.
    """
    M = int(nbr.shape[1])
    eu, ev, n_live = _edges_from_nbr(jnp.asarray(nbr), jnp.asarray(active))
    fu, fv = _star_contract(eu, ev, int(n_live), M)
    live = fu != 0xFFFFFFFF
    labels = np.where(np.asarray(active), np.arange(M, dtype=np.int64), M)
    np.minimum.at(labels, fu[live].astype(np.int64),
                  fv[live].astype(np.int64))
    return labels.astype(np.int32)


def walk_connected_labels(khi, klo, k: int, tables=None) -> np.ndarray:
    """Connected components of the FULL live table via chain walks.

    The de Bruijn graph is almost all chains; generic per-edge label
    propagation (hooking, star contraction) pays round x edge-volume on
    exactly the structure the successor function already encodes.  This
    path ranks the chains once (graph/rank.py, O(n) random accesses),
    contracts every chain to its TERMINAL node (one quotient vertex per
    chain — a few thousand, not n/B segments), and runs star contraction
    on the tiny deduped quotient graph (fw~rc orientation links +
    fork-incident links + ring links for the rare cycle walks).

    Precondition: the active set IS the set of non-sentinel table rows
    (true at every threshold level boundary after compaction — the
    in-between levels route to hooking).  Returns the exact
    connected_labels contract: min canonical index per key, M on
    sentinel rows.

    Parity: replaces the BFS of ComponentsBuilder.bfs
    (src/algo/ComponentsBuilder.java:220-269).
    """
    from . import contigs as ct
    from . import rank

    khi = jnp.asarray(khi)
    klo = jnp.asarray(klo)
    M = int(khi.shape[0])
    n = 2 * M
    if tables is None:
        tables = dbg.neighbor_tables(khi, klo, k)
    L, R = tables["left"], tables["right"]
    st = ct._succ_from_tables(khi, klo, L["idx"], L["is_fw"], L["ext"],
                              R["idx"], R["is_fw"], R["ext"], k)
    valid2 = st["valid2"]
    r = rank.chain_rank(st["succ"], valid2, need_rank=True)
    walkid = r["walkid"]
    s_total = int(r["res_stop"].shape[0])

    # fork-incident edges (canonical index space)
    fork_mask = ((L["ext"] == dbg.FORK) | (R["ext"] == dbg.FORK))
    n_forks = int(jnp.sum(fork_mask))
    fw_cap = 1 << max(6, int(np.ceil(np.log2(max(n_forks, 2)))))
    Lidx = jnp.where(L["present"], L["idx"], -1)
    Ridx = jnp.where(R["present"], R["idx"], -1)
    forks, fork_nbr = _compact_forks(fork_mask, Lidx, Ridx, fw_cap)

    eu, ev, n_live = _quotient_edges_term(
        walkid, r["term"], r["reached"], r["res_stop"], r["res_term"],
        forks, fork_nbr)
    fu, fv = _star_contract(eu, ev, int(n_live), n + s_total,
                            as_host=False)
    return np.asarray(_labels_from_star(
        walkid, r["term"], r["reached"], valid2, fu, fv, s_total))


@partial(jax.jit, static_argnames=("s_total",))
def _labels_from_star(walkid, term, reached, valid2, fu, fv,
                      s_total: int):
    """Labels from the star forest, all on device — the r5 host version
    paid ~4s of np.minimum.at over the [n + s_total] rep space.

    Rep space: node ids [0, n) for chain terminals, n + walk id for
    cycle walks."""
    n = walkid.shape[0]
    M = n // 2
    Q = n + s_total
    rep = _node_reps(walkid, term, reached)
    live = fu != _VSENT
    qroot = jnp.arange(Q, dtype=I32)
    qroot = qroot.at[jnp.where(live, fu.astype(I32), Q)].min(
        jnp.where(live, fv.astype(I32), Q), mode="drop")
    canon = jnp.arange(n, dtype=I32) % M
    sel = valid2 & (rep >= 0)
    m_rep = jnp.full(Q, M, I32)
    m_rep = m_rep.at[jnp.where(sel, rep, Q)].min(canon, mode="drop")
    comp_min = jnp.full(Q, M, I32)
    comp_min = comp_min.at[qroot].min(m_rep)
    rep_fw = jax.lax.slice_in_dim(rep, 0, M)
    act = jax.lax.slice_in_dim(valid2, 0, M)
    lab = comp_min[qroot[jnp.clip(rep_fw, 0, Q - 1)]]
    return jnp.where(act & (rep_fw >= 0), lab, M).astype(I32)


@jax.jit
def _node_reps(walkid, term, reached):
    """reached nodes -> chain terminal; cycle nodes -> n + walk id
    (term holds capped-doubling garbage when not reached — never use it
    there)."""
    n = walkid.shape[0]
    return jnp.where(reached & (term >= 0), term,
                     jnp.where(walkid >= 0, n + walkid, -1))


@jax.jit
def _quotient_edges_term(walkid, term, reached, res_stop, res_term,
                         forks, fork_nbr):
    """Quotient edge list over chain-terminal representatives.

    Within-chain links are self-loops by construction (every node of a
    chain shares its terminal rep) — only orientation links, fork links,
    and cycle-walk ring links survive.  One dedup sort shrinks the
    M-sized orientation list to ~#chains before star contraction.
    """
    n = walkid.shape[0]
    M = n // 2
    rep = _node_reps(walkid, term, reached)

    # orientation edges: fw(i) ~ rc(i) per canonical key
    rep_fw = jax.lax.slice_in_dim(rep, 0, M)
    rep_rc = jax.lax.slice_in_dim(rep, M, n)
    oe_ok = (rep_fw >= 0) & (rep_rc >= 0)
    oe_u = jnp.where(oe_ok, rep_fw, -1)
    oe_v = jnp.where(oe_ok, rep_rc, -1)

    # fork edges: (rep(fw_i), rep(fw_j)) for each present neighbor j of
    # a forked column i (both orientations of j are unioned by its own
    # orientation edge, so any one orientation suffices)
    fok = (forks < M) & (fork_nbr >= 0)
    fu = jnp.where(fok, rep_fw[jnp.clip(forks, 0, M - 1)][None, :], -1)
    fvv = jnp.where(fok, rep_fw[jnp.clip(fork_nbr, 0, M - 1)], -1)

    # ring links for cycle walks: (n + w) ~ rep(stop node of w) — only
    # where the stop node itself is a cycle node (rep in walk space).
    # Reached walks never need a link: all their nodes already share the
    # chain-terminal rep.
    s = res_stop.shape[0]
    rep_stop = rep[jnp.clip(res_stop, 0, n - 1)]
    cyc = (res_stop >= 0) & ~res_term & (rep_stop >= n)
    ce_u = jnp.where(cyc, n + jnp.arange(s, dtype=I32), -1)
    ce_v = jnp.where(cyc, rep_stop, -1)

    eu = jnp.concatenate([oe_u, fu.reshape(-1), ce_u])
    ev = jnp.concatenate([oe_v, fvv.reshape(-1), ce_v])
    ok = (eu >= 0) & (ev >= 0) & (eu != ev)
    eu = jnp.where(ok, eu.astype(jnp.uint32), _VSENT)
    ev = jnp.where(ok, ev.astype(jnp.uint32), _VSENT)
    # dedup + compact (the orientation edges alone are M-sized with huge
    # duplication — dedup shrinks the star input to ~chain count)
    eu, ev = jax.lax.sort((eu, ev), num_keys=2, is_stable=False)
    fresh = (((eu != _shift1(eu, _VSENT)) | (ev != _shift1(ev, _VSENT)))
             & (eu != _VSENT))
    eu = jnp.where(fresh, eu, _VSENT)
    ev = jnp.where(fresh, ev, _VSENT)
    eu, ev = jax.lax.sort((eu, ev), num_keys=2, is_stable=False)
    return eu, ev, jnp.sum(fresh).astype(I32)


@partial(jax.jit, static_argnames=("w",))
def _compact_forks(fork_mask, idx_l, idx_r, w: int):
    """[F<=w] fork column ids + their [8, w] neighbor indices."""
    M = fork_mask.shape[0]
    key = jnp.where(fork_mask, jnp.uint32(0), jnp.uint32(1))
    ids = jnp.arange(M, dtype=I32)
    k2, sids = jax.lax.sort((key, ids), num_keys=1, is_stable=True)
    cols = jnp.where(jax.lax.slice_in_dim(k2, 0, w) == 0,
                     jax.lax.slice_in_dim(sids, 0, w), 2 * M)
    safe = jnp.clip(cols, 0, M - 1)
    nbr8 = jnp.concatenate([idx_l[:, safe], idx_r[:, safe]], axis=0)
    return cols, jnp.where(cols[None, :] < M, nbr8, -1)


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
    # large tables on the chip: hooking with per-round dispatch.  (Star
    # contraction over the raw edge list was measured OUT here: a
    # converged star forest on a chain graph keeps ~n edges, so the live
    # set never shrinks and rounds pay full-width sorts + a 2W run-min
    # gather — 57s vs hooking's 7.4s at 2^23.  The full-live levels route
    # to walk_connected_labels upstream; this path only serves the
    # in-between threshold levels, where the active set is a strict
    # subset.)
    return hooking_connected_labels(nbr, active)


def hooking_connected_labels(nbr: jnp.ndarray, active: jnp.ndarray
                             ) -> np.ndarray:
    """The r4 hooking fixed point (scatter-min push + root hook +
    compression), kept callable for A/B measurement and as the
    star-contraction equality oracle in tests."""
    M = int(nbr.shape[1])
    active = jnp.asarray(active)
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


def _use_walk_cc(M: int) -> bool:
    """Large single-device TPU tables route full-live levels through the
    chain-walk components path (walk_connected_labels)."""
    try:
        platform = (jax.config.jax_default_device.platform
                    if jax.config.jax_default_device is not None
                    else jax.devices()[0].platform)
    except Exception:
        platform = jax.default_backend()
    return platform in ("tpu", "axon") and M > _FUSED_MAX


def _split_components_impl(keys64, counts, k, b1, b2,
                           labels_fn=None):
    explicit_fn = labels_fn is not None
    if labels_fn is None:
        labels_fn = connected_labels
    M0 = len(keys64)
    M = _table_bucket(M0)
    khi = np.full(M, bp.SENTINEL, dtype=np.uint32)
    klo = np.full(M, bp.SENTINEL, dtype=np.uint32)
    u = keys64.astype(np.uint64)
    khi[:M0] = (u >> np.uint64(32)).astype(np.uint32)
    klo[:M0] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    # adjacency is only needed by the per-edge label paths (hooking /
    # sharded star); the walk path derives everything from the tables
    nbr = None
    counts_full = np.zeros(M, dtype=np.int64)
    counts_full[:M0] = counts

    active = np.zeros(M, dtype=bool)
    active[:M0] = True
    full_live = True               # active == all non-sentinel rows?
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
            M = _table_bucket(max(M0, 1))
            khi = np.full(M, bp.SENTINEL, dtype=np.uint32)
            klo = np.full(M, bp.SENTINEL, dtype=np.uint32)
            u = keys64.astype(np.uint64)
            khi[:M0] = (u >> np.uint64(32)).astype(np.uint32)
            klo[:M0] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            nbr = None
            counts_full = np.zeros(M, dtype=np.int64)
            counts_full[:M0] = counts
            active = np.zeros(M, dtype=bool)
            active[:M0] = True
            full_live = True
        if full_live and not explicit_fn and _use_walk_cc(M):
            labels = walk_connected_labels(jnp.asarray(khi),
                                           jnp.asarray(klo), k)
        else:
            if nbr is None:
                nbr = adjacency(jnp.asarray(khi), jnp.asarray(klo), k)
            labels = labels_fn(nbr, jnp.asarray(active))
        full_live = False
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


def _table_bucket(n: int) -> int:
    """Graph-table padding from the {2^k, 3*2^(k-1)} family: 1.5x worst
    case instead of 2x — every graph stage scales with the PADDED size,
    so the r4 pow2 padding cost ~25% extra sort/walk work on typical
    tables (4.97M live keys padded to 8.39M instead of 6.29M)."""
    from ..ops.count import _bucket_size

    return max(16, _bucket_size(n))
