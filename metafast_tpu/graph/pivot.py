"""Pivot-anchored component extraction.

Parity: src/algo/ComponentsBuilderAroundPivot.java (depth == 1) and
DeepComponentsBuilderAroundPivot.java (depth > 1): BFS from each
unprocessed pivot k-mer; unique continuations extend freely, forks are
entered only via a path probe that reaches another pivot (within `depth`
k-mers for the deep variant, choosing the pivot-richest path).

Determinism spec (the reference iterates hash maps, so its component
membership depends on hash layout; ours is fixed): pivots are processed
in ascending canonical-key order, fork branches in neighbor-nucleotide
order, and deep probes prefer the first-found best path.  Failed probe
paths stay consumed (marked visited) exactly like the reference's dfs
(ComponentsBuilderAroundPivot.java:360-428).

Deviations from reference bugs (documented, not replicated):
  - DeepComponentsBuilderAroundPivot.bfs adds a path k-mer's *pivot map
    value* to the component weight (:169-175) and bumps n_pivot once per
    path k-mer (:182); we add the graph value and bump once per path.

Scale envelope: neighbor tables are precomputed vectorized (one
searchsorted over all 8 neighbor sets), so the per-node cost is pure
queue-chasing Python (~1-5 us/node).  Graphs up to a few million k-mers
traverse in seconds; this matches the tool's niche use (pivot sets are
statistically filtered k-mers, not whole samples).  The bulk pipeline
path (graph/components.py) is the device label-propagation instead.

The neighbor tables are precomputed vectorized (8 canonical neighbors
via numpy bit math + binary search), so the traversal itself is pure
index chasing.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_MASKS = [
    (0x3333333333333333, 0xCCCCCCCCCCCCCCCC, 2),
    (0x0F0F0F0F0F0F0F0F, 0xF0F0F0F0F0F0F0F0, 4),
    (0x00FF00FF00FF00FF, 0xFF00FF00FF00FF00, 8),
    (0x0000FFFF0000FFFF, 0xFFFF0000FFFF0000, 16),
    (0x00000000FFFFFFFF, 0xFFFFFFFF00000000, 32),
]


def rc_np(keys: np.ndarray, k: int) -> np.ndarray:
    """Vectorized reverse complement (KmerOperations.rc)."""
    x = np.asarray(keys, dtype=np.uint64)
    for lo, hi, s in _MASKS:
        x = ((x & np.uint64(lo)) << np.uint64(s)) \
            | ((x & np.uint64(hi)) >> np.uint64(s))
    x = ~x
    return (x >> np.uint64(64 - 2 * k)).astype(np.int64)


def canonical_np(keys: np.ndarray, k: int) -> np.ndarray:
    r = rc_np(keys, k)
    return np.minimum(np.asarray(keys, dtype=np.int64), r)


def right_neighbors_np(keys: np.ndarray, k: int) -> np.ndarray:
    """[N, 4] canonical right neighbors (KmerOperations.rightNeighbours)."""
    mask = np.uint64((1 << (2 * k)) - 1)
    base = (np.asarray(keys, dtype=np.uint64) << np.uint64(2)) & mask
    cols = [canonical_np((base | np.uint64(nuc)).astype(np.int64), k)
            for nuc in range(4)]
    return np.stack(cols, axis=1)


def left_neighbors_np(keys: np.ndarray, k: int) -> np.ndarray:
    """[N, 4] canonical left neighbors (KmerOperations.leftNeighbours)."""
    base = np.asarray(keys, dtype=np.uint64) >> np.uint64(2)
    cols = [canonical_np(
        (base | (np.uint64(nuc) << np.uint64(2 * (k - 1)))).astype(np.int64), k)
        for nuc in range(4)]
    return np.stack(cols, axis=1)


@dataclass
class PivotComponent:
    kmers: np.ndarray          # sorted int64 canonical keys
    weight: int
    n_pivot: int
    used_freq_threshold: int = 1

    @property
    def size(self) -> int:
        return len(self.kmers)


class _Graph:
    """Index-space view: neighbor indices (or -1) per key."""

    def __init__(self, keys: np.ndarray, counts: np.ndarray, k: int):
        self.keys = keys
        self.counts = counts
        self.k = k
        self.right_keys = right_neighbors_np(keys, k)
        self.left_keys = left_neighbors_np(keys, k)
        self.right = self._index(self.right_keys)
        self.left = self._index(self.left_keys)
        self.visited = np.zeros(len(keys), dtype=bool)

    def _index(self, nbr_keys: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.keys, nbr_keys)
        idx = np.clip(idx, 0, max(len(self.keys) - 1, 0))
        found = (self.keys[idx] == nbr_keys) if len(self.keys) else \
            np.zeros_like(idx, dtype=bool)
        return np.where(found, idx, -1).astype(np.int64)

    def live(self, side: np.ndarray, i: int) -> list[int]:
        """Unvisited neighbor indices on one side (with multiplicity)."""
        out = []
        for j in side[i]:
            if j >= 0 and not self.visited[j]:
                out.append(int(j))
        return out

    def away_side(self, i: int, prev_key: int):
        """Continuation side given the predecessor's canonical key.

        Mirrors the reference's two scans (left match -> go right, right
        match -> go left; the later scan wins,
        ComponentsBuilderAroundPivot.java:283-296)."""
        side = None
        if prev_key in self.left_keys[i]:
            side = self.right
        if prev_key in self.right_keys[i]:
            side = self.left
        return side


def split_around_pivot(keys: np.ndarray, counts: np.ndarray, k: int,
                       pivot_keys: np.ndarray, depth: int = 1
                       ) -> list[PivotComponent]:
    """All pivot components of a counted graph (sorted keys required)."""
    keys = np.asarray(keys, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    g = _Graph(keys, counts, k)

    piv = np.zeros(len(keys), dtype=bool)
    pidx = np.searchsorted(keys, np.asarray(pivot_keys, dtype=np.int64))
    pidx = np.clip(pidx, 0, max(len(keys) - 1, 0))
    if len(keys):
        ok = keys[pidx] == np.asarray(pivot_keys, dtype=np.int64)
        piv[pidx[ok]] = True
    pivot_done = np.zeros(len(keys), dtype=bool)

    out = []
    for start in np.nonzero(piv)[0]:
        if pivot_done[start] or g.visited[start]:
            continue
        out.append(_bfs(g, int(start), piv, pivot_done, depth))
    out.sort(key=lambda c: (c.used_freq_threshold, -c.weight, -c.size,
                            int(c.kmers[0]) if c.size else 0))
    return out


def _bfs(g: _Graph, start: int, piv: np.ndarray, pivot_done: np.ndarray,
         depth: int) -> PivotComponent:
    members: list[int] = []
    weight = 0
    n_pivot = 0
    queue: list[tuple[int, int]] = []   # (index, parent key)

    def visit(i: int) -> None:
        nonlocal weight, n_pivot
        g.visited[i] = True
        members.append(i)
        weight += int(g.counts[i])
        if piv[i] and not pivot_done[i]:
            pivot_done[i] = True
            n_pivot += 1

    def probe(j: int, cur_key: int) -> tuple[int, list[int]]:
        """Walk the unique continuation from fork branch j; mark the path
        visited; return (#pivots on path, path indices)."""
        if depth == 1:
            return _probe_line(g, j, cur_key, piv, pivot_done)
        return _probe_deep(g, j, cur_key, piv, depth)

    def expand(i: int, side) -> None:
        """One side of the start k-mer, or the away side in the main loop."""
        nonlocal n_pivot
        nbrs = [j for j in side[i] if j >= 0 and not g.visited[j]]
        if not nbrs:
            return
        cur_key = int(g.keys[i])
        if len(nbrs) == 1:
            j = nbrs[0]
            visit(j)
            queue.append((j, cur_key))
        else:
            for j in nbrs:
                if g.visited[j]:
                    continue
                n_piv, path = probe(j, cur_key)
                if n_piv > 0:
                    visit(j)
                    n_pivot += n_piv
                    for p in path:
                        _add_path_member(p)
                    if len(path) >= 2:
                        queue.append((path[-1], int(g.keys[path[-2]])))
                    elif len(path) == 1:
                        queue.append((path[0], int(g.keys[j])))
                    else:
                        queue.append((j, cur_key))

    def _add_path_member(p: int) -> None:
        nonlocal weight
        members.append(p)
        weight += int(g.counts[p])

    visit(start)
    expand(start, g.right)
    expand(start, g.left)

    while queue:
        i, prev_key = queue.pop(0)
        side = g.away_side(i, prev_key)
        if side is None:
            continue
        expand(i, side)

    kmers = np.sort(g.keys[np.asarray(sorted(set(members)), dtype=np.int64)])
    return PivotComponent(kmers=kmers, weight=weight, n_pivot=n_pivot)


def _probe_line(g: _Graph, j: int, parent_key: int, piv: np.ndarray,
                pivot_done: np.ndarray) -> tuple[int, list[int]]:
    """depth==1 probe: follow unique continuations, consuming the path
    (ComponentsBuilderAroundPivot.dfs).  Marks pivots found as done."""
    path: list[int] = []
    n_pivot = 0
    cur = j
    prev_key = parent_key
    # the branch head itself is NOT consumed by a failed probe
    # (the reference dfs never marks `neighbour`, only path k-mers);
    # mark it temporarily so a cycle cannot re-enter it, restore below
    g.visited[j] = True
    while True:
        side = g.away_side(cur, prev_key)
        if side is None:
            break
        nbrs = [x for x in side[cur] if x >= 0 and not g.visited[x]]
        if len(nbrs) != 1:
            break
        nxt = nbrs[0]
        path.append(nxt)
        g.visited[nxt] = True
        if piv[nxt] and not pivot_done[nxt]:
            pivot_done[nxt] = True
            n_pivot += 1
        prev_key = int(g.keys[cur])
        cur = nxt
    if n_pivot == 0:
        g.visited[j] = False
    return n_pivot, path


def _probe_deep(g: _Graph, j: int, parent_key: int, piv: np.ndarray,
                depth: int) -> tuple[int, list[int]]:
    """depth>1 probe: exhaustive DFS up to `depth` k-mers, keep the
    pivot-richest path (DeepComponentsBuilderAroundPivot.dfs)."""
    best = {"n": 0, "path": []}

    def rec(cur: int, prev_key: int, path: list[int], n_piv: int,
            avail: int) -> None:
        if avail == 0:
            if n_piv > best["n"]:
                best["n"] = n_piv
                best["path"] = list(path)
            return
        side = g.away_side(cur, prev_key)
        nbrs = [] if side is None else \
            [x for x in side[cur] if x >= 0 and not g.visited[x]
             and x not in path and x != j]
        if not nbrs:
            if n_piv > best["n"]:
                best["n"] = n_piv
                best["path"] = list(path)
            return
        for x in nbrs:
            rec(x, int(g.keys[cur]), path + [x],
                n_piv + (1 if piv[x] else 0), avail - 1)

    g.visited[j] = True
    rec(j, parent_key, [], 0, depth)
    if best["n"] == 0:
        # deep probes are read-only on failure (the reference's deep dfs
        # never mutates hm; only the chosen best path is consumed)
        g.visited[j] = False
        return 0, []
    for p in best["path"]:
        g.visited[p] = True
    return best["n"], best["path"]
