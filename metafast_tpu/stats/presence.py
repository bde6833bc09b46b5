"""Per-sample presence/count matrices over a unified sorted k-mer key axis.

The reference stores per-sample presence as striped bitset hash maps
(BigLong2BitShortaHashMap, src/structures/map/Long2BitShortaHashMap.java)
filled by loadBitShortaKmers (src/io/IOUtils.java:507-539).  The TPU-native
layout is dense and sort-based: one sorted key array [N] (the union of all
samples' k-mers) plus a presence matrix [N, S] — columns are samples, rows
align with keys — which makes group cardinalities row-wise popcounts /
segment sums that vectorize trivially.
"""

from __future__ import annotations

import numpy as np

from ..io import binfmt


def load_sample_tables(files, threshold: int = 0):
    """[(keys_sorted, counts)] per file, keeping records with count > threshold.

    Parity: per-record filter in Kmers2HMWorker (value > freqThreshold).
    """
    out = []
    for f in files:
        keys, counts = binfmt.read_kmers_bin(str(f))
        keep = counts > threshold
        keys, counts = keys[keep], counts[keep]
        order = np.argsort(keys)
        out.append((keys[order], counts[order].astype(np.int64)))
    return out


def union_keys(tables) -> np.ndarray:
    if not tables:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate([t[0] for t in tables]))


def presence_matrix(tables, keys: np.ndarray) -> np.ndarray:
    """bool [N, S]: keys x samples membership."""
    N, S = len(keys), len(tables)
    pres = np.zeros((N, S), dtype=bool)
    for j, (sk, _sc) in enumerate(tables):
        idx = np.searchsorted(keys, sk)
        pres[idx, j] = True
    return pres


def count_matrix(tables, keys: np.ndarray) -> np.ndarray:
    """int64 [N, S]: per-sample count of each key (0 when absent)."""
    N, S = len(keys), len(tables)
    cnt = np.zeros((N, S), dtype=np.int64)
    for j, (sk, sc) in enumerate(tables):
        idx = np.searchsorted(keys, sk)
        cnt[idx, j] = sc
    return cnt
