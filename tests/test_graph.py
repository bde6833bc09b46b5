"""Contig extraction and component splitting vs the python oracle."""

import numpy as np
import pytest

from metafast_tpu.graph.contigs import build_contigs
from metafast_tpu.graph.components import split_components
from metafast_tpu.oracle import reference as oracle


def make_counts(reads, k, b=0):
    counts = oracle.count_reads(reads, k)
    return oracle.filter_counts(counts, b)


def as_table(counts):
    keys = np.array(sorted(counts), dtype=np.int64)
    vals = np.array([counts[int(key)] for key in keys], dtype=np.int32)
    return keys, vals


def norm_contigs(contigs, k):
    """Canonicalize contig set: min(seq, rc(seq)) string + weights."""
    out = []
    for seq, avg, mn, mx in contigs:
        comp = {"A": "T", "T": "A", "G": "C", "C": "G"}
        rcs = "".join(comp[c] for c in reversed(seq))
        out.append((min(seq, rcs), avg, mn, mx))
    return sorted(out)


@pytest.mark.parametrize("k,nreads,readlen,seed", [
    (5, 30, 25, 0),
    (5, 10, 60, 1),
    (7, 40, 30, 2),
    (4, 25, 20, 3),   # even k: palindromes possible
    (31, 12, 70, 4),
    (16, 12, 50, 5),  # even k straddling the 32-bit word boundary
])
def test_contigs_match_oracle(k, nreads, readlen, seed):
    rng = np.random.default_rng(seed)
    reads = ["".join(rng.choice(list("AGCT"), size=readlen)) for _ in range(nreads)]
    # duplicate some reads so counts vary
    reads += reads[: nreads // 3]
    counts = make_counts(reads, k)
    want = norm_contigs(oracle.build_contigs(counts, k, k), k)

    keys, vals = as_table(counts)
    got = norm_contigs(build_contigs(keys, vals, k, k), k)
    assert got == want


def test_contigs_len_threshold():
    rng = np.random.default_rng(10)
    reads = ["".join(rng.choice(list("AGCT"), size=40)) for _ in range(20)]
    counts = make_counts(reads, 5)
    keys, vals = as_table(counts)
    for l in (5, 10, 20):
        want = norm_contigs(oracle.build_contigs(counts, 5, l), 5)
        got = norm_contigs(build_contigs(keys, vals, 5, l), 5)
        assert got == want


def norm_comps(comps):
    """Order-insensitive component multiset: (sorted kmers tuple, weight, thr)."""
    return sorted((tuple(sorted(int(x) for x in km)), w, t) for km, w, t in comps)


@pytest.mark.parametrize("k,b1,b2,seed", [
    (5, 1, 10000, 0),      # no split
    (5, 3, 20, 1),         # drop small, split big
    (7, 2, 15, 2),
    (31, 1, 30, 3),
    (4, 1, 12, 4),         # even k
])
def test_components_match_oracle(k, b1, b2, seed):
    rng = np.random.default_rng(seed)
    reads = ["".join(rng.choice(list("AGCT"), size=35)) for _ in range(25)]
    reads += reads[:10] + reads[:5]   # multiplicity for thresholds
    counts = oracle.count_reads(reads, k)
    want_raw = oracle.split_components(counts, k, b1, b2)
    want = norm_comps([(kset, w, t) for kset, w, t in want_raw])

    keys, vals = as_table(counts)
    got_raw = split_components(keys, vals, k, b1, b2)
    got = norm_comps([(c.kmers, c.weight, c.used_freq_threshold) for c in got_raw])
    assert got == want
