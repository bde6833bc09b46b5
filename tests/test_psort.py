"""Blocked bitonic sort (ops/psort.py) vs oracle, on CPU.

The Pallas tile kernels run in interpret mode here; the TPU compiled path
executes the identical stage list (the network is static), so agreement
in interpret mode plus the XLA-exchange algebra covers the algorithm.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metafast_tpu.ops import psort


def _oracle(hi, lo):
    order = np.lexsort((lo, hi))
    return hi[order], lo[order]


def _rand_pairs(rng, n, hi_space=1 << 12, sentinel_frac=0.0):
    hi = rng.integers(0, hi_space, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 16, n).astype(np.uint32)
    if sentinel_frac:
        m = rng.random(n) < sentinel_frac
        hi[m] = np.uint32(0xFFFFFFFF)
        lo[m] = np.uint32(0xFFFFFFFF)
    return hi, lo


@pytest.mark.parametrize("logn", [10, 12, 13])
def test_blocked_sort_matches_oracle(logn):
    rng = np.random.default_rng(logn)
    n = 1 << logn
    hi, lo = _rand_pairs(rng, n, sentinel_frac=0.1)
    shi, slo = psort.sort_arrays_blocked(
        (jnp.asarray(hi), jnp.asarray(lo)), log_block=10, interpret=True)
    ohi, olo = _oracle(hi, lo)
    np.testing.assert_array_equal(np.asarray(shi), ohi)
    np.testing.assert_array_equal(np.asarray(slo), olo)


def test_blocked_sort_heavy_duplicates():
    rng = np.random.default_rng(7)
    n = 1 << 12
    hi, lo = _rand_pairs(rng, n, hi_space=8)
    lo = (lo % 4).astype(np.uint32)
    shi, slo = psort.sort_arrays_blocked(
        (jnp.asarray(hi), jnp.asarray(lo)), log_block=10, interpret=True)
    ohi, olo = _oracle(hi, lo)
    np.testing.assert_array_equal(np.asarray(shi), ohi)
    np.testing.assert_array_equal(np.asarray(slo), olo)


def test_blocked_sort_payload_rides_with_keys():
    rng = np.random.default_rng(3)
    n = 1 << 12
    # unique keys so the payload mapping is deterministic
    perm = rng.permutation(n).astype(np.uint32)
    hi = perm >> np.uint32(8)
    lo = perm & np.uint32(0xFF)
    cnt = (perm * np.uint32(2654435761)).astype(np.uint32)
    shi, slo, scnt = psort.sort_arrays_blocked(
        (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(cnt)),
        log_block=10, interpret=True)
    order = np.lexsort((lo, hi))
    np.testing.assert_array_equal(np.asarray(shi), hi[order])
    np.testing.assert_array_equal(np.asarray(slo), lo[order])
    np.testing.assert_array_equal(np.asarray(scnt), cnt[order])


def test_blocked_sort_duplicate_keys_preserve_payload_multiset():
    """Regression (r3 advisor): with duplicate (hi, lo) keys and a payload,
    the in-VMEM compare-exchange must keep tied elements in place — the
    old `lt == dir` comparator duplicated one payload and destroyed the
    other on every tie."""
    rng = np.random.default_rng(17)
    n = 1 << 12
    hi, lo = _rand_pairs(rng, n, hi_space=8)
    lo = (lo % 4).astype(np.uint32)          # heavy (hi, lo) duplication
    pay = np.arange(n, dtype=np.uint32)      # all-distinct payloads
    shi, slo, spay = psort.sort_arrays_blocked(
        (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay)),
        log_block=10, interpret=True)
    shi, slo, spay = map(np.asarray, (shi, slo, spay))
    ohi, olo = _oracle(hi, lo)
    np.testing.assert_array_equal(shi, ohi)
    np.testing.assert_array_equal(slo, olo)
    # global payload multiset preserved (all-distinct => set equality)
    np.testing.assert_array_equal(np.sort(spay), pay)
    # per-key payload multisets preserved
    key = (hi.astype(np.uint64) << np.uint64(32)) | lo
    skey = (shi.astype(np.uint64) << np.uint64(32)) | slo
    for kv in np.unique(key):
        np.testing.assert_array_equal(
            np.sort(pay[key == kv]), np.sort(spay[skey == kv]))


def test_blocked_sort_already_sorted_and_reversed():
    n = 1 << 11
    hi = np.arange(n, dtype=np.uint32) >> np.uint32(4)
    lo = np.arange(n, dtype=np.uint32)
    for h, l in [(hi, lo), (hi[::-1].copy(), lo[::-1].copy())]:
        shi, slo = psort.sort_arrays_blocked(
            (jnp.asarray(h), jnp.asarray(l)), log_block=10, interpret=True)
        ohi, olo = _oracle(h, l)
        np.testing.assert_array_equal(np.asarray(shi), ohi)
        np.testing.assert_array_equal(np.asarray(slo), olo)


def test_sort_arrays_fallback_non_pow2():
    rng = np.random.default_rng(11)
    n = 3000
    hi, lo = _rand_pairs(rng, n)
    shi, slo = psort.sort_arrays((jnp.asarray(hi), jnp.asarray(lo)))
    ohi, olo = _oracle(hi, lo)
    np.testing.assert_array_equal(np.asarray(shi), ohi)
    np.testing.assert_array_equal(np.asarray(slo), olo)
