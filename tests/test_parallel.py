"""Sharded multi-device k-mer counting vs the single-device counter."""

import numpy as np
import pytest

import jax

from metafast_tpu.ops.count import KmerCounter
from metafast_tpu.parallel.count import make_mesh, sharded_count, gather_counts


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@needs_8
@pytest.mark.parametrize("seed,B,L,k", [(0, 64, 40, 21), (1, 128, 90, 31),
                                        (2, 64, 33, 1)])
def test_sharded_matches_single(seed, B, L, k):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    lengths = rng.integers(k, L + 1, B).astype(np.int32)
    mesh = make_mesh(8)
    hi, lo, cnt, nuq, drop = sharded_count(codes, lengths, k=k, mesh=mesh)
    keys, counts = gather_counts(hi, lo, cnt)

    ref = KmerCounter(k, capacity=1 << 12)
    ref.add_batch(codes, lengths)
    rk, rc = ref.finish()
    assert np.array_equal(keys, rk)
    assert np.array_equal(counts, rc)
    assert int(np.asarray(drop).sum()) == 0


@needs_8
def test_capacity_overflow_reported():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (64, 40), dtype=np.uint8)
    lengths = np.full(64, 40, dtype=np.int32)
    mesh = make_mesh(8)
    hi, lo, cnt, nuq, drop = sharded_count(codes, lengths, k=21, mesh=mesh,
                                           cap_per_shard=2)
    assert int(np.asarray(drop).sum()) > 0


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)


def test_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


@needs_8
def test_sharded_components_match():
    import jax.numpy as jnp
    import metafast_tpu.core.bitpack as bp
    from metafast_tpu.graph.components import adjacency, connected_labels
    from metafast_tpu.parallel.components import sharded_connected_labels
    from metafast_tpu.utils.kmers import sequence_kmers

    seqs = ["ACGGTCAGATTCAGGACTT", "GGTTGACCAGTAGGCAT", "TTTTTCCCCGGGAAA"]
    k = 9
    keys = np.unique(np.concatenate([sequence_kmers(s, k) for s in seqs]))
    M0 = len(keys)
    M = 64
    khi = np.full(M, bp.SENTINEL, np.uint32)
    klo = np.full(M, bp.SENTINEL, np.uint32)
    u = keys.astype(np.uint64)
    khi[:M0] = (u >> np.uint64(32)).astype(np.uint32)
    klo[:M0] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    nbr = np.asarray(adjacency(jnp.asarray(khi), jnp.asarray(klo), k))
    active = np.zeros(M, bool)
    active[:M0] = True

    single = np.asarray(connected_labels(jnp.asarray(nbr), jnp.asarray(active)))
    sharded = sharded_connected_labels(nbr, active, make_mesh(8))
    assert np.array_equal(single, sharded)
