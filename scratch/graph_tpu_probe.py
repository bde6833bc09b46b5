"""Probe: run the graph stages piece by piece on the real TPU.

Finds exactly which jitted piece kills the compile helper, at which size.
Usage: python scratch/graph_tpu_probe.py [log2_M]
"""
import sys
import time

import numpy as np

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 22
K = 31


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from metafast_tpu.core import bitpack as bp
    from metafast_tpu.utils.device import force_sync

    M = 1 << LOG2M
    log(f"building synthetic sorted key table M=2^{LOG2M}")
    rng = np.random.default_rng(0)
    # realistic: keys from a genome so the graph has real chains
    genome = rng.integers(0, 4, M + K, dtype=np.uint8)
    import metafast_tpu.oracle.reference as oracle
    # build canonical keys from genome windows quickly via numpy
    base = genome.astype(np.uint64)
    fw = np.zeros(M, dtype=np.uint64)
    acc = np.uint64(0)
    mask = np.uint64((1 << (2 * K)) - 1)
    # vectorized rolling: use strides
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(base, K)[:M]  # [M, K]
    pw = (np.uint64(4) ** np.arange(K - 1, -1, -1, dtype=np.uint64))
    fw = (win * pw[None, :]).sum(axis=1, dtype=np.uint64) & mask
    # rc: complement 3-x, reversed
    rcwin = 3 - win[:, ::-1]
    rc = (rcwin.astype(np.uint64) * pw[None, :]).sum(axis=1, dtype=np.uint64) & mask
    keys = np.minimum(fw, rc)
    keys = np.unique(keys)
    M0 = len(keys)
    Mpad = 1 << max(4, int(np.ceil(np.log2(M0))))
    log(f"unique keys {M0} -> padded table {Mpad} (2^{int(np.log2(Mpad))})")
    khi = np.full(Mpad, bp.SENTINEL, dtype=np.uint32)
    klo = np.full(Mpad, bp.SENTINEL, dtype=np.uint32)
    khi[:M0] = (keys >> np.uint64(32)).astype(np.uint32)
    klo[:M0] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    dkhi = jax.device_put(jnp.asarray(khi))
    dklo = jax.device_put(jnp.asarray(klo))
    force_sync(dkhi, dklo)
    log(f"table staged on {dkhi.devices()}")

    from metafast_tpu.graph import dbg, lookup

    # piece 1: neighbor values
    t0 = time.perf_counter()
    vals = {}
    for side in ("left", "right"):
        r = dbg._neighbor_values(dkhi, dklo, K, side)
        force_sync(*r)
        vals[side] = r
        log(f"_neighbor_values {side}: compiled+ran in {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()

    # piece 2: lookup.find (sort-merge join at this size)
    finds = {}
    for side in ("left", "right"):
        vh, vl, ch, cl = vals[side]
        idx, present = lookup.find(dkhi, dklo, ch, cl)
        force_sync(idx, present)
        finds[side] = (idx, present)
        log(f"lookup.find {side}: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()

    # piece 3: ext codes
    exts = {}
    for side in ("left", "right"):
        vh, vl, ch, cl = vals[side]
        idx, present = finds[side]
        sent = jnp.asarray(bp.is_sentinel(dkhi, dklo))
        is_fw, present2, ext = dbg._ext_codes(vh, vl, ch, cl, present, sent)
        force_sync(is_fw, present2, ext)
        exts[side] = (idx, is_fw, ext, present2)
        log(f"_ext_codes {side}: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()

    # piece 4: succ + pointer doubling (r5: _chain_from_tables split
    # into _succ_from_tables + _doubling; the walk path is the default)
    from metafast_tpu.graph.contigs import _doubling, _succ_from_tables
    Lidx, Lisfw, Lext, _ = exts["left"]
    Ridx, Risfw, Rext, _ = exts["right"]
    st = _succ_from_tables(dkhi, dklo, Lidx, Lisfw, Lext,
                           Ridx, Risfw, Rext, K)
    force_sync(*[v for v in st.values()])
    o = _doubling(st["succ"])
    force_sync(*o)
    log(f"succ + doubling: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()

    # timed re-runs (cached compiles)
    from metafast_tpu.graph.contigs import chain_structure
    def contigs():
        r = chain_structure(dkhi, dklo, K)
        force_sync(*[v for v in r.values()])
    for i in range(3):
        t0 = time.perf_counter()
        contigs()
        dt = time.perf_counter() - t0
        log(f"chain_structure full run {i}: {dt*1e3:.0f}ms "
            f"({Mpad/dt/1e6:.1f}M nodes/s)")

    # piece 5: components adjacency + label prop
    from metafast_tpu.graph.components import (_mask_adjacency,
                                               connected_labels)
    t0 = time.perf_counter()
    nbr = _mask_adjacency(exts["left"][0], exts["right"][0],
                          exts["left"][3], exts["right"][3])
    force_sync(nbr)
    log(f"_mask_adjacency: {time.perf_counter()-t0:.1f}s")
    active = ~bp.is_sentinel(khi, klo)
    t0 = time.perf_counter()
    labels = connected_labels(nbr, active)
    log(f"connected_labels (compile+run): {time.perf_counter()-t0:.1f}s")
    for i in range(2):
        t0 = time.perf_counter()
        labels = connected_labels(nbr, active)
        dt = time.perf_counter() - t0
        log(f"label prop run {i}: {dt*1e3:.0f}ms ({Mpad/dt/1e6:.1f}M nodes/s)")
    log("DONE")


if __name__ == "__main__":
    main()
