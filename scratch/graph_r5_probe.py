"""r5 probe: chain_structure with splitter-walk ranking at 2^23 (real TPU).

Same synthetic near-chain table as the r4 probes; compares the new walk
path (graph/rank.py) against the r4 pointer doubling.
"""
import sys
import time

import numpy as np

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 23
K = 31


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from numpy.lib.stride_tricks import sliding_window_view

    from metafast_tpu.core import bitpack as bp
    from metafast_tpu.utils.device import force_sync
    from metafast_tpu.graph import contigs as ct, dbg, rank

    M = 1 << LOG2M
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, M + K, dtype=np.uint8)
    mask = np.uint64((1 << (2 * K)) - 1)
    win = sliding_window_view(genome.astype(np.uint64), K)[:M]
    pw = np.uint64(4) ** np.arange(K - 1, -1, -1, dtype=np.uint64)
    fw = (win * pw[None, :]).sum(axis=1, dtype=np.uint64) & mask
    rc = ((3 - win[:, ::-1]).astype(np.uint64) * pw[None, :]).sum(
        axis=1, dtype=np.uint64) & mask
    keys = np.unique(np.minimum(fw, rc))
    M0 = len(keys)
    Mpad = 1 << max(4, int(np.ceil(np.log2(M0))))
    log(f"unique keys {M0} -> padded 2^{int(np.log2(Mpad))}")
    khi = np.full(Mpad, bp.SENTINEL, dtype=np.uint32)
    klo = np.full(Mpad, bp.SENTINEL, dtype=np.uint32)
    khi[:M0] = (keys >> np.uint64(32)).astype(np.uint32)
    klo[:M0] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    dkhi = jax.device_put(jnp.asarray(khi))
    dklo = jax.device_put(jnp.asarray(klo))
    force_sync(dkhi, dklo)

    def run_full():
        r = ct.chain_structure(dkhi, dklo, K)
        force_sync(*[v for v in r.values() if hasattr(v, "ndim")])
        return r

    t0 = time.perf_counter()
    r = run_full()
    log(f"chain_structure (walk) cold: {time.perf_counter() - t0:.1f}s")
    for i in range(3):
        t0 = time.perf_counter()
        r = run_full()
        dt = time.perf_counter() - t0
        log(f"chain_structure (walk) warm: {dt:.2f}s "
            f"({2 * Mpad / dt / 1e6:.1f} M nodes/s)")

    # A/B: the same table through the r4 doubling
    t = dbg.neighbor_tables(dkhi, dklo, K)
    L, R = t["left"], t["right"]
    st = ct._succ_from_tables(dkhi, dklo, L["idx"], L["is_fw"], L["ext"],
                              R["idx"], R["is_fw"], R["ext"], K)
    force_sync(st["succ"])

    def run_doubling():
        o = ct._doubling(st["succ"])
        force_sync(*o)
        return o

    t0 = time.perf_counter()
    o = run_doubling()
    log(f"doubling cold: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    o = run_doubling()
    log(f"doubling warm: {time.perf_counter() - t0:.2f}s")

    def run_walk():
        rr = rank.chain_rank(st["succ"], st["valid2"])
        force_sync(rr["term"], rr["dist"], rr["reached"])
        return rr

    t0 = time.perf_counter()
    rr = run_walk()
    log(f"rank-only warm-ish: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    rr = run_walk()
    log(f"rank-only warm: {time.perf_counter() - t0:.2f}s")

    v = np.asarray(st["valid2"])
    term_d, dist_d, reach_d = [np.asarray(x) for x in o]
    term = np.asarray(rr["term"])
    dist = np.asarray(rr["dist"])
    reached = np.asarray(rr["reached"])
    mr = v & reach_d
    assert np.array_equal(reached[v], reach_d[v])
    assert np.array_equal(term[mr], term_d[mr])
    assert np.array_equal(dist[mr], dist_d[mr])
    log("EQ vs doubling on valid rows")


if __name__ == "__main__":
    main()
