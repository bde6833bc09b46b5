"""Probe which piece of _find_merge kills the remote compile helper.

Usage: python scratch/find_merge_probe.py <log2_M> [piece...]
pieces: sort3, ffill, restore, fused   (default: sort3 ffill restore)
"""
import sys
import time

import numpy as np

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 22
PIECES = sys.argv[2:] or ["sort3", "ffill", "restore"]
K = 31


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from metafast_tpu.core import bitpack as bp
    from metafast_tpu.graph import lookup
    from metafast_tpu.utils.device import force_sync

    M = 1 << LOG2M
    T, Q = M, 4 * M
    n = T + Q
    rng = np.random.default_rng(0)
    log(f"T=2^{LOG2M} Q=4T n={n}")

    chi = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.uint32))
    clo = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.uint32))
    src = jnp.asarray(np.arange(n, dtype=np.int32))
    force_sync(chi, clo, src)

    if "sort3" in PIECES:
        t0 = time.perf_counter()
        s = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3,
                                                 is_stable=False))(chi, clo, src)
        force_sync(*s)
        log(f"3-key sort at n={n}: {time.perf_counter()-t0:.1f}s")
        for _ in range(2):
            t0 = time.perf_counter()
            s = jax.jit(lambda a, b, c: jax.lax.sort(
                (a, b, c), num_keys=3, is_stable=False))(chi, clo, src)
            force_sync(*s)
            log(f"  rerun: {(time.perf_counter()-t0)*1e3:.0f}ms")

    if "ffill" in PIECES:
        is_tab = src < T
        elems = (is_tab, jnp.where(is_tab, src, 0),
                 jnp.where(is_tab, chi, jnp.uint32(0)),
                 jnp.where(is_tab, clo, jnp.uint32(0)))
        t0 = time.perf_counter()
        out = jax.jit(lookup._ffill_scan)(elems)
        force_sync(*out)
        log(f"_ffill_scan at n={n}: {time.perf_counter()-t0:.1f}s")
        for _ in range(2):
            t0 = time.perf_counter()
            out = jax.jit(lookup._ffill_scan)(elems)
            force_sync(*out)
            log(f"  rerun: {(time.perf_counter()-t0)*1e3:.0f}ms")

    if "restore" in PIECES:
        res = jnp.asarray(rng.integers(-1, 1 << 20, n).astype(np.int32))
        t0 = time.perf_counter()
        s = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                              is_stable=False))(src, res)
        force_sync(*s)
        log(f"restore sort at n={n}: {time.perf_counter()-t0:.1f}s")

    if "fused" in PIECES:
        thi = jnp.asarray(np.sort(rng.integers(0, 1 << 30, T)).astype(np.uint32))
        tlo = jnp.asarray(rng.integers(0, 1 << 30, T).astype(np.uint32))
        qhi = jnp.asarray(rng.integers(0, 1 << 30, Q).astype(np.uint32))
        qlo = jnp.asarray(rng.integers(0, 1 << 30, Q).astype(np.uint32))
        t0 = time.perf_counter()
        idx, found = lookup._find_merge(thi, tlo, qhi, qlo)
        force_sync(idx, found)
        log(f"fused _find_merge: {time.perf_counter()-t0:.1f}s")

    log("DONE")


if __name__ == "__main__":
    main()
