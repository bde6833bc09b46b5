"""Probe: connected-components label prop on TPU — fused while_loop vs
round-chunked dispatches.  Usage: labelprop_probe.py <log2M> <mode>
mode: fused | chunked
"""
import sys
import time

import numpy as np

LOG2M = int(sys.argv[1]) if len(sys.argv) > 1 else 21
MODE = sys.argv[2] if len(sys.argv) > 2 else "chunked"
K = 31


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from metafast_tpu.core import bitpack as bp
    from metafast_tpu.utils.device import force_sync

    M = 1 << LOG2M
    rng = np.random.default_rng(0)
    log(f"alive check: {jnp.sum(jnp.ones(8)).item()}")

    # synthetic neighbor structure: a few long chains (worst case)
    idx = np.arange(M, dtype=np.int32)
    perm = rng.permutation(M).astype(np.int32)
    inv = np.empty(M, np.int32)
    inv[perm] = idx
    nbr = np.full((8, M), -1, np.int32)
    # chain in permuted order: perm[i] <-> perm[i+1]
    nbr[0, perm[:-1]] = perm[1:]
    nbr[1, perm[1:]] = perm[:-1]
    active = np.ones(M, bool)
    dn = jnp.asarray(nbr)
    da = jnp.asarray(active)
    force_sync(dn, da)
    log(f"M=2^{LOG2M} staged")

    from metafast_tpu.graph.components import (_label_round,
                                               _connected_labels_device)

    if MODE == "fused":
        t0 = time.perf_counter()
        labels = _connected_labels_device(dn, da)
        force_sync(labels)
        log(f"fused while_loop: {time.perf_counter()-t0:.1f}s")
    else:
        R = 8   # rounds per dispatch

        @partial(jax.jit, static_argnames=("r",))
        def chunk(labels, nbr, active, r: int):
            def body(_, l):
                return _label_round(l, nbr, active)
            new = jax.lax.fori_loop(0, r, body, labels)
            return new, jnp.any(new != labels)

        t0 = time.perf_counter()
        labels = jnp.where(da, jnp.arange(M, dtype=jnp.int32), M)
        rounds = 0
        while True:
            labels, changed = chunk(labels, dn, da, R)
            rounds += R
            if not bool(changed):
                break
            if rounds > 4000:
                raise RuntimeError("no convergence")
        force_sync(labels)
        log(f"chunked ({rounds} rounds): {time.perf_counter()-t0:.1f}s "
            f"({M*rounds/ (time.perf_counter()-t0)/1e6:.0f}M node-rounds/s)")
        lab = np.asarray(labels)
        assert (lab == lab[perm[0]]).all(), "single chain => single label"
    log("DONE")


if __name__ == "__main__":
    main()
