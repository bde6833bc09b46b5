"""TPU benchmark: blocked Pallas sort vs XLA sort, pairs and triples."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from metafast_tpu.ops import psort


def timed(f, n=3):
    f()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def sync(xs):
    from metafast_tpu.utils.device import force_sync
    force_sync(*xs)
    return xs


def main():
    logns = [int(a) for a in sys.argv[1:]] or [24, 27]
    rng = np.random.default_rng(0)
    for logn in logns:
        n = 1 << logn
        hi = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int64)
                         .astype(np.uint32))
        lo = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.int64)
                         .astype(np.uint32))
        xla = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                                is_stable=False))
        t_x = timed(lambda: sync(xla(hi, lo)))
        print(f"2^{logn} XLA pair sort:    {t_x*1e3:8.1f} ms "
              f"({n/t_x/1e6:7.1f} M/s)", flush=True)

        t0 = time.perf_counter()
        out = sync(psort.sort_arrays_blocked((hi, lo)))
        print(f"  pallas first call (compile+run): "
              f"{time.perf_counter()-t0:.1f} s", flush=True)
        t_p = timed(lambda: sync(psort.sort_arrays_blocked((hi, lo))))
        print(f"2^{logn} pallas pair sort: {t_p*1e3:8.1f} ms "
              f"({n/t_p/1e6:7.1f} M/s)  speedup {t_x/t_p:.2f}x",
              flush=True)

        # correctness vs XLA
        ref = xla(hi, lo)
        ok = (bool(jnp.all(out[0] == ref[0]))
              and bool(jnp.all(out[1] == ref[1])))
        print(f"  match XLA: {ok}", flush=True)
        del out, ref


if __name__ == "__main__":
    main()
