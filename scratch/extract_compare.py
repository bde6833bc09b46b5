"""Compare extraction strategies on TPU for uniform-length reads.

stream kernel: 2.9G slots/s but 26% of sorted slots are invalid
  (read-boundary windows + padding).
packed batch kernel: emits exactly L-k+1 windows per read -> the sort
  (the pipeline bound) runs on ~21% fewer slots.

Measures: extraction rate of both, plus sort time at each slot count.
"""
import time

import numpy as np

K = 31
N_READS = 667_000
L = 150


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from metafast_tpu.io import native_reads
    from metafast_tpu.ops.count import _extract_flat_packed, _sort_pair
    from metafast_tpu.ops.stream_extract import build_stream, stream_extract
    from metafast_tpu.utils.device import force_sync

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, N_READS * L, dtype=np.uint8)
    lengths = np.full(N_READS, L, np.int32)
    n_kmers = N_READS * (L - K + 1)

    # --- stream path ---
    w, v, _ = build_stream(codes, lengths, K)
    wd, vd = jax.device_put(w), jax.device_put(v)
    force_sync(wd, vd)

    def stream():
        hi, lo = stream_extract(wd, vd, K)
        force_sync(hi, lo)
        return hi, lo

    stream()
    t = sorted(_timed(stream) for _ in range(3))[1]
    hi, lo = stream_extract(wd, vd, K)
    slots_s = hi.size
    log(f"stream extract: {t*1e3:.0f}ms, {slots_s/1e6:.1f}M slots "
        f"({slots_s/t/1e9:.2f}G slots/s)")

    shi, slo = hi.reshape(-1), lo.reshape(-1)
    force_sync(shi, slo)
    t = sorted(_timed(lambda: force_sync(*_sort_pair(shi, slo)))
               for _ in range(3))[1]
    log(f"sort at {slots_s/1e6:.1f}M slots: {t*1e3:.0f}ms "
        f"-> {n_kmers/t/1e6:.0f}M kmers/s sort-only")

    # --- packed batch path ---
    # pack 2-bit rows: L=150 -> 160-code rows (40 bytes)
    rows = codes.reshape(N_READS, L)
    Lpad = 160
    padded = np.zeros((N_READS, Lpad), np.uint8)
    padded[:, :L] = rows
    packed = native_reads.pack_2bit(padded)
    pd = jax.device_put(packed)
    ld = jax.device_put(lengths)
    force_sync(pd, ld)
    log(f"packed upload: {packed.nbytes/1e6:.0f} MB "
        f"(stream was {w.nbytes + v.nbytes:>d} B)")

    def batch():
        hi, lo = _extract_flat_packed(pd, ld, K, Lpad)
        force_sync(hi, lo)
        return hi, lo

    batch()
    t = sorted(_timed(batch) for _ in range(3))[1]
    bhi, blo = _extract_flat_packed(pd, ld, K, Lpad)
    slots_b = bhi.size
    log(f"batch-packed extract: {t*1e3:.0f}ms, {slots_b/1e6:.1f}M slots "
        f"({slots_b/t/1e9:.2f}G slots/s)")

    force_sync(bhi, blo)
    t = sorted(_timed(lambda: force_sync(*_sort_pair(bhi, blo)))
               for _ in range(3))[1]
    log(f"sort at {slots_b/1e6:.1f}M slots: {t*1e3:.0f}ms "
        f"-> {n_kmers/t/1e6:.0f}M kmers/s sort-only")
    log("DONE")


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
