"""Micro-benchmarks to size a Pallas blocked sort for the counting core.

Questions:
  1. XLA pair-sort baseline per size (the thing to beat).
  2. Pallas VPU throughput for bitonic compare-exchange stages in VMEM:
     pure min/max chain, roll-based partner stages, 4D-reshape stages.
  3. HBM stream bandwidth via a Pallas copy kernel.
  4. Does jnp.flip lower inside a Mosaic kernel?
  5. How much VMEM can one kernel allocate?
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32


def timed(f, n=5):
    f()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def sync(*xs):
    from metafast_tpu.utils.device import force_sync
    force_sync(*xs)


# ---- 1. XLA sort baseline -------------------------------------------------
def bench_xla_sort():
    print("== XLA sort baseline ==")
    rng = np.random.default_rng(0)
    for logn in (24, 26, 27):
        n = 1 << logn
        hi = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.uint32))
        lo = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        f2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                               is_stable=False))
        t = timed(lambda: sync(*f2(hi, lo)), 3)
        print(f"  pair sort 2^{logn}: {t*1e3:8.1f} ms  "
              f"{n/t/1e6:7.1f} M keys/s")
        f1 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                               is_stable=False))
        t = timed(lambda: sync(*f1(hi, lo)), 3)
        print(f"  1key+payload 2^{logn}: {t*1e3:6.1f} ms  "
              f"{n/t/1e6:7.1f} M keys/s")


# ---- 2. Pallas VPU compare-exchange stages --------------------------------
def _minmax_kernel(n_stages):
    def kern(a_ref, b_ref, oa_ref, ob_ref):
        a = a_ref[:]
        b = b_ref[:]
        for i in range(n_stages):
            # plain compare-exchange against a rolled partner is modeled
            # in the roll variant; here: pure ALU chain (upper bound)
            lt = a < b
            a2 = jnp.where(lt, a, b)
            b2 = jnp.where(lt, b, a)
            a = a2 + U32(1)
            b = b2 ^ U32(3)
        oa_ref[:] = a
        ob_ref[:] = b
    return kern


def bench_vpu_chain(n_stages=100, rows=512, tile=512):
    print("== Pallas VPU pure min/max chain ==")
    R, C = rows, tile
    grid_c = 64
    x = jnp.asarray(np.random.randint(0, 2**31, (R, C * grid_c),
                                      dtype=np.int64).astype(np.uint32))
    y = jnp.asarray(np.random.randint(0, 2**31, (R, C * grid_c),
                                      dtype=np.int64).astype(np.uint32))
    f = pl.pallas_call(
        _minmax_kernel(n_stages),
        grid=(grid_c,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((R, C), lambda i: (0, i),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct(x.shape, U32),) * 2,
    )
    fj = jax.jit(lambda a, b: f(a, b))
    t = timed(lambda: sync(*fj(x, y)))
    n_el = x.size
    # each stage: 1 cmp + 2 sel + 2 alu = 5 ops on pairs (2 elements)
    ops = n_el * n_stages * 5 / 2
    print(f"  {n_stages} stages over {n_el/1e6:.0f}M u32: {t*1e3:.1f} ms"
          f" -> {ops/t/1e12:.2f} T ops/s,"
          f" {n_el*n_stages/t/1e9:.1f} G elem-stages/s")


def _roll_stage_kernel(n_stages, R):
    # realistic bitonic stage on (hi, lo) pairs with sublane-roll partner
    def kern(h_ref, l_ref, oh_ref, ol_ref):
        h = h_ref[:]
        l = l_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        for s in range(n_stages):
            m = 1 << (s % 9)      # row distance cycles 1..256
            up_h = pltpu.roll(h, R - m, 0)
            up_l = pltpu.roll(l, R - m, 0)
            dn_h = pltpu.roll(h, m, 0)
            dn_l = pltpu.roll(l, m, 0)
            is_lo = (rows & m) == 0
            ph = jnp.where(is_lo, up_h, dn_h)
            pl_ = jnp.where(is_lo, up_l, dn_l)
            lt = (h < ph) | ((h == ph) & (l < pl_))
            keep_small = is_lo == lt  # asc: low slot keeps min
            take_self = lt == keep_small
            h = jnp.where(take_self, h, ph)
            l = jnp.where(take_self, l, pl_)
        oh_ref[:] = h
        ol_ref[:] = l
    return kern


def bench_roll_stages(n_stages=60, R=512, C=512):
    print("== Pallas roll-partner bitonic-ish stages (hi,lo pairs) ==")
    grid_c = 32
    h = jnp.asarray(np.random.randint(0, 2**31, (R, C * grid_c),
                                      dtype=np.int64).astype(np.uint32))
    l = jnp.asarray(np.random.randint(0, 2**31, (R, C * grid_c),
                                      dtype=np.int64).astype(np.uint32))
    f = pl.pallas_call(
        _roll_stage_kernel(n_stages, R),
        grid=(grid_c,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((R, C), lambda i: (0, i),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct(h.shape, U32),) * 2,
    )
    fj = jax.jit(lambda a, b: f(a, b))
    t = timed(lambda: sync(*fj(h, l)))
    n_el = h.size
    rate = n_el * n_stages / t
    print(f"  {n_stages} stages over {n_el/1e6:.0f}M pairs: {t*1e3:.1f} ms"
          f" -> {rate/1e9:.2f} G pair-stages/s")
    # projected full bitonic sort of 2^27 pairs at this rate
    stages = sum(range(1, 28))  # 378
    print(f"  projected 2^27 full bitonic ({stages} stages): "
          f"{(1<<27)*stages/rate*1e3:.0f} ms")


def _reshape_stage_kernel(n_stages, R):
    def kern(h_ref, l_ref, oh_ref, ol_ref):
        h = h_ref[:]
        l = l_ref[:]
        for s in range(n_stages):
            m = 1 << (s % 8)      # row distance 1..128
            G = R // (2 * m)
            hs = h.reshape(G, 2, m, h.shape[1])
            ls = l.reshape(G, 2, m, h.shape[1])
            a_h, b_h = hs[:, 0], hs[:, 1]
            a_l, b_l = ls[:, 0], ls[:, 1]
            lt = (a_h < b_h) | ((a_h == b_h) & (a_l < b_l))
            n_h = jnp.where(lt, a_h, b_h)
            x_h = jnp.where(lt, b_h, a_h)
            n_l = jnp.where(lt, a_l, b_l)
            x_l = jnp.where(lt, b_l, a_l)
            h = jnp.stack([n_h, x_h], 1).reshape(R, h.shape[1])
            l = jnp.stack([n_l, x_l], 1).reshape(R, h.shape[1])
        oh_ref[:] = h
        ol_ref[:] = l
    return kern


def bench_reshape_stages(n_stages=60, R=512, C=512):
    print("== Pallas 4D-reshape compare-exchange stages ==")
    grid_c = 32
    h = jnp.asarray(np.random.randint(0, 2**31, (R, C * grid_c),
                                      dtype=np.int64).astype(np.uint32))
    l = jnp.asarray(np.random.randint(0, 2**31, (R, C * grid_c),
                                      dtype=np.int64).astype(np.uint32))
    f = pl.pallas_call(
        _reshape_stage_kernel(n_stages, R),
        grid=(grid_c,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((R, C), lambda i: (0, i),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct(h.shape, U32),) * 2,
    )
    try:
        fj = jax.jit(lambda a, b: f(a, b))
        t = timed(lambda: sync(*fj(h, l)))
        rate = h.size * n_stages / t
        print(f"  {n_stages} stages: {t*1e3:.1f} ms -> "
              f"{rate/1e9:.2f} G pair-stages/s")
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")


# ---- 3. HBM copy bandwidth ------------------------------------------------
def bench_hbm_copy():
    print("== Pallas HBM copy bandwidth ==")
    def kern(i_ref, o_ref):
        o_ref[:] = i_ref[:] + U32(1)
    n = 1 << 27
    x = jnp.asarray(np.random.randint(0, 2**31, n,
                                      dtype=np.int64).astype(np.uint32))
    x = x.reshape(-1, 512)
    f = pl.pallas_call(
        kern,
        grid=(x.shape[0] // 512,),
        in_specs=[pl.BlockSpec((512, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((512, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, U32),
    )
    fj = jax.jit(f)
    t = timed(lambda: sync(fj(x)))
    gb = 2 * x.size * 4 / 1e9
    print(f"  copy 2^27 u32: {t*1e3:.1f} ms -> {gb/t:.0f} GB/s r+w")


# ---- 4. flip support ------------------------------------------------------
def bench_flip():
    print("== jnp.flip inside kernel ==")
    def kern(i_ref, o_ref):
        x = i_ref[:]
        o_ref[:] = jnp.flip(jnp.flip(x, 0), 1)
    x = jnp.arange(512 * 512, dtype=U32).reshape(512, 512)
    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, U32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(x)
        ok = bool(jnp.all(r == x[::-1, ::-1]))
        t = timed(lambda: sync(jax.jit(f)(x)))
        print(f"  flip works: {ok}, 1MB flip {t*1e6:.0f} us")
    except Exception as e:
        print(f"  FAILED: {type(e).__name__}: {str(e)[:300]}")


# ---- 5. VMEM ceiling ------------------------------------------------------
def bench_vmem():
    print("== VMEM ceiling ==")
    for mb in (16, 32, 64, 96, 120):
        rows = mb * 1024 * 1024 // 4 // 512
        def kern(i_ref, o_ref):
            o_ref[:] = i_ref[:] + U32(1)
        x = jnp.zeros((rows, 512), U32)
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, U32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            sync(jax.jit(f)(x))
            print(f"  {mb} MB in + {mb} MB out: OK")
        except Exception as e:
            print(f"  {mb} MB: FAILED {type(e).__name__}: {str(e)[:2000]}")
            break


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "vmem"):
        bench_vmem()
    if which in ("all", "flip"):
        bench_flip()
    if which in ("all", "hbm"):
        bench_hbm_copy()
    if which in ("all", "chain"):
        bench_vpu_chain()
    if which in ("all", "roll"):
        bench_roll_stages()
    if which in ("all", "reshape"):
        bench_reshape_stages()
    if which in ("all", "xla"):
        bench_xla_sort()
