"""Blocked bitonic sort for (hi, lo[, payload]) u32 arrays (Pallas TPU).

XLA's variadic sort on TPU runs every one of the ~log2(n)^2/2 bitonic
stages as a full HBM pass (measured ~460 ms for 2^27 (u32, u32) pairs on
v5e ~= 378 stages at HBM bandwidth).  The k-mer counting hot path
(ops/count.py, replacing the reference's hash-table inner loop at
/root/reference/src/io/IOUtils.java:756-769) is dominated by exactly that
sort, so this module reorganizes the same bitonic network to touch HBM as
rarely as possible:

  * phase 1 — block sort: one Pallas pass sorts aligned blocks of
    B = 2^LOG_BLOCK elements entirely in VMEM (spans 2..B), i.e. the
    first log2(B)*(log2(B)+1)/2 stages cost ONE read+write of the data;
  * phase 2 — for each merge span s = 2B..N:
      - distances s/2..B run as elementwise XLA compare-exchanges,
        fused up to _FUSE stages per jit so XLA emits one HBM pass for
        the group (pure reshape+select chains fuse);
      - distances B/2..1 run as ONE Pallas pass of in-VMEM stages.

  Every stage applies the textbook XOR-partner rule: partner(i) = i ^ d,
  ascending iff (i & s) == 0 — phase boundaries never change the math,
  only where the data lives.

In-kernel layout is the natural row-major [R, 128] view of a tile (flat
index = row*128 + lane), so tiling is free (no transposes): distances
d < 128 are lane rolls, d >= 128 sublane rolls.  Sentinel keys
(0xFFFFFFFF pairs) sort to the end as in ops/count.py.

The comparator orders by (arrs[0], arrs[1]) lexicographically — extra
arrays ride as payload.  `sort_arrays` falls back to jax.lax.sort
off-TPU, for non-power-of-two lengths, and for small inputs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

LOG_BLOCK = 17          # phase-1 block: 2^17 elements (= VMEM tile;
                        # v5e scoped-vmem limit is 16 MB — 2^18 pair
                        # tiles need 18.76 MB and fail to compile)
_FUSE = 3               # big-distance stages fused per XLA pass
_LANES = 128


# ---------------------------------------------------------------------------
# shared stage math
# ---------------------------------------------------------------------------

def _cmp_lt(a_h, a_l, b_h, b_l):
    return (a_h < b_h) | ((a_h == b_h) & (a_l < b_l))


# ---------------------------------------------------------------------------
# phase 1 + local pass kernel: in-VMEM stages
# ---------------------------------------------------------------------------

def _vmem_stages(arrs, stages, gbase, R):
    """Run `stages` = [(span, dist), ...] on [R, 128] row-major values.

    gbase: global flat index of this tile's element (0, 0) (traced OK).
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    gi = gbase + r * _LANES + c
    for span, d in stages:
        dir_up = (gi & span) == 0
        if d < _LANES:
            is_lo = (c & d) == 0
            up = tuple(pltpu.roll(a, _LANES - d, 1) for a in arrs)
            dn = tuple(pltpu.roll(a, d, 1) for a in arrs)
        else:
            m = d // _LANES
            is_lo = (r & m) == 0
            up = tuple(pltpu.roll(a, R - m, 0) for a in arrs)
            dn = tuple(pltpu.roll(a, m, 0) for a in arrs)
        parrs = tuple(jnp.where(is_lo, u, w) for u, w in zip(up, dn))
        lt = _cmp_lt(arrs[0], arrs[1], parrs[0], parrs[1])   # self < partner
        gt = _cmp_lt(parrs[0], parrs[1], arrs[0], arrs[1])   # partner < self
        # Ties (equal keys) must keep BOTH positions in place: the lo/hi
        # selects here are independent (roll-based), so a `lt == dir`
        # comparator would make one side take the partner while the other
        # keeps itself — duplicating one payload and destroying the other
        # whenever keys collide.  lo keeps self iff self <= partner; hi
        # keeps self iff self >= partner.
        take_self = jnp.where(is_lo == dir_up, ~gt, ~lt)
        arrs = tuple(jnp.where(take_self, a, p)
                     for a, p in zip(arrs, parrs))
    return arrs


def _tile_kernel(stages, R, n_arr, T):
    def kern(*refs):
        in_refs, out_refs = refs[:n_arr], refs[n_arr:]
        gbase = pl.program_id(0) * T
        arrs = tuple(ref[0] for ref in in_refs)
        arrs = _vmem_stages(arrs, stages, gbase, R)
        for ref, a in zip(out_refs, arrs):
            ref[0] = a
    return kern


@partial(jax.jit, static_argnames=("stages", "log_tile", "interpret"))
def _tile_pass(arrs, stages, log_tile: int, interpret: bool = False):
    """One Pallas pass: run `stages` independently inside aligned tiles.

    Tiles are [R, 128] row-major views of 2^log_tile contiguous elements;
    every stage distance must stay below the tile size.
    """
    n = arrs[0].shape[0]
    T = 1 << log_tile
    R = T // _LANES
    n_arr = len(arrs)
    assert n % T == 0
    grid = (n // T,)
    shaped = tuple(a.reshape(n // T, R, _LANES) for a in arrs)
    out = pl.pallas_call(
        _tile_kernel(tuple(stages), R, n_arr, T),
        grid=grid,
        in_specs=[pl.BlockSpec((1, R, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * n_arr,
        out_specs=tuple([pl.BlockSpec((1, R, _LANES), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)] * n_arr),
        out_shape=tuple([jax.ShapeDtypeStruct((n // T, R, _LANES), a.dtype)
                         for a in arrs]),
        interpret=interpret,
    )(*shaped)
    return tuple(o.reshape(n) for o in out)


# ---------------------------------------------------------------------------
# phase 2 big-distance stages: fused XLA compare-exchange passes
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("span", "dists"))
def _xla_exchange(arrs, span: int, dists: tuple[int, ...]):
    """Compare-exchange stages at `dists` (descending powers of two) in
    one jit; the reshape+select chain fuses into one elementwise pass."""
    n = arrs[0].shape[0]
    for d in dists:
        shaped = tuple(a.reshape(-1, 2, d) for a in arrs)
        a_half = tuple(s[:, 0] for s in shaped)
        b_half = tuple(s[:, 1] for s in shaped)
        lt = _cmp_lt(a_half[0], a_half[1], b_half[0], b_half[1])
        # span > d in phase 2, so the span bit of an a-half element's
        # global index w*2d + j never comes from j: direction is
        # constant per window
        w = jax.lax.broadcasted_iota(jnp.int32, (n // (2 * d), 1), 0)
        dir_up = ((w * (2 * d)) & span) == 0
        keep_a = lt == dir_up
        new_a = tuple(jnp.where(keep_a, a, b)
                      for a, b in zip(a_half, b_half))
        new_b = tuple(jnp.where(keep_a, b, a)
                      for a, b in zip(a_half, b_half))
        arrs = tuple(
            jnp.stack([na, nb], axis=1).reshape(n)
            for na, nb in zip(new_a, new_b))
    return arrs


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _phase1_stages(log_b: int) -> tuple:
    return tuple((1 << ls, 1 << ld)
                 for ls in range(1, log_b + 1)
                 for ld in range(ls - 1, -1, -1))


def _local_stages(log_span: int, log_b: int) -> tuple:
    return tuple((1 << log_span, 1 << ld)
                 for ld in range(log_b - 1, -1, -1))


def sort_arrays_blocked(arrs, log_block: int = LOG_BLOCK,
                        interpret: bool = False):
    """Full blocked bitonic sort of equal-length u32 arrays.

    arrs: tuple of 1D u32 arrays, length a power of two >= 2^log_block;
    ordered by (arrs[0], arrs[1]) with the rest as payload.
    """
    arrs = tuple(arrs)
    n = arrs[0].shape[0]
    log_n = n.bit_length() - 1
    assert n == 1 << log_n and log_n >= log_block, (n, log_block)
    arrs = _tile_pass(arrs, _phase1_stages(log_block), log_block,
                      interpret=interpret)
    for log_span in range(log_block + 1, log_n + 1):
        span = 1 << log_span
        dists = list(range(log_span - 1, log_block - 1, -1))
        for i in range(0, len(dists), _FUSE):
            group = tuple(1 << ld for ld in dists[i:i + _FUSE])
            arrs = _xla_exchange(arrs, span, group)
        arrs = _tile_pass(arrs, _local_stages(log_span, log_block),
                          log_block, interpret=interpret)
    return arrs


def _on_tpu() -> bool:
    try:
        platform = (jax.config.jax_default_device.platform
                    if jax.config.jax_default_device is not None
                    else jax.devices()[0].platform)
    except Exception:
        platform = jax.default_backend()
    return platform in ("tpu", "axon")


def sort_arrays(arrs):
    """Sort by (arrs[0], arrs[1]); Pallas blocked path on TPU when the
    length is a power of two >= 2^LOG_BLOCK, else jax.lax.sort."""
    arrs = tuple(arrs)
    n = arrs[0].shape[0]
    if n >= (1 << LOG_BLOCK) and not (n & (n - 1)) and _on_tpu():
        return sort_arrays_blocked(arrs)
    return jax.lax.sort(arrs, num_keys=2, is_stable=False)
