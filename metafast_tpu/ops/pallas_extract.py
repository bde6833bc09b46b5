"""Pallas TPU kernel: fused 2-bit unpack + canonical k-mer extraction.

The XLA formulation (core/extract.py) is a k-step shift/or chain over
[B, P] u32 planes; XLA materializes several of the intermediates in HBM
(measured ~86ms per 2^19x152 batch on v5e, ~50x off memory speed-of-
light).  This kernel keeps the whole pyramid in VMEM: each grid step
reads a [TB, L/4] packed tile, unpacks, evaluates forward and reverse-
complement windows with a log-doubling composition, and writes only the
two canonical output planes.

Replaces the reference's per-read rolling ShortKmer loop (itmo
ShortKmer.java:104-150, src/io/IOUtils.java:756-769) on the TPU path;
falls back to core.extract on CPU (tests run the same code in pallas
interpret mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import bitpack as bp

U32 = jnp.uint32


def _doubled(codes, k: int, P: int, rc: bool):
    """(hi, lo) of the k-mer value at every window position.

    Log-doubling: m-mer values compose from m/2-mer values with one
    shift+or per level while they fit u32 (m <= 16), then (hi, lo) pair
    composition for the final O(log k) combines.  codes: [TB, W] u32.
    For rc=True composes complemented codes in reversed order.
    """
    c = (U32(3) - codes) if rc else codes

    # v[m]: value of the m-mer starting at each position (u32, m <= 16)
    v = {1: c}
    m = 1
    while 2 * m <= min(k, 16):
        a = v[m]
        n_pos = a.shape[1] - m
        if rc:
            # rc m-mer at p = rc[p + m/2..] first: low half is the FIRST
            # m/2 complemented codes, high half the next ones reversed —
            # composition mirrors: rc_2m[p] = rc_m[p] | rc_m[p+m] << 2m
            v[2 * m] = (a[:, :n_pos] | (a[:, m:] << U32(2 * m)))
        else:
            v[2 * m] = ((a[:, :n_pos] << U32(2 * m)) | a[:, m:])
        m *= 2

    # decompose k into available power chunks, widest first
    chunks = []
    rem, mm = k, m
    while rem:
        while mm > rem:
            mm //= 2
        chunks.append(mm)
        rem -= mm

    # fw: F_k(p) = F_c0(p) . F_c1(p+c0) . ...   (first chunk most
    # significant).  rc: R_k(p) = R_clast(p+k-clast) . ... . R_c0(p) —
    # the window's LAST chunk becomes most significant.
    if rc:
        pairs = []
        o = k
        for ch in chunks[::-1]:
            o -= ch
            pairs.append((ch, o))
    else:
        pairs = []
        o = 0
        for ch in chunks:
            pairs.append((ch, o))
            o += ch
    hi = jnp.zeros((codes.shape[0], P), dtype=U32)
    lo = jnp.zeros((codes.shape[0], P), dtype=U32)
    shift = 2 * k
    for ch, off in pairs:
        shift -= 2 * ch
        val = v[ch][:, off:off + P]
        # place val (2*ch bits) at bit offset `shift` of the 64-bit pair
        if shift >= 32:
            hi = hi | (val << U32(shift - 32))
        elif shift + 2 * ch <= 32:
            lo = lo | (val << U32(shift))
        else:
            lo = lo | (val << U32(shift))
            hi = hi | (val >> U32(32 - shift))
    return hi, lo


def _make_kernel(k: int, L: int, P: int):
    def kern(packed_ref, len_ref, hi_ref, lo_ref):
        x = packed_ref[:].astype(U32)                       # [TB, L4]
        TB, L4 = x.shape
        parts = [(x >> U32(2 * j)) & U32(3) for j in range(4)]
        codes = jnp.stack(parts, axis=-1).reshape(TB, 4 * L4)[:, :L]
        fw_hi, fw_lo = _doubled(codes, k, P, rc=False)
        rc_hi, rc_lo = _doubled(codes, k, P, rc=True)
        take_rc = (rc_hi < fw_hi) | ((rc_hi == fw_hi) & (rc_lo < fw_lo))
        hi = jnp.where(take_rc, rc_hi, fw_hi)
        lo = jnp.where(take_rc, rc_lo, fw_lo)
        pos = jax.lax.broadcasted_iota(jnp.int32, (TB, P), 1)
        valid = pos + k <= len_ref[:]
        hi_ref[:] = jnp.where(valid, hi, U32(bp.SENTINEL))
        lo_ref[:] = jnp.where(valid, lo, U32(bp.SENTINEL))
    return kern


@functools.partial(jax.jit, static_argnames=("k", "L", "interpret"))
def extract_canonical_packed_pallas(packed, lengths, k: int, L: int,
                                    interpret: bool = False):
    """Canonical (hi, lo) u32 pairs for every window of packed reads.

    packed: [B, L//4] uint8 (2-bit codes, little-end first);
    lengths: [B] int32.  Returns (hi, lo) [B, P], SENTINEL on invalid
    windows — bit-identical to core.extract.extract_canonical_packed.
    """
    B, L4 = packed.shape
    P = L - k + 1
    TB = B
    for cand in (256, 128, 64, 32, 16, 8):
        if B % cand == 0:
            TB = cand
            break
    lengths2 = lengths.astype(jnp.int32).reshape(B, 1)
    hi, lo = pl.pallas_call(
        _make_kernel(k, L, P),
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, L4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, P), U32),
            jax.ShapeDtypeStruct((B, P), U32),
        ),
        interpret=interpret,
    )(packed, lengths2)
    return hi, lo
