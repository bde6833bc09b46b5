"""De Bruijn graph neighbor/extension tables over a sorted k-mer table.

For every canonical key (interpreted in its forward orientation, i.e. the
canonical value itself — parity with `new ShortKmer(key, k)`), computes the
4 left and 4 right neighbor candidates, their canonical keys, table indices,
presence, and orientation bits.  From these, the unique-extension codes

    ext = -1 (no present neighbor) / -2 (fork) / 0..3 (the unique nucleotide)

exactly as HashMapOperations.getLeft/RightNucleotide
(src/algo/HashMapOperations.java:13-47), but evaluated for *all* k-mers at
once instead of lazily per probe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import bitpack as bp
from . import lookup

U32 = jnp.uint32
I32 = jnp.int32

NONE = -1
FORK = -2


@partial(jax.jit, static_argnames=("k", "side"))
def _neighbor_values(khi, klo, k: int, side: str):
    """Oriented neighbor values + canonical forms for one side: [4, M].

    Sentinel rows emit SENTINEL canonical queries (not garbage shifts of
    the all-ones pattern): lookup.find treats them identically (never
    found), and the bounded sort-merge verify depends on padded rows not
    forming giant duplicate runs of one garbage key."""
    sent = bp.is_sentinel(khi, klo)
    vh, vl = [], []
    for nuc in range(4):
        if side == "right":
            h, l = bp.shift_right(khi, klo, U32(nuc), k)
        else:
            h, l = bp.shift_left(khi, klo, U32(nuc), k)
        vh.append(h)
        vl.append(l)
    val_hi = jnp.stack(vh, axis=0)
    val_lo = jnp.stack(vl, axis=0)
    can_hi, can_lo = bp.canonical(val_hi, val_lo, k)
    can_hi = jnp.where(sent[None, :], U32(bp.SENTINEL), can_hi)
    can_lo = jnp.where(sent[None, :], U32(bp.SENTINEL), can_lo)
    return val_hi, val_lo, can_hi, can_lo


@jax.jit
def _ext_codes(val_hi, val_lo, can_hi, can_lo, present, sent):
    present = present & ~sent[None, :]
    is_fw = (val_hi == can_hi) & (val_lo == can_lo)
    deg = jnp.sum(present.astype(I32), axis=0)
    uniq_nuc = jnp.argmax(present, axis=0).astype(I32)
    ext = jnp.where(deg == 0, NONE, jnp.where(deg >= 2, FORK, uniq_nuc))
    return is_fw, present, ext


def neighbor_tables(khi, klo, k: int):
    """All neighbor data for a sorted canonical key table.

    Args:
      khi, klo: [M] sorted canonical keys (SENTINEL-padded tail allowed).
    Returns dict with, for side in {left, right} and nuc in 0..3:
      val_hi/val_lo [4,M]  oriented neighbor value (fw frame)
      idx [4,M] int32      table index of canonical neighbor (clipped)
      present [4,M] bool
      is_fw [4,M] bool     oriented value equals its canonical key
      ext_left/ext_right [M] int32  unique-extension codes (-1/-2/0..3)

    Layout note: the nucleotide axis LEADS.  A [M, 4] table on TPU is
    tiled (8, 128) with the 4-wide minor dim padded to 128 lanes — a 32x
    HBM blowup (observed: 4 GB per table at M = 2^23); [4, M] pads only
    the 4 sublanes to 8 (2x).

    Deliberately NOT one @jax.jit: inlining both sides' sort-merge
    lookups (lookup._find_merge) plus the extension math into a single
    graph OOM-killed the XLA compile helper at M = 2^21 on the TPU rig.
    Each jitted sub-piece compiles (and caches) independently; callers
    that need jit-traceable behavior still get it, since every sub-call
    is itself jitted.
    """
    sent = jnp.asarray(bp.is_sentinel(khi, klo))
    vals = {side: _neighbor_values(khi, klo, k, side)
            for side in ("left", "right")}
    # ONE bounded sort-merge join over all 8 neighbor slots (both sides
    # stacked): vs two per-side joins this sorts T+8M elements once
    # instead of T+4M twice (~10% less join volume and half the
    # dispatch chains).  Bounded verify: neighbor query keys repeat at
    # most a handful of times (measured max 5 at k=11; each canonical
    # key has <= 8 graph neighbors), so hits resolve with shifted
    # compares instead of 2 random gathers per query — the overflow
    # flag certifies the bound and falls back to the gather verify.
    can_hi8 = jnp.concatenate([vals["left"][2], vals["right"][2]], axis=0)
    can_lo8 = jnp.concatenate([vals["left"][3], vals["right"][3]], axis=0)
    idx8, present8, flag = lookup.find_bounded(khi, klo, can_hi8, can_lo8)
    if int(flag):
        idx8, present8 = lookup.find(khi, klo, can_hi8, can_lo8)
    res = {}
    for si, side in enumerate(("left", "right")):
        val_hi, val_lo, can_hi, can_lo = vals[side]
        idx = jax.lax.slice_in_dim(idx8, 4 * si, 4 * si + 4, axis=0)
        present = jax.lax.slice_in_dim(present8, 4 * si, 4 * si + 4,
                                       axis=0)
        is_fw, present, ext = _ext_codes(val_hi, val_lo, can_hi, can_lo,
                                         present, sent)
        res[side] = dict(val_hi=val_hi, val_lo=val_lo, idx=idx,
                         present=present, is_fw=is_fw, ext=ext)
    return res


def ext_map_rc(ext):
    """Extension code seen from the reverse-complement orientation.

    extR(rc(c)) is derived from extL(fw(c)): -1/-2 unchanged, a unique
    nucleotide m becomes its complement 3-m.
    """
    return jnp.where(ext >= 0, 3 - ext, ext)
