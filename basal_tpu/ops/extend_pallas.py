"""Pallas TPU kernel for the conversion-masked mismatch count core.

The extension pipeline is gather + funnel-shift + mask algebra + popcount
(ops/extend.py).  The gather stays in XLA (its HBM gather is already
near-bandwidth); this kernel fuses everything after it — the funnel shift of
the reference window onto the read word grid, the conversion-mask XOR
(one-way XC / multi-way M2-M3-M4 / nt3 XT; ops/bitops.py), the 2-bit-lane
popcount, and the word reduction — into one VMEM-resident pass, so the
[C, W] intermediates never round-trip through HBM.

Tiling: candidates on the sublane axis (TILE_C rows), words on the lane axis
(W <= 32 columns, padded to 128 lanes by the compiler).  All ops are VPU
int32; no MXU use.

Opt-in via BASAL_TPU_PALLAS=1 (DeviceContext picks it up); equivalence vs
the XLA path is tested in interpreter mode on CPU
(tests/test_pallas_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitops import (mismatch_words_multiway, mismatch_words_nt3,
                     mismatch_words_oneway)

TILE_C = 256


def _count_kernel(mode: str, W: int, r_ref, sh2_ref, base_ref, valid_ref,
                  mread_ref, ncnt_ref, out_ref):
    """One tile: r [TILE_C, W+1] gathered ref words; sh2 [TILE_C, 1] bit
    shifts; base/valid/mread [TILE_C, W] read planes; ncnt [TILE_C, 1]."""
    r = r_ref[:]
    sh = sh2_ref[:].astype(jnp.uint32)          # [TILE_C, 1]
    lo = r[:, :W]
    hi = r[:, 1:]
    a = (lo << sh) | ((hi >> (31 - sh)) >> 1)
    b = base_ref[:]
    v = valid_ref[:]
    if mode == "oneway":
        flags = mismatch_words_oneway(b, a)
    elif mode == "multiway":
        flags = mismatch_words_multiway(b, a, mread_ref[:])
    else:
        flags = mismatch_words_nt3(b, a)
    mm = flags & v
    lanes = (mm | (mm >> 1)) & 0x55555555
    cnt = jnp.sum(
        jax.lax.population_count(lanes).astype(jnp.int32), axis=1,
        keepdims=True)
    total = ncnt_ref[:] + cnt
    out_ref[:] = jnp.minimum(total, 255).astype(jnp.uint8)


def _counts_core(ref32, loc, plane, row_off, base, valid, mread,
                 ncnt, *, mode: str, W: int, nw: int,
                 interpret: bool = False):
    C = loc.shape[0]
    row = (jnp.searchsorted(row_off, jnp.arange(C, dtype=row_off.dtype),
                            side="right") - 1).astype(jnp.int32)
    k0 = loc >> 4
    sh2 = ((loc & 15) << 1).astype(jnp.uint32)[:, None]
    gidx = plane.astype(jnp.int32) * jnp.int32(nw) + k0
    idx = gidx[:, None] + jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    r = jnp.take(ref32, idx)                       # XLA gather [C, W+1]
    b = jnp.take(base, row, axis=0)
    v = jnp.take(valid, row, axis=0)
    mr = (jnp.take(mread, row, axis=0) if mode == "multiway"
          else jnp.zeros((C, W), jnp.uint32))
    nc = jnp.take(ncnt, row)[:, None].astype(jnp.int32)

    grid = (C // TILE_C,)
    spec_w1 = pl.BlockSpec((TILE_C, W + 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((TILE_C, W), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_1 = pl.BlockSpec((TILE_C, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_count_kernel, mode, W),
        grid=grid,
        in_specs=[spec_w1, spec_1, spec_w, spec_w, spec_w, spec_1],
        out_specs=pl.BlockSpec((TILE_C, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.uint8),
        interpret=interpret,
    )(r, sh2, b, v, mr, nc)[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("mode", "W", "nw", "interpret"))
def extend_counts_pallas(ref32, loc, plane, row_off, base, valid, mread,
                         ncnt, *, mode: str, W: int, nw: int,
                         interpret: bool = False):
    """Ungapped batched extension with the Pallas count core.

    Same contract as ops.extend.extend_kernel with gap=0: returns u8 counts.
    C must be a multiple of TILE_C (the pipeline pads to pow2 >= 256).
    """
    return _counts_core(ref32, loc, plane, row_off, base, valid, mread,
                        ncnt, mode=mode, W=W, nw=nw, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("mode", "W", "nw", "C", "U", "n_planes",
                                    "interpret"))
def extend_counts_pallas_packed(ref32, meta, planes, plane_u8, *, mode: str,
                                W: int, nw: int, C: int, U: int,
                                n_planes: int, interpret: bool = False):
    """RTT-minimizing entry mirroring ops.extend.extend_kernel_packed: one
    ``meta`` i32 buffer (loc | row_off | ncnt | readlen) + one ``planes``
    u32 buffer + the u8 strand plane — 3 host->device transfers per wave
    instead of ~7 (the remote-TPU tunnel charges ~35 ms per transfer).
    ``readlen`` rides along unused so the pipeline builds ONE meta buffer
    for either kernel."""
    loc = meta[:C]
    row_off = meta[C:C + U + 1]
    ncnt = meta[C + U + 1:C + 2 * U + 1]
    base = planes[:U]
    valid = planes[U:2 * U]
    mread = (planes[2 * U:3 * U] if mode == "multiway"
             else jnp.zeros((1, planes.shape[1]), jnp.uint32))
    return _counts_core(ref32, loc, plane_u8, row_off, base, valid, mread,
                        ncnt, mode=mode, W=W, nw=nw, interpret=interpret)
