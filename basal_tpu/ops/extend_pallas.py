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


def _positions_block(flagw_masked, fill, W: int, reverse: bool, K: int):
    """First K mismatch lane positions of a [T, W] masked flag block,
    ascending read position (reverse=False) or ascending distance-from-end
    (reverse=True; reported as L-1-p) — the in-kernel twin of
    ops.extend._first_positions, replacing its full sort with K
    min-extract passes (positions are unique per row, so extract-min +
    mask-to-fill reproduces sorted()[:K] exactly, fill padding included)."""
    bits = (flagw_masked | (flagw_masked >> 1)) & jnp.uint32(0x55555555)
    # shifts/lane indexes via in-kernel iota (pallas forbids captured
    # constant arrays); first base sits at bit 30 of its word
    i16_ = jax.lax.broadcasted_iota(jnp.uint32, (1, 16), 1)
    shifts = jnp.uint32(30) - jnp.uint32(2) * i16_
    cols = []
    for w in range(W):
        cols.append((bits[:, w:w + 1] >> shifts) & jnp.uint32(1))
    lane_bits = jnp.concatenate(cols, axis=1)          # [T, W*16]
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W * 16), 1)
    pos = jnp.where(reverse, fill - 1 - lane_idx, lane_idx)
    score = jnp.where(lane_bits != 0, pos, fill).astype(jnp.int32)
    outs = []
    for _ in range(K):
        m = jnp.min(score, axis=1, keepdims=True)
        outs.append(m)
        score = jnp.where(score == m, fill, score)
    return jnp.concatenate(outs, axis=1)               # [T, K]


def _gap_kernel(mode: str, W: int, gap: int, K: int,
                r_ref, sh2_ref, base_ref, valid_ref, mread_ref, lm_ref,
                ncnt_ref, rlen_ref,
                cnt_ref, pos0_ref, pos1_ref):
    """One tile of the GAPPED extension: counts + ascending mismatch
    positions of the main alignment + reverse positions of the 2*gap
    shifted alignments, all from ONE gathered [T, W+3] ref window in VMEM
    (the XLA path rematerializes [C, W] intermediates in HBM per shift).
    sh2 carries (loc & 15) << 1; a shifted alignment loc+s re-derives its
    word offset and bit shift from it (s in [-gap, gap], |s| <= 3 < 16, so
    the word offset moves by at most one)."""
    r = r_ref[:]
    sh2 = sh2_ref[:].astype(jnp.int32)                 # [T, 1]
    b = base_ref[:]
    v = valid_ref[:]
    lm = lm_ref[:]
    fill = rlen_ref[:].astype(jnp.int32)               # [T, 1] map_len

    def aligned(off, sh):
        # A[w] = (r[off+w] << sh) | ((r[off+w+1] >> (31-sh)) >> 1); off is
        # a per-row 0/1/2 word offset into the W+3 gathered window
        sh_u = sh.astype(jnp.uint32)
        cols = []
        for w in range(W):
            lo = jnp.where(off == 0, r[:, w:w + 1],
                           jnp.where(off == 1, r[:, w + 1:w + 2],
                                     r[:, w + 2:w + 3]))
            hi = jnp.where(off == 0, r[:, w + 1:w + 2],
                           jnp.where(off == 1, r[:, w + 2:w + 3],
                                     r[:, w + 3:w + 4]))
            cols.append((lo << sh_u) | ((hi >> (jnp.uint32(31) - sh_u)) >> 1))
        return jnp.concatenate(cols, axis=1)

    def flags_of(A):
        if mode == "oneway":
            return mismatch_words_oneway(b, A)
        if mode == "multiway":
            return mismatch_words_multiway(b, A, mread_ref[:])
        return mismatch_words_nt3(b, A)

    one = jnp.ones_like(sh2)
    flags = flags_of(aligned(one, sh2))
    mm = flags & v
    lanes = (mm | (mm >> 1)) & jnp.uint32(0x55555555)
    cnt = jnp.sum(jax.lax.population_count(lanes).astype(jnp.int32),
                  axis=1, keepdims=True)
    cnt_ref[:] = jnp.minimum(ncnt_ref[:] + cnt, 255).astype(jnp.uint8)
    pos0_ref[:] = _positions_block(flags & lm, fill, W, False, K)

    for tt in range(1, 2 * gap + 1):
        t = (tt + 1) // 2
        s = (1 - (tt % 2) * 2) * t                     # odd -> -t, even -> +t
        sh2_s = sh2 + 2 * s
        off_s = one + (sh2_s >> 5)                     # floor div: -2 -> -1
        sh2_s = sh2_s & 31
        flags_s = flags_of(aligned(off_s, sh2_s))
        p = _positions_block(flags_s & lm, fill, W, True, K)
        pos1_ref[:, (tt - 1) * K:tt * K] = p.astype(jnp.int16)


@functools.partial(jax.jit,
                   static_argnames=("mode", "gap", "W", "nw", "C", "U", "E",
                                    "interpret"))
def extend_gap_pallas_blob(ref32, blob, *, mode: str, gap: int, W: int,
                           nw: int, C: int, U: int, E: int,
                           interpret: bool = False):
    """Single-transfer gapped entry (see ops.extend.carve_blob): one i32
    blob upload per wave, strand plane in loc bit 31, valid/lenmask derived
    on device."""
    from .extend import carve_blob
    (loc, plane, row_off, base, valid, mread, lenmask, ncnt,
     readlen) = carve_blob(blob, mode=mode, gap=gap, W=W, C=C, U=U, E=E)
    return _gap_core(ref32, loc, plane, row_off, base, valid, mread,
                     lenmask, ncnt, readlen, mode=mode, gap=gap, W=W,
                     nw=nw, C=C, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("mode", "W", "nw", "C", "U", "E",
                                    "interpret"))
def extend_counts_pallas_blob(ref32, blob, *, mode: str, W: int, nw: int,
                              C: int, U: int, E: int,
                              interpret: bool = False):
    """Single-transfer ungapped entry (see ops.extend.carve_blob)."""
    from .extend import carve_blob
    (loc, plane, row_off, base, valid, mread, _lm, ncnt,
     _rl) = carve_blob(blob, mode=mode, gap=0, W=W, C=C, U=U, E=E)
    return _counts_core(ref32, loc, plane, row_off, base, valid, mread,
                        ncnt, mode=mode, W=W, nw=nw, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("mode", "gap", "W", "nw", "C", "U",
                                    "n_planes", "interpret"))
def extend_gap_pallas_packed(ref32, meta, planes, plane_u8, *, mode: str,
                             gap: int, W: int, nw: int, C: int, U: int,
                             n_planes: int, interpret: bool = False):
    """GAPPED batched extension with the Pallas core: returns
    (counts u8[C], pos0 i16[C, K_POS], pos1 i16[C, 2*gap, K_POS]) —
    identical contract to ops.extend.extend_kernel_packed with gap>0.
    Default on TPU (measured 1.88x over the XLA gapped kernel at
    production shapes, tools/pallasbench.py 20 gap: 768 vs 1443 ms per
    2^20 candidates); BASAL_TPU_PALLAS_GAP=0 forces XLA."""
    loc = meta[:C]
    row_off = meta[C:C + U + 1]
    ncnt = meta[C + U + 1:C + 2 * U + 1]
    readlen = meta[C + 2 * U + 1:C + 3 * U + 1]
    base = planes[:U]
    valid = planes[U:2 * U]
    k = 2
    if mode == "multiway":
        mread = planes[k * U:(k + 1) * U]
        k += 1
    else:
        mread = jnp.zeros((1, planes.shape[1]), jnp.uint32)
    lenmask = planes[k * U:(k + 1) * U]
    return _gap_core(ref32, loc, plane_u8, row_off, base, valid, mread,
                     lenmask, ncnt, readlen, mode=mode, gap=gap, W=W,
                     nw=nw, C=C, interpret=interpret)


def _gap_core(ref32, loc, plane, row_off, base, valid, mread, lenmask,
              ncnt, readlen, *, mode: str, gap: int, W: int, nw: int,
              C: int, interpret: bool):
    from .extend import K_POS
    K = K_POS
    row = (jnp.searchsorted(row_off, jnp.arange(C, dtype=row_off.dtype),
                            side="right") - 1).astype(jnp.int32)
    k0 = (loc >> 4) - 1
    sh2 = ((loc & 15) << 1).astype(jnp.int32)[:, None]
    gidx = plane.astype(jnp.int32) * jnp.int32(nw) + k0
    idx = gidx[:, None] + jnp.arange(W + 3, dtype=jnp.int32)[None, :]
    r = jnp.take(ref32, idx)                           # XLA gather [C, W+3]
    b = jnp.take(base, row, axis=0)
    v = jnp.take(valid, row, axis=0)
    mr = (jnp.take(mread, row, axis=0) if mode == "multiway"
          else jnp.zeros((C, W), jnp.uint32))
    lm = jnp.take(lenmask, row, axis=0)
    nc = jnp.take(ncnt, row)[:, None].astype(jnp.int32)
    rl = jnp.take(readlen, row)[:, None].astype(jnp.int32)

    grid = (C // TILE_C,)

    def spec(width):
        return pl.BlockSpec((TILE_C, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    cnt, pos0, pos1 = pl.pallas_call(
        functools.partial(_gap_kernel, mode, W, gap, K),
        grid=grid,
        in_specs=[spec(W + 3), spec(1), spec(W), spec(W), spec(W), spec(W),
                  spec(1), spec(1)],
        out_specs=[spec(1), spec(K), spec(2 * gap * K)],
        out_shape=[jax.ShapeDtypeStruct((C, 1), jnp.uint8),
                   jax.ShapeDtypeStruct((C, K), jnp.int32),
                   jax.ShapeDtypeStruct((C, 2 * gap * K), jnp.int16)],
        interpret=interpret,
    )(r, sh2, b, v, mr, lm, nc, rl)
    return (cnt[:, 0], pos0.astype(jnp.int16),
            pos1.reshape(C, 2 * gap, K))


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
