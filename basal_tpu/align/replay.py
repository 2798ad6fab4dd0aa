"""Sequential scan replay: reproduces the reference's per-read accept logic
exactly, consuming device-computed mismatch counts.

The expensive work (conversion-masked mismatch counting over every candidate)
runs batched on the TPU (basal_tpu.ops.extend); what remains is the
order-sensitive bookkeeping that defines BASAL's output bit-for-bit:

  random-start circular candidate visits   SnpAlign        align.cpp:290-313
  dedup via per-chr location sets          AddHit          align.cpp:329-347
  mismatch-stratum buckets + -w cap        AddHit          align.cpp:340-345
  gapped-extension combination             GapAlign        align.cpp:348-410
  pigeonhole early stop per stratum        RunAlign        align.cpp:459-463
  stratum pick & -r multi-hit policy       StringAlign     align.cpp:583-612

This pure-Python version is the semantic reference; a C++ twin (ctypes) is
used for throughput (basal_tpu.align.native).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..config import AlignParams, MAXSNPS
from ..index.reference import PackedReference
from .candidates import CandidateTable
from ..reads.encode import EncodedBatch
from .rng import MyRand

# gHit replica (param.h:35-42)
Hit = Tuple[int, int, int, int]  # (chr, loc, gap_size, gap_pos)


@dataclasses.dataclass
class ReadResult:
    filtered: bool                 # QC fail -> flag 0x204
    stratum: int = 0               # mismatch count of reported stratum
    nhits: int = 0                 # total equal-best hits
    hits0: List[Hit] = None        # chain-0 bucket at best stratum
    hits1: List[Hit] = None


def precompute_chr(ref: PackedReference, loc: np.ndarray):
    """Vectorized int2hit chr resolution (align.cpp:319-334)."""
    n = ref.total_num
    anchors = ref.ref_anchor[:n]
    chrpair = np.clip(np.searchsorted(anchors, loc.astype(np.int64),
                                      side="right") - 1, 0, n - 1)
    local = loc.astype(np.int64) - anchors[chrpair]
    return chrpair.astype(np.int64), local


class Replayer:
    def __init__(self, params: AlignParams, ref: PackedReference, rng: MyRand):
        self.p = params
        self.ref = ref
        self.rng = rng
        self.sizes = np.array([t.size for t in ref.titles], dtype=np.int64)
        self.rc_off = np.array([t.rc_offset for t in ref.titles], dtype=np.int64)

    def replay_batch(self, enc: EncodedBatch, table: CandidateTable,
                     counts: np.ndarray,
                     pos0: Optional[np.ndarray] = None,
                     pos1: Optional[np.ndarray] = None) -> List[ReadResult]:
        chrpair, local = (precompute_chr(self.ref, table.loc)
                          if table.loc.size else (None, None))
        out = []
        for r in range(len(enc.reads)):
            if enc.filtered[r]:
                out.append(ReadResult(filtered=True))
                continue
            out.append(self._replay_read(enc, table, counts, pos0, pos1,
                                         chrpair, local, r))
        return out

    # -- int2hit (align.cpp:319-346) ------------------------------------
    def _int2hit(self, cp: int, lo: int, plane: int, chain: int, L: int,
                 gap_size: int, gap_pos: int) -> Hit:
        loc = lo
        if plane:
            loc = int(self.rc_off[cp]) - L - loc
            gap_pos = L + (gap_size if gap_size < 0 else 0) - gap_pos
            loc -= gap_size
        return (2 * cp + plane, loc, gap_size, gap_pos)

    def _replay_read(self, enc, table, counts, pos0, pos1,
                     chrpair, local, r) -> ReadResult:
        p = self.p
        L = int(enc.map_len[r])
        rms = int(enc.read_max_snp[r])
        snp_thres = rms
        segnum = int(enc.seedseg_num[r])
        hits = [[[] for _ in range(MAXSNPS + 1)] for _ in range(2)]
        seen = set()   # (gapped, chrpair, final_loc) — hitset/ghitset
        groups = table.groups[r]
        nt3 = p.nt3
        gap = p.gap

        def add_hit(chain: int, w: int, hit: Hit) -> int:
            """AddHit (align.cpp:329-347).  Returns 1 => abort scan."""
            nonlocal snp_thres
            chr_, loc, gsz, gpos = hit
            if loc < 0 or (loc & 0xFFFFFFFF) + L > self.sizes[chr_ >> 1]:
                return 0
            key = (1 if gsz else 0, chr_ >> 1, loc)
            if key in seen:
                return 0
            seen.add(key)
            hits[chain][w].append(hit)
            if len(hits[0][w]) + len(hits[1][w]) >= p.max_num_hits:
                if w == 0:
                    return 1
                snp_thres = w - 1
            return 0

        def gap_align(ci: int, chain: int, plane: int, seed_pos: int) -> int:
            """GapAlign (align.cpp:348-410)."""
            nonlocal snp_thres
            if snp_thres < 2:
                return 0
            p0 = pos0[ci]
            ret0 = int(p0[snp_thres - 2])
            if ret0 < seed_pos + p.seed_size:
                return 0
            for tt in range(1, 2 * gap + 1):
                t = (tt + 1) // 2
                shift = (1 - (tt % 2) * 2) * t
                shift1 = shift if shift < 0 else 0
                if snp_thres < 1 + t:
                    break
                rl = L - t - 1
                mmi2 = pos1[ci, tt - 1]
                for i in range(snp_thres - t):
                    gpos = int(p0[i])
                    if gpos < p.gap_edge or gpos >= rl:
                        continue
                    for j in range(snp_thres - t - i):
                        m2 = int(mmi2[j])
                        if m2 < p.gap_edge or m2 >= rl:
                            continue
                        if gpos + m2 - shift1 < L:
                            continue
                        gap_snp = i + j + t
                        clip = gpos + p.gap_edge - L - shift1
                        if clip > 0:
                            gpos -= clip
                        hit = self._int2hit(int(chrpair[ci]), int(local[ci]),
                                            plane, chain, L, shift, gpos)
                        return add_hit(chain, gap_snp, hit)
            return 0

        aborted = False
        for mode in range(segnum):
            # SnpAlign(mode) — groups for this mode in replay order
            for g in groups:
                if g.mode != mode:
                    continue
                m = g.m
                jj = g.jj0
                for _ in range(m):
                    ci = g.start + jj
                    plane = 1 if jj > g.mc else 0
                    cnt = int(counts[ci])
                    if cnt <= snp_thres:
                        hit = self._int2hit(int(chrpair[ci]), int(local[ci]),
                                            plane, g.chain, L, 0, 0)
                        if add_hit(g.chain, cnt, hit):
                            aborted = True
                            break
                    if gap > 0:
                        if gap_align(ci, g.chain, plane, g.h):
                            aborted = True
                            break
                    jj += 1
                    if jj >= m:
                        jj -= m
                if aborted:
                    break
            if aborted:
                break
            if not nt3:
                if any(hits[0][ii] or hits[1][ii] for ii in range(mode + 1)):
                    break

        # StringAlign stratum pick (align.cpp:583-588)
        for ii in range(rms + 1):
            s = len(hits[0][ii]) + len(hits[1][ii])
            if s > 0:
                return ReadResult(filtered=False, stratum=ii, nhits=s,
                                  hits0=hits[0][ii], hits1=hits[1][ii])
        return ReadResult(filtered=False, stratum=rms + 1, nhits=0,
                          hits0=[], hits1=[])
