"""On-chip Pallas-vs-XLA measurement for the extension cores
(VERDICT round-1 weak #5: "benchmark Pallas on the real chip and make a
decision").

Times device-only execution (inputs pre-committed, forced 1-byte fetch) of
the XLA vs Pallas kernels at production shapes: C = 2^20 candidates, 100 bp
reads (W = 7 u32 words), U = 8192 active rows, 50 Mbp reference (nw covers
it).  Run on the real TPU only (one process may hold the chip):

    python tools/pallasbench.py [C_log2]        # ungapped counts core
    python tools/pallasbench.py [C_log2] gap    # gapped (counts+positions)

The gapped comparison benches the PACKED entries the pipeline actually
dispatches (extend_kernel_packed gap=3 vs extend_gap_pallas_packed) on
identical pre-committed meta/planes buffers, oneway rule (the BID-seq
`-M T:- -g 3` shape, reference align.cpp:348-410).

Appends nothing; prints per-pass ms and the winner.  Results recorded in
docs/PERF.md.
"""
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from basal_tpu.ops.extend import extend_kernel, extend_kernel_packed
from basal_tpu.ops.extend_pallas import (extend_counts_pallas,
                                         extend_gap_pallas_packed)

CLOG = int(sys.argv[1]) if len(sys.argv) > 1 else 20
GAPPED = len(sys.argv) > 2 and sys.argv[2] == "gap"
C = 1 << CLOG
W = 7            # 100 bp reads: ceil(100/16) u32 words
U = 8192         # active rows (reads with candidates in the wave)
NW = 50_000_000 // 16 + 4

rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"[pallasbench] device: {dev}", file=sys.stderr)


def timeit(fn, label):
    out = fn()
    jax.block_until_ready(out)
    first = out[0] if isinstance(out, tuple) else out
    np.asarray(first[:1])        # compile + warm + real round-trip
    # block_until_ready on a tunneled device can acknowledge scheduling
    # without executing; a 1-byte device->host fetch provably waits.
    # K back-to-back dispatches serialize on the device queue, so
    # per-call = (wall - 1 RTT) / K with RTT measured by a no-op fetch.
    K = 50
    t0 = time.perf_counter()
    np.asarray(first[:1])
    rtt = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(K):
            last = fn()
        lastf = last[0] if isinstance(last, tuple) else last
        np.asarray(lastf[:1])
        times.append((time.perf_counter() - t0 - rtt) / K * 1e3)
    med = sorted(times)[len(times) // 2]
    print(f"[pallasbench] {label} C=2^{CLOG}: "
          f"median {med:.3f} ms/call over {K}-deep queues "
          f"(rtt {rtt*1e3:.1f} ms)  ({C/med/1e3:.0f}k cand/ms)  "
          f"passes={['%.3f' % t for t in times]}", file=sys.stderr)
    return med


if GAPPED:
    # packed buffers exactly as pipeline._extend_async_one builds them for
    # gap>0 oneway: meta = loc | row_off | ncnt | readlen,
    # planes = base | valid | lenmask (n_planes=3), plus the u8 strand plane
    GAP = 3
    loc_np = rng.integers(64, 16 * (NW - W - 8), C).astype(np.int32)
    roff_np = np.linspace(0, C, U + 1).astype(np.int32)
    meta_np = np.concatenate([
        loc_np, roff_np,
        np.zeros(U, np.int32), np.full(U, 100, np.int32)])
    planes_np = np.concatenate([
        rng.integers(0, 1 << 32, (U, W), dtype=np.uint32),
        np.full((U, W), 0xFFFFFFFF, dtype=np.uint32),
        np.full((U, W), 0xFFFFFFFF, dtype=np.uint32)], axis=0)
    ref32 = jax.device_put(
        rng.integers(0, 1 << 32, 2 * NW, dtype=np.uint32), dev)
    meta = jax.device_put(meta_np, dev)
    planes = jax.device_put(planes_np, dev)
    plane8 = jax.device_put(
        rng.integers(0, 2, C).astype(np.uint8), dev)

    results = {}
    for name in ("xla", "pallas"):
        if name == "xla":
            fn = lambda: extend_kernel_packed(
                ref32, meta, planes, plane8, mode="oneway", gap=GAP,
                W=W, nw=NW, C=C, U=U, n_planes=3)
        else:
            fn = lambda: extend_gap_pallas_packed(
                ref32, meta, planes, plane8, mode="oneway", gap=GAP,
                W=W, nw=NW, C=C, U=U, n_planes=3)
        results[name] = timeit(fn, f"gap={GAP} oneway {name:7s}")
    x, p = results["xla"], results["pallas"]
    print(f"[pallasbench] gapped oneway: pallas/xla = {p/x:.3f} "
          f"({'pallas wins' if p < x else 'xla wins'})", file=sys.stderr)
    sys.exit(0)

ref32 = jax.device_put(
    rng.integers(0, 1 << 32, 2 * NW, dtype=np.uint32), dev)
loc = jax.device_put(
    rng.integers(16, 16 * (NW - W - 4), C).astype(np.int32), dev)
plane = jax.device_put(rng.integers(0, 2, C).astype(np.int32), dev)
row_off = jax.device_put(
    np.linspace(0, C, U + 1).astype(np.int32), dev)
base = jax.device_put(
    rng.integers(0, 1 << 32, (U, W), dtype=np.uint32), dev)
valid = jax.device_put(
    np.full((U, W), 0xFFFFFFFF, dtype=np.uint32), dev)
mread = jax.device_put(
    rng.integers(0, 1 << 32, (U, W), dtype=np.uint32), dev)
lenmask = valid
ncnt = jax.device_put(np.zeros(U, np.int32), dev)
readlen = jax.device_put(np.full(U, 100, np.int32), dev)

results = {}
for mode in ("oneway", "multiway"):
    for name in ("xla", "pallas"):
        if name == "xla":
            fn = lambda: extend_kernel(
                ref32, loc, plane, row_off, base, valid, mread, lenmask,
                ncnt, readlen, mode=mode, gap=0, W=W, nw=NW)
        else:
            fn = lambda: extend_counts_pallas(
                ref32, loc, plane, row_off, base, valid, mread, ncnt,
                mode=mode, W=W, nw=NW)
        results[(mode, name)] = timeit(fn, f"{mode:9s} {name:7s}")

for mode in ("oneway", "multiway"):
    x, p = results[(mode, "xla")], results[(mode, "pallas")]
    print(f"[pallasbench] {mode}: pallas/xla = {p/x:.3f} "
          f"({'pallas wins' if p < x else 'xla wins'})", file=sys.stderr)
