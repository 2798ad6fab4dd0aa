"""Single-end alignment pipeline: orchestrates host IO/encode, the device
extension kernel, the exact scan replay, and SAM emission.

Equivalent of the reference driver loop (t_SingleAlign/Do_Batch,
main.cpp:60-92, align.cpp:565-580), restructured for a TPU:

  host:   batch read -> filter/trim -> encode planes -> seed schedule ->
          candidate table                      (numpy, overlappable)
  device: extend_kernel over all candidates    (jit / Pallas)
  host:   scan replay -> SAM text
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional

# NOTE: jax is imported lazily (inside DeviceContext and the mesh branch).
# Host-placement runs (HOST_EVAL=1 / jax-pinned-to-CPU auto) never touch a
# device, and the jax import alone costs ~1.7 s of process startup — a fixed
# tax the reference binary does not pay on short CLI runs.
import numpy as np

from ..config import AlignParams
from ..index.reference import PackedReference, load_reference
from ..index.seedindex import SeedIndex, build_index
from ..reads.encode import EncodedBatch, encode_batch
from ..reads.io import open_reads
from .candidates import SeedScheduler, build_candidates
from .replay import Replayer
from .rng import MyRand
from .sam import SamEmitter, sam_header


#: Above this many candidates the upload exceeds what a remote-TPU link
#: absorbs faster than the host's SIMD evaluator chews the same work
#: (~2 ns/candidate-word); locally attached chips should set
#: BASAL_TPU_HOST_EVAL=0 (always device) or raise the threshold.
HOST_EVAL_MIN = 2_000_000

# Once a run has processed this many reads, MADV_COLLAPSE the seed-index
# tables into 2 MiB pages on a background thread (native.madvise_collapse:
# the random gathers in seed scheduling are TLB-bound on 4 KiB pages, ~40%
# of bt_build_groups_mt; collapse costs ~5 s/172 MB table on this host, so
# only long runs amortize it).  BASAL_TPU_THP=0 disables, =1 forces at
# aligner construction.
THP_AFTER_READS = 150_000


def _maybe_start_thp(aligner) -> None:
    if aligner._thp_started or aligner.total_reads < THP_AFTER_READS:
        return
    aligner._thp_started = True
    if os.environ.get("BASAL_TPU_THP", "auto") == "0":
        return
    import threading

    from ..native import collapse_index_tables
    threading.Thread(target=collapse_index_tables,
                     args=(aligner.index, aligner.ref), daemon=True).start()


def _inline_tail_enabled() -> bool:
    """Whether the scan may evaluate unmaterialized candidates on the host
    at visit time (BASAL_TPU_HOST_EVAL=0 forces all evaluation onto the
    device, reverting to ladder waves)."""
    import os
    return os.environ.get("BASAL_TPU_HOST_EVAL", "auto") != "0"


def _cpu_backend() -> bool:
    """True when jax is pinned to the CPU backend (jax.config or
    JAX_PLATFORMS) — checked WITHOUT initializing a backend, so host-only
    runs never claim (or hang on) an accelerator tunnel."""
    import os
    import sys
    if "jax" not in sys.modules:
        # jax not loaded: the pin can only come from the environment, and
        # answering from it keeps host-only runs from paying the jax import
        return os.environ.get("JAX_PLATFORMS") == "cpu"
    try:
        import jax
        p = jax.config.jax_platforms
    except Exception:
        return False
    return p == "cpu" or (not p and os.environ.get("JAX_PLATFORMS") == "cpu")


def host_eval_policy(params: AlignParams, n_cands: int) -> bool:
    """True when this wave should run on the host SIMD evaluator instead of
    the device (BASAL_TPU_HOST_EVAL=0/1 forces; default adaptive).  With
    jax pinned to CPU there is no accelerator to win: the fused AVX C++
    evaluator beats the XLA-CPU kernel on every measured profile (short
    runs otherwise never flip the adaptive placement — tools/configbench.py
    measured C:T 0.77x stuck on 3 device waves), so auto routes straight
    to the host."""
    import os
    mode = os.environ.get("BASAL_TPU_HOST_EVAL", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    if _cpu_backend():
        return True
    return n_cands > HOST_EVAL_MIN


def _mode_name(params: AlignParams) -> str:
    if params.nt3:
        return "nt3"
    return "oneway" if params.rule.one_way else "multiway"


class DeviceContext:
    """Holds the packed reference on device and invokes the extend kernel."""

    _cache_set = False

    def __init__(self, ref: PackedReference, params: AlignParams):
        import os

        import jax
        if not DeviceContext._cache_set:
            DeviceContext._cache_set = True
            try:  # persistent jit cache: kills recompiles across processes
                cache = os.environ.get(
                    "BASAL_TPU_JIT_CACHE",
                    os.path.join(os.path.expanduser("~"), ".basal_tpu_jit"))
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
            except Exception:  # noqa: BLE001 - cache is best-effort
                pass
        self.params = params
        self.nw = ref.ref32.shape[1]
        self.ref_host = ref          # watchdog host-fallback evaluation
        self.stalls = 0              # device fetches that hit the watchdog
        self.ref32_dev = jax.device_put(ref.ref32.reshape(-1))
        self.mode = _mode_name(params)
        # Pallas count core (ungapped): default ON for real TPU devices —
        # measured 1.82x over the XLA kernel at production shapes
        # (tools/pallasbench.py, v5e: 191 vs 348 ms per 2^20 candidates,
        # 50-deep queues).  BASAL_TPU_PALLAS=0 forces XLA; on CPU the
        # kernel would need interpret mode, so XLA stays the default there.
        pal = os.environ.get("BASAL_TPU_PALLAS", "auto")
        if pal == "auto":
            # gate on where the planes actually landed (jax.default_device
            # may pin a CPU while a TPU is visible, e.g. dryrun_multichip)
            dplat = {d.platform for d in self.ref32_dev.devices()}
            self.use_pallas = dplat == {"tpu"}
        else:
            self.use_pallas = pal not in ("", "0")
        # measured dispatch->fetch wall time (adaptive placement input);
        # the first fetch is skipped — it folds in one-time chip claim and
        # jit compile, which would poison the steady-state cost estimate
        self.meas_t = 0.0
        self.meas_n = 0
        self._meas_skip = 1
        # wire accounting (tools/devbench.py speed-of-light analysis)
        self.up_bytes = 0
        self.up_waves = 0
        # single-transfer blob upload (ops.extend.carve_blob): packs loc+
        # strand+row_off+rowmeta+planes into ONE i32 array per wave and
        # derives the valid/lenmask planes on device — 1 transfer instead
        # of 3 (the tunnel charges ~35 ms per transfer) and ~40% fewer
        # uplink bytes.  Requires coords < 2^31 (strand rides loc bit 31);
        # BASAL_TPU_BLOB=0 reverts to the 3-transfer packed entry.
        self.use_blob = (os.environ.get("BASAL_TPU_BLOB", "1") not in ("", "0")
                         and 16 * self.nw < (1 << 31))

    @property
    def cost_per_cand(self):
        """Measured seconds per candidate through this device+link, or None
        until a wave of at least 16k candidates has been fetched."""
        return self.meas_t / self.meas_n if self.meas_n else None

    def _extend_async_one(self, enc: EncodedBatch, loc, plane, row):
        """Dispatch the extension kernel; returns (C, device result) without
        blocking, so host work for the next batch can overlap the device +
        transfer time (async dispatch).

        Upload minimization (the remote-TPU tunnel is bandwidth-limited):
        only rows that actually have candidates ship their planes, the
        per-candidate row ids become row offsets (candidates are grouped by
        row), and mode-unused planes become dummies.
        """
        import jax.numpy as jnp

        from ..ops.extend import extend_kernel
        p = self.params
        C = loc.shape[0]
        cpad = max(256, 1 << (C - 1).bit_length())  # pad to pow2 for jit reuse
        pad = cpad - C

        def padc(a, fill=0):
            return np.pad(a, (0, pad), constant_values=fill)

        # active-row compaction: `row` is non-decreasing (candidates are
        # emitted read-major; all fill paths preserve this)
        assert row.size == 0 or (np.diff(row) >= 0).all(), \
            "candidate rows must be non-decreasing for row-offset upload"
        used, first_idx = np.unique(row, return_index=True)
        row_off = np.empty(len(used) + 1, np.int64)
        row_off[:-1] = first_idx
        row_off[-1] = C
        U = len(used)
        upad = max(512, 1 << max(U - 1, 1).bit_length()) - U

        def padr(a):
            a = a[used]
            return np.pad(a, ((0, upad), (0, 0))) if upad else a

        def padr1(a):
            a = a[used]
            return np.pad(a, (0, upad)) if upad else a

        roff = np.pad(row_off, (0, upad), constant_values=C).astype(np.int32)
        Upad = U + upad

        if self.use_blob:
            res = self._extend_blob(enc, loc, plane, used, roff,
                                    cpad, pad, Upad, upad)
            if res is not None:
                return C, res

        need_mread = self.mode == "multiway"
        need_len = p.gap > 0
        # single packed meta + planes upload for BOTH kernels (tunnel RTT
        # amortization: the link charges ~35 ms per transfer, so per-array
        # uploads would cost ~7 RTTs/wave — measured as a 1.3-1.7x
        # end-to-end regression when the pallas path first shipped unpacked)
        meta = np.concatenate([
            padc(loc, 12800).astype(np.int32), roff,
            padr1(np.repeat(enc.n_count, 2)).astype(np.int32),
            padr1(np.repeat(enc.map_len, 2)).astype(np.int32)])
        plane_list = [padr(enc.base), padr(enc.valid)]
        if need_mread:
            plane_list.append(padr(enc.mread))
        if need_len:
            plane_list.append(padr(enc.lenmask))
        planes = np.concatenate(plane_list, axis=0)
        if self.use_pallas and p.gap == 0:
            from ..ops.extend_pallas import extend_counts_pallas_packed
            res = extend_counts_pallas_packed(
                self.ref32_dev, jnp.asarray(meta),
                jnp.asarray(planes),
                jnp.asarray(padc(plane).astype(np.uint8)),
                mode=self.mode, W=enc.W, nw=self.nw,
                C=cpad, U=Upad, n_planes=len(plane_list))
            return C, res
        import os
        if (self.use_pallas and p.gap > 0
                and os.environ.get("BASAL_TPU_PALLAS_GAP", "1") != "0"):
            # default ON wherever use_pallas is on (real TPU): measured
            # 1.88x over the XLA kernel at production gap shapes
            # (tools/pallasbench.py 20 gap, v5e: 768 vs 1443 ms per 2^20
            # candidates, 50-deep queues); bit-identical to the XLA kernel
            # in interpreter mode (tests/test_pallas_kernel.py).
            # BASAL_TPU_PALLAS_GAP=0 forces the XLA gapped kernel.
            from ..ops.extend_pallas import extend_gap_pallas_packed
            res = extend_gap_pallas_packed(
                self.ref32_dev, jnp.asarray(meta),
                jnp.asarray(planes),
                jnp.asarray(padc(plane).astype(np.uint8)),
                mode=self.mode, gap=p.gap, W=enc.W, nw=self.nw,
                C=cpad, U=Upad, n_planes=len(plane_list))
            return C, res
        from ..ops.extend import extend_kernel_packed
        res = extend_kernel_packed(
            self.ref32_dev, jnp.asarray(meta),
            jnp.asarray(planes),
            jnp.asarray(padc(plane).astype(np.uint8)),
            mode=self.mode, gap=p.gap, W=enc.W, nw=self.nw,
            C=cpad, U=Upad, n_planes=len(plane_list))
        return C, res

    def _extend_blob(self, enc: EncodedBatch, loc, plane, used, roff,
                     cpad, pad, Upad, upad):
        """Build the single-transfer wave blob (layout: ops.extend.carve_blob)
        and dispatch the matching kernel entry.  Returns the device result,
        or None when the wave is ineligible (> 4094 N-containing rows — the
        rowmeta exception field is 12 bits) so the caller falls back to the
        3-transfer packed entry.

        Rows whose validity plane equals the pure length mask (reads without
        Ns — the overwhelming majority) ship no validity words at all; the
        rare exceptions ride in a compact [E, W] tail indexed from rowmeta.
        """
        p = self.params
        built = self._build_blob(enc, loc, plane, used, roff, pad, upad)
        if built is None:
            return None
        blob, epad = built
        W = enc.W
        if self.use_pallas and p.gap == 0:
            from ..ops.extend_pallas import extend_counts_pallas_blob
            return extend_counts_pallas_blob(
                self.ref32_dev, blob, mode=self.mode, W=W, nw=self.nw,
                C=cpad, U=Upad, E=epad)
        if (self.use_pallas and p.gap > 0
                and os.environ.get("BASAL_TPU_PALLAS_GAP", "1") != "0"):
            from ..ops.extend_pallas import extend_gap_pallas_blob
            return extend_gap_pallas_blob(
                self.ref32_dev, blob, mode=self.mode, gap=p.gap, W=W,
                nw=self.nw, C=cpad, U=Upad, E=epad)
        from ..ops.extend import extend_kernel_blob
        return extend_kernel_blob(
            self.ref32_dev, blob, mode=self.mode, gap=p.gap, W=W,
            nw=self.nw, C=cpad, U=Upad, E=epad)

    def _build_blob(self, enc: EncodedBatch, loc, plane, used, roff,
                    pad, upad):
        """Assemble the carve_blob i32 buffer; (blob, E_padded) or None."""
        import jax.numpy as jnp
        hasn = getattr(enc, "_hasn_cache", None)
        if hasn is None:
            hasn = (enc.valid != enc.lenmask).any(axis=1)
            enc._hasn_cache = hasn  # per-batch: cached on the EncodedBatch
        excm = hasn[used]
        E = int(excm.sum())
        if E > 4094:
            return None
        U = len(used)
        epad = max(8, 1 << max(E - 1, 1).bit_length())  # bucketed jit shapes
        locp = (loc.astype(np.uint32)
                | (plane.astype(np.uint32) << np.uint32(31))).view(np.int32)
        exc = np.zeros(U, np.uint32)
        exc[excm] = 1 + np.arange(E, dtype=np.uint32)
        rl = np.repeat(enc.map_len, 2)[used].astype(np.uint32)
        nc = np.repeat(enc.n_count, 2)[used].astype(np.uint32)
        rowmeta = ((exc << np.uint32(20)) | (nc << np.uint32(10))
                   | rl).view(np.int32)
        parts = [np.pad(locp, (0, pad), constant_values=12800), roff,
                 np.pad(rowmeta, (0, upad))]

        def flat(a):
            a = a[used]
            if upad:
                a = np.pad(a, ((0, upad), (0, 0)))
            return a.reshape(-1).view(np.int32)

        parts.append(flat(enc.base))
        if self.mode == "multiway":
            parts.append(flat(enc.mread))
        ev = enc.valid[used][excm]
        if E < epad:
            ev = np.pad(ev, ((0, epad - E), (0, 0)))
        parts.append(ev.reshape(-1).view(np.int32))
        cat = np.concatenate(parts)
        self.up_bytes += cat.nbytes
        self.up_waves += 1
        return jnp.asarray(cat), epad

    # candidate-heavy batches (repetitive references) are evaluated in
    # chunks to bound HLO temp memory on the device
    CHUNK = 4 << 20

    def extend_async(self, enc, loc, plane, row):
        C = loc.shape[0]
        t0 = time.time()
        out = []
        for i in range(0, max(C, 1), self.CHUNK):
            l = loc[i:i + self.CHUNK]
            pl = plane[i:i + self.CHUNK]
            r = row[i:i + self.CHUNK]
            out.append(self._extend_async_one(enc, l, pl, r)
                       + (t0, (enc, l, pl, r)))
        return out

    # watchdog: a device fetch that exceeds this multiple of its expected
    # wall (measured cost_per_cand x C, floored) is declared stalled and
    # the wave is evaluated on the host instead (bit-exact twin); the
    # timeout wall feeds the measured cost, so repeated stalls flip the
    # adaptive placement hostward on their own.  The first fetch of a
    # process is exempt — chip claim + jit compile legitimately take
    # hundreds of seconds through the tunnel.  BASAL_TPU_WATCHDOG=0
    # disables; BASAL_TPU_WATCHDOG_MIN overrides the floor (seconds).
    WATCHDOG_FACTOR = 8.0

    def fetch(self, handles, _res=None):
        if _res is not None:            # legacy (C, res) call style
            handles = [(handles, _res, None, None)]
        outs = []
        for h in handles:
            C, res, t0 = h[0], h[1], h[2]
            fb = h[3] if len(h) > 3 else None
            outs.append(self._fetch_guarded(C, res, fb))
            if t0 is not None and C >= 16384:
                # dispatch -> results-on-host wall time per candidate: the
                # measured link+device cost that drives adaptive placement
                if self._meas_skip:
                    self._meas_skip -= 1
                else:
                    self.meas_t += time.time() - t0
                    self.meas_n += C
        if len(outs) == 1:
            return outs[0]
        counts = np.concatenate([o[0] for o in outs])
        if self.params.gap > 0:
            return (counts, np.concatenate([o[1] for o in outs]),
                    np.concatenate([o[2] for o in outs]))
        return counts, None, None

    def _fetch_guarded(self, C, res, fb):
        import sys
        cpc = self.cost_per_cand
        if (fb is None or self._meas_skip or cpc is None
                or os.environ.get("BASAL_TPU_WATCHDOG", "1") in ("", "0")):
            return self._fetch_one(C, res)
        timeout = max(
            float(os.environ.get("BASAL_TPU_WATCHDOG_MIN", "3")),
            self.WATCHDOG_FACTOR * cpc * max(C, 1))
        box = {}

        def run():
            try:
                box["v"] = self._fetch_one(C, res)
            except Exception as e:  # noqa: BLE001 - re-raised on the caller
                box["e"] = e

        import threading
        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout)
        if not th.is_alive():
            if "e" in box:
                raise box["e"]
            return box["v"]
        # stalled: evaluate this wave on the host evaluator (bit-exact
        # twin of the device kernel) and move on; the zombie fetch thread
        # is abandoned (its result is dropped whenever the link recovers)
        self.stalls += 1
        enc, loc, plane, row = fb
        print(f"[basal_tpu] device fetch stalled > {timeout:.1f}s "
              f"(wave of {C} candidates) - evaluated on host; "
              f"stall #{self.stalls}", file=sys.stderr)
        from ..native import (host_eval_candidates,
                              host_eval_candidates_gap)
        if self.params.gap > 0:
            counts, pos0, pos1 = host_eval_candidates_gap(
                self.params, self.ref_host, enc, loc, plane, row)
            return counts.astype(np.int32), pos0, pos1
        counts = host_eval_candidates(
            self.params, self.ref_host, enc, loc, plane, row)
        return counts.astype(np.int32), None, None

    def _fetch_one(self, C, res):
        if self.params.gap > 0:
            counts, pos0, pos1 = res
            return (np.asarray(counts)[:C].astype(np.int32),
                    np.asarray(pos0)[:C].astype(np.int32),
                    np.asarray(pos1)[:C].astype(np.int32))
        return np.asarray(res)[:C].astype(np.int32), None, None

    def extend(self, enc: EncodedBatch, loc, plane, row):
        return self.fetch(self.extend_async(enc, loc, plane, row))


class SingleEndAligner:
    def __init__(self, params: AlignParams, ref: PackedReference,
                 index, use_native: Optional[bool] = None):
        self.p = params
        self.ref = ref
        self.index = index
        self.rng = MyRand(params.randseed)
        self.sched = SeedScheduler(params, index, self.rng)
        self._dev = None  # lazy: host-only runs must never claim a device
        self._host_t = 0.0  # measured host-evaluator wall (s) / candidates
        self._host_n = 0
        # per-call C++ thread width; ThreadedRunner divides the cores among
        # its workers so -p N does not oversubscribe N x 8 threads
        self.nt_hint = 0  # 0 = auto (all cores)
        self.replayer = Replayer(params, ref, self.rng)
        rrbs_fn = None
        if params.rrbs_flag:
            from ..index.rrbs import ccgg_seglen
            rrbs_fn = (lambda c, l, L: ccgg_seglen(index, c, l, L))
        self.emitter = SamEmitter(params, ref, self.rng, rrbs_seglen=rrbs_fn)
        self.total_reads = 0
        self.total_candidates = 0
        self._thp_started = False
        if os.environ.get("BASAL_TPU_THP") == "1":
            from ..native import collapse_index_tables
            collapse_index_tables(index, ref)  # forced: collapse at startup
            self._thp_started = True
        # per-stage cost anatomy, printed at -V 2 (the reference keeps the
        # analogous total_candidates/total_seeds counters, align.h:98)
        self.stage = {
            "cand_device": 0,    # evaluated through the accelerator kernel
            "cand_host": 0,      # evaluated by the host SIMD evaluator
            "cand_visit": 0,     # left to visit-time eval inside the scan
            "dedup_saved": 0,    # duplicate (row,loc,plane) uploads avoided
            "waves_device": 0, "waves_host": 0, "waves_visit": 0,
            "eager_batches": 0, "ladder_batches": 0, "ladder_waves": 0,
            "fused_batches": 0,  # single-pass build+eval+scan (C++)
        }
        from ..native import NativeBatch, native_available
        if use_native is None:
            use_native = (native_available() and params.randseed != 0
                          and not params.rrbs_flag)
        self.native = (NativeBatch(params, index, ref)
                       if use_native else None)
        # RRBS fast path: C++ candidate build (bt_build_candidates_rrbs) +
        # host evaluation + C++ replay with per-candidate plane/skip; SAM
        # emission stays on the Python emitter (ZP/ZL fragment lookups).
        # BASAL_TPU_NO_NATIVE / randseed 0 keep the pure-Python twins.
        self.native_rrbs = None
        self.formatter = None
        if self.native is not None and not params.rrbs_flag:
            from ..native import NativeFormatter
            self.formatter = NativeFormatter(params, ref)
        elif (params.rrbs_flag and params.randseed != 0 and native_available()
                and os.environ.get("BASAL_TPU_NO_NATIVE") is None):
            self.native_rrbs = NativeBatch(params, index, ref)
            from ..native import NativeFormatter
            self.formatter = NativeFormatter(params, ref, rrbs_index=index)

    @property
    def dev(self):
        """Device context, created on first device dispatch.  Runs whose
        waves all take the host-SIMD evaluator (repetitive references with
        BASAL_TPU_HOST_EVAL=1/auto) never construct it, so they never pay
        the accelerator claim/attach cost."""
        if self._dev is None:
            import jax
            if len(jax.devices()) > 1:
                from ..parallel.mesh import make_sharded_context
                self._dev = make_sharded_context(self.ref, self.p)
            if self._dev is None:
                self._dev = DeviceContext(self.ref, self.p)
        return self._dev

    # -- two-phase API for the overlapped pipeline -----------------------
    def stats(self):
        """(aligned, unique, multiple) merged across the Python emitter and
        the native formatter."""
        e = self.emitter
        a, u, m = e.n_aligned, e.n_unique, e.n_multiple
        if self.formatter is not None:
            c = self.formatter.counters
            a += int(c[0])
            u += int(c[1])
            m += int(c[2])
        return a, u, m

    # Wave policy: evaluate every stratum's candidates in one device call
    # while the total volume is small.  On candidate-heavy inputs (repetitive
    # genomes: 10^4-10^5 candidates/read) climb the strata ladder instead —
    # wave k evaluates only stratum-k candidates of still-unresolved reads,
    # which reproduces the cost profile of the reference's pigeonhole early
    # stop (align.cpp:459-463) while staying batched.
    EAGER_MAX_CANDS = 2_000_000

    def encode_post(self, reads):
        """Encode a batch and POST its routing query without waiting
        (shard-resident index).  The reply lands on the service thread
        while the caller finishes the previous batch; submit_batch(reads,
        enc=...) then waits (usually a no-op) before any index read."""
        enc = encode_batch(self.p, reads)
        ens = getattr(self.index, "ensure_batch", None)
        if ens is not None:
            ens(enc, wait=False, extra=self._stale_seeds())
        return enc

    def _stale_seeds(self):
        """Current stale seed-buffer values (may be probed by this batch's
        (L-I+1)%s==0 reads but absent from its own seedval)."""
        nb = self.native
        st = nb.seed_state if nb is not None else self.sched.seed_state
        return st.reshape(-1)

    def submit_batch(self, reads, enc=None, routed_ready=False):
        """Host encode + lazy candidate build + async dispatch of wave 1.

        ``routed_ready=True`` asserts this batch's routing reply has
        already landed (the caller posted a LATER batch's query, and the
        single-slot post blocks until the prior reply is in), so the wait
        is skipped — see the read-ahead loop in _run_single_end."""
        if enc is None:
            from ..reads.io import RawBatch as _RB
            chk = self._fused_chunk()
            if (chk > 0 and self.native is not None
                    and isinstance(reads, _RB)
                    and getattr(self.index, "ensure_batch", None) is None
                    and len(reads) >= 2 * chk
                    and self._fused_host()):
                return self._submit_fused_chunked(reads)
            enc = encode_batch(self.p, reads)
            ens = getattr(self.index, "ensure_batch", None)
            if ens is not None:  # shard-resident index: one routed round
                ens(enc, extra=self._stale_seeds())
        elif not routed_ready:
            wb = getattr(self.index, "wait_batch", None)
            if wb is not None:
                wb()
        self.total_reads += len(reads)
        _maybe_start_thp(self)
        if self.native is None:
            return ("py", enc)
        from ..reads.io import RawBatch
        ridx = (enc.reads.indices if isinstance(enc.reads, RawBatch)
                else np.array([r.index for r in enc.reads], dtype=np.uint32))
        if self._fused_host():
            # single-pass C++ schedule + group build + visit-time scan:
            # no candidate buffers, and modes past each read's resolution
            # stratum are never evaluated (see bt_align_se_host)
            res, n_enum, n_eval = self.native.align_se_host(
                enc, ridx, self.ref, n_threads=self.nt_hint)
            self.total_candidates += n_enum
            self.stage["cand_visit"] += n_eval
            self.stage["waves_visit"] += 1
            self.stage["fused_batches"] += 1
            return ("fused", enc, res)
        groups, goff, total = self.native.build_groups(enc, ridx)
        ng = groups.shape[0]
        off = np.full(ng, -1, dtype=np.int64)
        if ng == 0:
            return ("native", enc, groups, goff, off, None, None, None, 99)
        eff = 99 if total <= self.EAGER_MAX_CANDS else 1
        sel = (np.arange(ng) if eff >= 99
               else np.flatnonzero(groups[:, 2] < eff))
        n1c = int(groups[sel, 6].sum())
        if total and self.p.gap > 0 and _inline_tail_enabled():
            # gapped: no bulk wave at all — one replay evaluates every
            # candidate at visit time (gap_align_ev's lazy
            # MismatchPattern0/1 under the scan's snp_thres aborts, like
            # the reference's per-candidate GapAlign, align.cpp:348-410).
            # This is the default for ANY volume in auto mode: the gapped
            # device wave downloads K_POS i16 position lists per candidate
            # per shifted alignment and expands them to i32 on the host —
            # measured 3x slower than the oracle on the random profile,
            # while visit-time eval is 2.4x ahead on the repeat profile
            # (tools/configbench.py / tools/gapbench.py).  BASAL_TPU_
            # HOST_EVAL=0 still forces the device ladder (XLA or pallas-gap
            # kernel).
            self.total_candidates += int(total)
            self.stage["cand_visit"] += int(total)
            self.stage["waves_visit"] += 1
            return ("native", enc, groups, goff, off, None,
                    ("inline", int(total)), None, 99)
        if n1c and self.p.gap == 0 and self._host_eval_policy(n1c):
            # fused wave-1 materialize + host evaluation (no fill/copy pass)
            loc = np.empty(n1c, np.int32)
            cnt = np.empty(n1c, np.int32)
            t0 = time.time()
            self.native.fill_eval_groups(enc, self.ref, groups, sel, off, 0,
                                         loc, cnt,
                                         n_threads=self.nt_hint)
            if n1c >= 16384:
                self._host_t += time.time() - t0
                self._host_n += n1c
            self.total_candidates += n1c
            self.stage["cand_host"] += n1c
            self.stage["waves_host"] += 1
            return ("native", enc, groups, goff, off, (loc, None, None),
                    ("host", cnt, None, None), None, eff)
        loc, plane, row = self.native.fill_groups(enc, groups, sel, off)
        self.total_candidates += loc.size
        handle, uinv = self._dispatch_unique(enc, loc, plane, row)
        return ("native", enc, groups, goff, off, (loc, plane, row),
                handle, uinv, eff)

    def _fused_chunk(self) -> int:
        """Chunk size for the cache-blocked fused host path (0 disables).
        Encode writes ~850 B/read of seed arrays that the fused align
        immediately re-reads; at 50k-read batches that is a 42 MB DRAM
        round trip per batch.  Encoding + aligning in chunks keeps the
        chunk's seed arrays LLC-resident between the two passes.
        Chunking is bit-exact by construction: it is identical to running
        smaller batches, and all cross-read state (sticky start offsets,
        stale seed buffers, myrand read indices) already carries serially
        across batch boundaries (tests/test_fused_chunked.py pins chunked
        == unchunked byte-for-byte).

        DEFAULT OFF (negative A/B, round 5): on this VM chunk=4096
        measured 670-710k reads/s vs 841-846k unchunked, 8192 slightly
        behind, 16384 a wash — per-chunk std::thread spawn/join in the C
        entries eats the locality win, and the shared-LLC slice here is
        too small for the 7-14 MB working sets to stick.  Kept behind the
        knob for hosts with large private LLCs."""
        v = os.environ.get("BASAL_TPU_FUSED_CHUNK", "0")
        try:
            return max(0, int(v))
        except ValueError:
            return 0

    def _submit_fused_chunked(self, reads):
        from ..reads.io import RawBatch
        chk = self._fused_chunk()
        self.total_reads += len(reads)
        _maybe_start_thp(self)
        out = []
        for s in range(0, len(reads), chk):
            e = min(s + chk, len(reads))
            sub = RawBatch(reads.buf, reads.name_off[s:e],
                           reads.name_len[s:e], reads.seq_off[s:e],
                           reads.seq_len[s:e], reads.qual_off[s:e],
                           reads.qual_len[s:e], reads.index0 + s,
                           reads.readset)
            enc = encode_batch(self.p, sub)
            res, n_enum, n_eval = self.native.align_se_host(
                enc, enc.reads.indices, self.ref, n_threads=self.nt_hint)
            self.total_candidates += n_enum
            self.stage["cand_visit"] += n_eval
            self.stage["waves_visit"] += 1
            out.append((enc, res))
        self.stage["fused_batches"] += 1
        return ("fused_chunks", out)

    # host wins a wave when its measured cost/candidate is below this
    # fraction of the device's (hysteresis against routing flapping)
    HOST_DEV_MARGIN = 0.7

    def _fused_host(self) -> bool:
        """Whether this batch should take the fused single-pass host path
        (bt_align_se_host).  Engages exactly when every wave would land on
        the host evaluator anyway: HOST_EVAL=1 forces, jax-on-cpu in auto
        mode, or the measured placement has settled on the host.  Gapped
        runs take it whenever visit-time eval is enabled (the auto default
        for ANY volume — see the gap comment in submit_batch).
        BASAL_TPU_FUSED=0 reverts to the split build/eval/replay pipeline
        (the golden twin the differential tests also exercise)."""
        if os.environ.get("BASAL_TPU_FUSED", "1") in ("", "0"):
            return False
        mode = os.environ.get("BASAL_TPU_HOST_EVAL", "auto")
        if mode == "0":
            return False
        if self.p.gap > 0:
            return _inline_tail_enabled()
        if mode == "1":
            return True
        if _cpu_backend():
            return True
        return self.measured_placement() == "host"

    def collapse_now(self) -> int:
        """Synchronously collapse the index tables into hugepages (see
        THP_AFTER_READS).  For callers with an explicit untimed setup
        window (bench.py warmup); returns arrays collapsed."""
        self._thp_started = True
        from ..native import collapse_index_tables
        return collapse_index_tables(self.index, self.ref)

    def measured_placement(self):
        """'host' | 'device' once BOTH paths have real measurements, else
        None.  Public: bench.py keys its batch-size choice on this instead
        of reaching into _host_t/_host_n/_dev."""
        if (self._dev is not None and self._dev.cost_per_cand is not None
                and self._host_n):
            host_cost = self._host_t / self._host_n
            return ("host" if host_cost
                    < self.HOST_DEV_MARGIN * self._dev.cost_per_cand
                    else "device")
        return None

    def _host_eval_policy(self, n_cands: int) -> bool:
        """Measured adaptive placement: beyond the static rules, once the
        device+link cost has been observed (cost_per_cand from real waves),
        probe the host evaluator once and from then on route each wave to
        whichever path measured cheaper per candidate.  On a locally
        attached chip the device wins and stays; through a slow tunnel the
        host wins.  Forced modes short-circuit in host_eval_policy."""
        import os
        if (os.environ.get("BASAL_TPU_HOST_EVAL", "auto") == "auto"
                and n_cands <= HOST_EVAL_MIN
                and self._dev is not None):
            if self._dev.cost_per_cand is not None:
                placement = self.measured_placement()
                if placement is None:
                    return n_cands >= 16384  # one measured host probe
                return placement == "host"
        return host_eval_policy(self.p, n_cands)

    def _host_eval_timed(self, enc, loc, plane, row):
        """Returns (counts, pos0, pos1); the position lists are None for
        gap == 0 and the gapped replay inputs otherwise."""
        from ..native import host_eval_candidates, host_eval_candidates_gap
        t0 = time.time()
        if self.p.gap > 0:
            counts, pos0, pos1 = host_eval_candidates_gap(
                self.p, self.ref, enc, loc, plane, row,
                n_threads=self.nt_hint)
        else:
            counts = host_eval_candidates(self.p, self.ref, enc, loc, plane,
                                          row, n_threads=self.nt_hint)
            pos0 = pos1 = None
        if loc.size >= 16384:
            self._host_t += time.time() - t0
            self._host_n += loc.size
        return counts, pos0, pos1

    def _dispatch_unique(self, enc, loc, plane, row):
        """Dedup identical (row, loc, plane) candidates before evaluation
        (interval probes regenerate the same alignment start up to
        seedsegs x I times on repeat-heavy genomes).  Skipped on light
        batches where the sort costs more than the duplicate eval."""

        # host evaluation has no upload to save: duplicates are cheaper to
        # re-evaluate (~2 ns) than to dedup (sort-based np.unique), so the
        # dedup step only runs for device dispatch
        if self._host_eval_policy(loc.size):
            self.stage["cand_host"] += loc.size
            self.stage["waves_host"] += 1
            return ("host",) + self._host_eval_timed(enc, loc, plane,
                                                     row), None

        self.stage["waves_device"] += 1

        def dispatch(l, p_, r):
            self.stage["cand_device"] += l.size
            return self.dev.extend_async(enc, l, p_.astype(np.int32), r)

        if loc.size < 4 * len(enc.reads):
            return dispatch(loc, plane, row), None
        key = ((row.astype(np.int64) << 33)
               | (loc.astype(np.int64) << 1) | plane.astype(np.int64))
        uniq, inv = np.unique(key, return_inverse=True)
        if len(uniq) < 0.75 * len(key):
            self.stage["dedup_saved"] += len(key) - len(uniq)
            order = np.argsort(inv, kind="stable")
            starts = np.searchsorted(inv[order], np.arange(len(uniq)))
            first = order[starts]
            return dispatch(loc[first], plane[first], row[first]), inv
        return dispatch(loc, plane, row), None

    def _fetch_expand(self, handle, uinv):
        if isinstance(handle, tuple) and handle[0] == "host":
            counts = np.asarray(handle[1], dtype=np.int32)  # no-op if i32
            pos0, pos1 = handle[2], handle[3]
        else:
            counts, pos0, pos1 = self.dev.fetch(handle)
        if uinv is not None:
            counts = counts[uinv]
            if pos0 is not None:
                pos0 = pos0[uinv]
                pos1 = pos1[uinv]
        return counts, pos0, pos1

    def prefetch_state(self, state):
        """Block on the wave-1 device results for a submitted state (device
        usage stays serialized with the caller); the remaining pure-host work
        can then run in a side thread via finish_batch_prefetched."""
        if state[0] in ("py", "fused", "fused_chunks") or state[6] is None:
            return None
        if isinstance(state[6], tuple) and state[6][0] == "inline":
            return None  # no wave-1 results: all-visit-time replay
        return self._fetch_expand(state[6], state[7])

    def finish_batch_prefetched(self, state, fetched) -> bytes:
        """finish_batch with the wave-1 fetch already done.  NOTE: ladder
        wave-2+ still issues device calls; callers that need strict device
        serialization should only use this on eager (single-wave) batches —
        wave 2 triggers for <5% of reads on non-repetitive references."""
        if fetched is None:
            return self.finish_batch(state)
        return self._finish_with(state, fetched)

    def finish_batch(self, state) -> bytes:
        if state[0] == "py":
            return self._align_batch_python(state[1])
        if state[0] == "fused":
            return self._emit_native(state[1], [(None, state[2])])
        if state[0] == "fused_chunks":
            return b"".join(self._emit_native(e, [(None, r)])
                            for e, r in state[1])
        return self._finish_with(state, self.prefetch_state(state))

    def _finish_with(self, state, fetched) -> str:
        (_, enc, groups, goff, off, arrs, handle, uinv, eff) = state
        p = self.p
        if handle is None or (isinstance(handle, tuple)
                              and handle[0] == "inline"):
            z = np.zeros(0, np.int32)
            t0 = time.time()
            res = self.native.replay_se(enc, groups, goff, z, None, z,
                                        None, None, counts_off=off,
                                        inline_eval=handle is not None,
                                        n_threads=self.nt_hint)
            if handle is not None and handle[1] >= 16384:
                # conservative host-cost sample (includes the scan itself)
                self._host_t += time.time() - t0
                self._host_n += handle[1]
            return self._emit_native(enc, [(None, res)])
        loc, plane, row = arrs
        counts, pos0, pos1 = (fetched if fetched is not None
                              else self._fetch_expand(handle, uinv))
        if eff >= 99:
            self.stage["eager_batches"] += 1
            res = self.native.replay_se(enc, groups, goff, loc, plane,
                                        counts, pos0, pos1, counts_off=off,
                                        n_threads=self.nt_hint)
            return self._emit_native(enc, [(None, res)])

        # strata ladder.  Candidate/count arrays grow each wave; appending
        # via np.concatenate re-copies the whole prefix every wave (O(waves
        # x C) memcpy — it dominated the repetitive profile), so the waves
        # append into amortized-doubling buffers instead.  The C++ replay
        # only dereferences offsets < cur, so passing the full-capacity
        # buffers is safe, and int32 buffers make replay_se's
        # ascontiguousarray a no-op.
        read_of_group = groups[:, 0]
        self.stage["ladder_batches"] += 1
        waves = []
        done = np.zeros(len(enc.reads), dtype=bool)
        lim = eff
        cur = loc.size
        cap = max(2 * cur, cur + (1 << 20))
        loc_buf = np.empty(cap, np.int32)
        loc_buf[:cur] = loc
        cnt_buf = np.empty(cap, np.int32)
        cnt_buf[:cur] = counts
        pos0_buf = pos1_buf = None
        if pos0 is not None:
            pos0_buf = np.empty((cap,) + pos0.shape[1:], np.int32)
            pos0_buf[:cur] = pos0
            pos1_buf = np.empty((cap,) + pos1.shape[1:], np.int32)
            pos1_buf[:cur] = pos1

        def _grow(need):
            nonlocal cap, loc_buf, cnt_buf, pos0_buf, pos1_buf
            if need <= cap:
                return
            cap = max(need, 2 * cap)

            def g(buf):
                nb = np.empty((cap,) + buf.shape[1:], buf.dtype)
                nb[:cur] = buf[:cur]
                return nb
            loc_buf, cnt_buf = g(loc_buf), g(cnt_buf)
            if pos0_buf is not None:
                pos0_buf, pos1_buf = g(pos0_buf), g(pos1_buf)

        while True:
            self.stage["ladder_waves"] += 1
            filt = np.ascontiguousarray(enc.filtered | done, np.uint8)
            res = self.native.replay_se(enc, groups, goff, loc_buf, plane,
                                        cnt_buf, pos0_buf, pos1_buf,
                                        mode_limit=lim,
                                        filtered_override=filt,
                                        counts_off=off,
                                        n_threads=self.nt_hint)
            incomplete = res[0] == -2
            newly = (~incomplete) & (~done)
            waves.append((newly, res))
            done |= newly
            if not incomplete.any():
                break
            sel = np.flatnonzero((groups[:, 2] == lim)
                                 & incomplete[read_of_group])
            n2 = int(groups[sel, 6].sum())  # column 6 = group size
            n_inc = int(incomplete.sum())
            if (_inline_tail_enabled()
                    and (n2 < 1_000_000 or n2 > 2_000 * n_inc)):
                # tail wave is either tiny (not worth a bulk round trip) or
                # mega-groups serving few reads (bulk evaluation would be
                # mostly wasted past the scan's abort points): finish with
                # ONE replay that evaluates the remaining candidates at
                # visit time inside the scan
                self.stage["cand_visit"] += n2
                self.stage["waves_visit"] += 1
                filt = np.ascontiguousarray(enc.filtered | done, np.uint8)
                res = self.native.replay_se(
                    enc, groups, goff, loc_buf, plane, cnt_buf,
                    pos0_buf, pos1_buf, mode_limit=99,
                    filtered_override=filt, counts_off=off,
                    inline_eval=True)
                waves.append((~done, res))
                return self._emit_native(enc, waves)
            self.total_candidates += n2
            _grow(cur + n2)
            if n2 and self.p.gap == 0 and self._host_eval_policy(n2):
                # fused C++ materialize + evaluate straight into the tail
                self.stage["cand_host"] += n2
                self.stage["waves_host"] += 1
                t0 = time.time()
                self.native.fill_eval_groups(
                    enc, self.ref, groups, sel, off, cur,
                    loc_buf[cur:cur + n2], cnt_buf[cur:cur + n2],
                    n_threads=self.nt_hint)
                if n2 >= 16384:
                    self._host_t += time.time() - t0
                    self._host_n += n2
                cur += n2
            elif n2:
                loc2, plane2, row2 = self.native.fill_groups(
                    enc, groups, sel, off, base=cur)
                h2, uinv2 = self._dispatch_unique(enc, loc2, plane2, row2)
                c2, p02, p12 = self._fetch_expand(h2, uinv2)
                loc_buf[cur:cur + n2] = loc2
                cnt_buf[cur:cur + n2] = c2
                if pos0_buf is not None and p02 is not None:
                    pos0_buf[cur:cur + n2] = p02
                    pos1_buf[cur:cur + n2] = p12
                cur += n2
            lim += 1
        return self._emit_native(enc, waves)

    def align_batch(self, reads) -> bytes:
        return self.finish_batch(self.submit_batch(reads))

    def _align_batch_rrbs_native(self, enc) -> bytes:
        """RRBS batch through the native engine: C++ candidate build +
        host-SIMD evaluation + C++ replay (per-candidate plane/skip) + the
        threaded C++ formatter (ZP/ZL via the CCGG_seglen twin).
        Byte-identical to the pure-Python path (test_differential_rrbs.py
        + fuzz); BASAL_TPU_NO_NATIVE=1 reverts."""
        from ..reads.io import RawBatch
        from ..native import host_eval_candidates, host_eval_candidates_gap
        nb = self.native_rrbs
        ridx = (enc.reads.indices if isinstance(enc.reads, RawBatch)
                else np.array([r.index for r in enc.reads], dtype=np.uint32))
        groups, goff, loc, plane, skip, row, total = \
            nb.build_candidates_rrbs(enc, ridx, self.index)
        self.total_candidates += total
        self.stage["cand_host"] += total
        self.stage["waves_host"] += 1
        pos0 = pos1 = None
        if total and self.p.gap > 0:
            counts, pos0, pos1 = host_eval_candidates_gap(
                self.p, self.ref, enc, loc, plane, row,
                n_threads=self.nt_hint)
        elif total:
            counts = host_eval_candidates(self.p, self.ref, enc, loc, plane,
                                          row, n_threads=self.nt_hint)
        else:
            counts = np.zeros(0, dtype=np.int32)
        res = nb.replay_se(enc, groups, goff, loc, None, counts, pos0, pos1,
                           n_threads=self.nt_hint,
                           rr_plane=plane, rr_skip=skip)
        return self._emit_native(enc, [(None, res)])

    def _align_batch_python(self, enc) -> bytes:
        if self.p.rrbs_flag:
            if self.native_rrbs is not None:
                return self._align_batch_rrbs_native(enc)
            from .candidates import build_candidates_rrbs
            table = build_candidates_rrbs(self.p, self.index, self.ref, enc,
                                          self.sched)
        else:
            table = build_candidates(self.p, self.index, enc, self.sched)
        self.total_candidates += table.loc.size
        if table.loc.size:
            counts, pos0, pos1 = self.dev.extend(
                enc, table.loc, table.plane, table.row)
        else:
            counts = np.zeros(0, dtype=np.int32)
            pos0 = pos1 = None
        results = self.replayer.replay_batch(enc, table, counts, pos0, pos1)
        out: List[str] = []
        for read, res, L in zip(enc.reads, results, enc.map_len):
            self.emitter.emit_read(read, res, int(L), out)
        return "".join(out).encode("latin1")

    def _emit_native(self, enc, waves) -> bytes:
        from .replay import ReadResult

        def read_result(res, i):
            (stratum, n0, n1, hchr, hloc, hgsz, hgpos, hchain, hoff) = res
            if stratum[i] < 0:
                return ReadResult(filtered=True)
            a, b = int(hoff[i]), int(hoff[i + 1])
            hits = [(int(hchr[j]), int(hloc[j]), int(hgsz[j]),
                     int(hgpos[j])) for j in range(a, b)]
            k0 = int(n0[i])
            return ReadResult(filtered=False, stratum=int(stratum[i]),
                              nhits=b - a, hits0=hits[:k0], hits1=hits[k0:])

        if self.formatter is not None and len(waves) == 1:
            # counters accumulate inside the native formatter; stats() merges
            return self.formatter.format(enc, waves[0][1],
                                         n_threads=self.nt_hint)
        out: List[str] = []
        for i, read in enumerate(enc.reads):
            res = None
            for mask, wres in waves:
                if mask is None or mask[i]:
                    res = read_result(wres, i)
                    break
            if res is None:  # only possible if every wave skipped it
                res = read_result(waves[-1][1], i)
            self.emitter.emit_read(read, res, int(enc.map_len[i]), out)
        return "".join(out).encode("latin1")

class ThreadedRunner:
    """-p worker pool: the TPU-native replacement for the reference's pthread
    fan-out (t_SingleAlign, main.cpp:60-92).  Each worker owns a full aligner
    (private scheduler state, like each pthread's SingleAlign instance); the
    C++ engine and numpy release the GIL, so host phases of consecutive
    batches overlap.  Output is written in batch order (deterministic, a
    valid interleaving of the reference's mutex-ordered appends)."""

    def __init__(self, params, ref, index, n_workers: int):
        from concurrent.futures import ThreadPoolExecutor
        import os
        self.aligners = [SingleEndAligner(params, ref, index)
                         for _ in range(n_workers)]
        nt = max(1, len(os.sched_getaffinity(0)) // n_workers)
        for a in self.aligners:
            a.nt_hint = nt  # divide cores among workers
        # One single-thread executor per aligner: batches that round-robin
        # onto the same (stateful) aligner are serialized by its own queue,
        # so correctness never depends on the caller's drain window.
        self.pools = [ThreadPoolExecutor(1) for _ in range(n_workers)]
        self.n = n_workers
        self.i = 0

    def submit(self, reads):
        slot = self.i % self.n
        self.i += 1
        return self.pools[slot].submit(self.aligners[slot].align_batch, reads)

    def counters(self):
        totals = [a.stats() for a in self.aligners]
        return tuple(sum(t[i] for t in totals) for i in range(3))

    def shutdown(self):
        for p in self.pools:
            p.shutdown()


def run_single_end(params: AlignParams, ref_path: str, reads_path: str,
                   out_fh=None, command_line: str = "basal_tpu",
                   log=lambda *a: None, index_factory=None,
                   timings: Optional[dict] = None):
    # observability (SURVEY §5): BASAL_TPU_PROFILE=<dir> captures a JAX
    # profiler trace of the whole run (device + host annotations); per-batch
    # reads/s are logged at -V 2 like the reference's batch lines
    import os as _os
    prof_dir = _os.environ.get("BASAL_TPU_PROFILE")
    if prof_dir:
        import jax.profiler as _prof
        _prof.start_trace(prof_dir)
    from .. import malloc_window
    try:
        with malloc_window():
            return _run_single_end(params, ref_path, reads_path, out_fh,
                                   command_line, log, index_factory, timings)
    finally:
        if prof_dir:
            import jax.profiler as _prof
            _prof.stop_trace()


def stage_report(aligners) -> str:
    """One-line cost anatomy merged over worker aligners: where candidates
    were evaluated (device kernel / host SIMD / visit-time in the scan),
    wave and placement decision counts, dedup savings.  Printed at -V 2;
    the reference's analogue is its total_candidates/total_seeds counters
    (align.h:98)."""
    keys = aligners[0].stage.keys()
    s = {k: sum(a.stage[k] for a in aligners) for k in keys}
    n_cand = sum(a.total_candidates for a in aligners) or 1
    n_reads = sum(a.total_reads for a in aligners) or 1
    return (f"cost anatomy: {n_cand} candidates ({n_cand/n_reads:.1f}/read) "
            f"| eval: device {s['cand_device']} host {s['cand_host']} "
            f"visit-time {s['cand_visit']} dedup-saved {s['dedup_saved']} "
            f"| waves: device {s['waves_device']} host {s['waves_host']} "
            f"visit {s['waves_visit']} "
            f"| batches: eager {s['eager_batches']} "
            f"ladder {s['ladder_batches']} "
            f"(ladder waves {s['ladder_waves']}) "
            f"fused {s['fused_batches']}")


def _run_single_end(params: AlignParams, ref_path: str, reads_path: str,
                    out_fh=None, command_line: str = "basal_tpu",
                    log=lambda *a: None, index_factory=None,
                    timings: Optional[dict] = None):
    t0 = time.time()
    ref = load_reference(ref_path, params)
    log(f"{ref.total_num} reference seqs loaded, total size {ref.sum_length} bp. "
        f"{time.time()-t0:.0f} secs passed")
    if timings is not None:
        timings["t_ref"] = time.time() - t0
    if index_factory is not None:
        # multi-host: shard-resident RoutedSeedIndex (parallel/multihost.py)
        index = index_factory(ref, params)
    elif params.rrbs_flag:
        from ..index.rrbs import build_rrbs_index
        index = build_rrbs_index(ref_path, ref, params)
    else:
        index = build_index(ref, params)
    log(f"create seed table. {time.time()-t0:.0f} secs passed")
    if timings is not None:
        timings["t_index"] = time.time() - t0 - timings["t_ref"]
        timings["t_align_start"] = time.time()

    out_fh = out_fh or sys.stdout
    if params.sam_header:
        out_fh.write(sam_header(ref, params, command_line).encode('latin1'))
    reader = open_reads(reads_path, params, readset=0)
    if params.num_threads > 1 and params.randseed != 0 and not params.rrbs_flag:
        from collections import deque
        runner = ThreadedRunner(params, ref, index, params.num_threads)
        futures = deque()
        while True:
            reads = reader.next_batch()
            if reads:
                futures.append(runner.submit(reads))
            while futures and (not reads or len(futures) > runner.n):
                out_fh.write(futures.popleft().result())
                log(f"{reader.index - params.read_start + 1} reads finished. "
                    f"{time.time()-t0:.0f} secs passed")
            if not reads:
                break
        runner.shutdown()
        n_al, n_un, n_mu = runner.counters()

        class _E:  # counters facade for the summary below
            n_aligned, n_unique, n_multiple = n_al, n_un, n_mu
        e = _E
        aligner = runner.aligners[0]
        reader.close()
        n_total = max(reader.index - params.read_start + 1, 1)
        log(f"total reads: {reader.index - params.read_start + 1} \t"
            f"total time: {time.time()-t0:.0f} secs")
        log(f"aligned reads: {e.n_aligned} ({100.0*e.n_aligned/n_total:.1f}%), "
            f"unique reads: {e.n_unique} ({100.0*e.n_unique/n_total:.1f}%), "
            f"non-unique reads: {e.n_multiple} "
            f"({100.0*e.n_multiple/n_total:.1f}%)")
        log(stage_report(runner.aligners), 2)
        return aligner

    aligner = SingleEndAligner(params, ref, index)
    # two-deep pipeline: host-encode/dispatch batch k+1 while batch k's
    # device results stream back (JAX async dispatch covers the device+RPC
    # latency; the replay only blocks when it fetches).  With a routed
    # (multi-host) index, batch k+1's routing query is POSTED before batch
    # k's ALIGN phase (read-ahead), so the cross-host round trip hides
    # behind the fused align instead of sitting on the critical path —
    # posting early is safe because the shard cache is cumulative: any
    # stale-buffer value batch k+1 can probe came from an already-posted
    # batch's seedval (or the initial zero state, posted with batch 0),
    # and the single-slot post blocks until batch k's own reply landed,
    # which is what makes routed_ready=True sound.
    routed = hasattr(index, "wait_batch")
    pending = None
    if routed:
        reads_cur = reader.next_batch()
        enc_cur = aligner.encode_post(reads_cur) if reads_cur else None
        while reads_cur:
            reads_next = reader.next_batch()
            enc_next = (aligner.encode_post(reads_next)
                        if reads_next else None)
            if pending is not None:
                out_fh.write(aligner.finish_batch(pending))
                log(f"{reader.index - params.read_start + 1} reads "
                    f"finished. {time.time()-t0:.0f} secs passed")
            pending = aligner.submit_batch(
                reads_cur, enc=enc_cur, routed_ready=enc_next is not None)
            reads_cur, enc_cur = reads_next, enc_next
        if pending is not None:
            out_fh.write(aligner.finish_batch(pending))
            log(f"{reader.index - params.read_start + 1} reads finished. "
                f"{time.time()-t0:.0f} secs passed")
    else:
        while True:
            reads = reader.next_batch()
            state = aligner.submit_batch(reads) if reads else None
            if pending is not None:
                out_fh.write(aligner.finish_batch(pending))
                log(f"{reader.index - params.read_start + 1} reads "
                    f"finished. {time.time()-t0:.0f} secs passed")
            pending = state
            if state is None:
                break
    reader.close()
    n_al, n_un, n_mu = aligner.stats()

    class _E2:
        n_aligned, n_unique, n_multiple = n_al, n_un, n_mu
    e = _E2
    n_total = max(reader.index - params.read_start + 1, 1)
    log(f"total reads: {reader.index - params.read_start + 1} \t"
        f"total time: {time.time()-t0:.0f} secs")
    log(f"aligned reads: {e.n_aligned} ({100.0*e.n_aligned/n_total:.1f}%), "
        f"unique reads: {e.n_unique} ({100.0*e.n_unique/n_total:.1f}%), "
        f"non-unique reads: {e.n_multiple} ({100.0*e.n_multiple/n_total:.1f}%)")
    log(stage_report([aligner]), 2)
    return aligner
