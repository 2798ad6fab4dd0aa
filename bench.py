"""Driver benchmark: reads/s/chip on 100bp SE -M A:G + SAM equality vs BASAL.

Prints ONE JSON line:
  {"metric": ..., "value": reads/s, "unit": "reads/s", "vs_baseline": ratio}

value        = our steady-state alignment throughput on the attached device
               (excludes one warmup batch used for jit compilation).
vs_baseline  = value / single-thread reference-BASAL reads/s measured on this
               host with startup (index build) subtracted, i.e. steady-state
               vs steady-state.  SAM equality vs the oracle is verified on the
               same data (-S fixed) and reported in extra fields.
"""

import json
import os
import random
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

# Profile "random" (default): 2 Mbp random reference — candidate volume
# ~9/read, wire-friendly; matches BASELINE.md config 1's "small FASTA ref".
# Profile "repeat": 50 Mbp with ~45% diverged repeats — realistic candidate
# explosion (~60k enumerated/read); through this round's remote-TPU tunnel
# (~50 MB/s) the wire dominates there, see docs/PERF.md.
PROFILE = os.environ.get("BENCH_PROFILE", "random")
N_READS = int(os.environ.get("BENCH_READS",
                             600_000 if PROFILE == "random" else 200_000))
GENOME = int(os.environ.get("BENCH_GENOME",
                            2_000_000 if PROFILE == "random" else 50_000_000))
READLEN = 100
BATCH = 25_000
SEED = 20260816


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_data(d: Path):
    """Repeat-structured genome (~45% diverged 300bp transposon-like copies)
    — representative of the mammalian genomes/transcriptomes the GLORI/eTAM
    headline workload maps against; pure-random references understate the
    candidate load for any aligner."""
    import numpy as np
    ref_p, fq_p = d / "ref.fa", d / "reads.fq"
    stamp = d / f".stamp_{PROFILE}_{GENOME}_{N_READS}_{SEED}"
    if stamp.exists() and ref_p.exists() and fq_p.exists():
        return ref_p, fq_p
    # ref.fa/reads.fq are shared across configs: purge other configs'
    # stamps so a stale one can never vouch for the wrong dataset
    for old in d.glob(".stamp_*"):
        old.unlink()
    rng = np.random.default_rng(SEED)
    NT = np.frombuffer(b"ACGT", np.uint8)
    if PROFILE == "repeat":
        alu = rng.choice(NT, size=300)
        parts = []
        total = 0
        while total < GENOME:
            u = rng.choice(NT, size=int(rng.integers(300, 1200)))
            parts.append(u)
            total += len(u)
            for _ in range(int(rng.integers(1, 4))):
                cp = np.where(rng.random(300) < 0.05,
                              rng.choice(NT, size=300), alu).astype(np.uint8)
                parts.append(cp)
                total += 300
        g = np.concatenate(parts)[:GENOME]
    else:
        g = rng.choice(NT, size=GENOME)
    with open(ref_p, "wb") as f:
        f.write(b">chr1\n")
        n = len(g) // 60 * 60
        f.write(b"\n".join(g[:n].reshape(-1, 60).view("S60").ravel()) + b"\n")
        if n < len(g):
            f.write(g[n:].tobytes() + b"\n")
    pos = rng.integers(0, len(g) - READLEN, N_READS)
    reads = np.stack([g[p:p + READLEN] for p in pos])
    conv = (reads == ord("A")) & (rng.random(reads.shape) < 0.5)
    reads = np.where(conv, ord("G"), reads)
    err = rng.random(reads.shape) < 0.005
    reads = np.where(err, rng.choice(NT, size=reads.shape),
                     reads).astype(np.uint8)
    with open(fq_p, "wb") as f:
        qual = b"I" * READLEN
        for i in range(N_READS):
            f.write(b"@r%d\n" % i + reads[i].tobytes() + b"\n+\n" + qual
                    + b"\n")
    stamp.touch()
    return ref_p, fq_p


def ensure_oracle():
    oracle = ROOT / ".oracle" / "basal"
    if oracle.exists():
        return oracle
    script = ROOT / "tools" / "build_oracle.sh"
    if Path("/root/reference").exists() and script.exists():
        try:
            subprocess.run(["bash", str(script)], check=True,
                           capture_output=True, timeout=600)
        except Exception as e:  # noqa: BLE001
            log(f"oracle build failed: {e}")
    return oracle if oracle.exists() else None


def time_oracle(oracle, ref, reads, workdir):
    """Single-thread reference reads/s, align-only: min-of-2 full runs minus
    min-of-2 startup runs (-E 1 aligns a single read, so it measures ref
    load + index build + process startup).  min-of-2 suppresses page-cache
    and scheduler noise; the old half-vs-full slope was numerically unstable
    when alignment was much cheaper than the index build."""
    base = [str(oracle), "-d", str(ref), "-M", "A:G", "-S", "1", "-V", "0",
            "-p", "1"]

    def run(extra, out):
        t0 = time.time()
        subprocess.run(base + ["-a", str(reads), *extra, "-o",
                               str(workdir / out)],
                       check=True, capture_output=True)
        return time.time() - t0

    run(["-E", "1"], "oracle1.sam")  # cold: warm the page cache
    t_base = min(run(["-E", "1"], "oracle1.sam") for _ in range(3))
    t_fulls = [run([], "oracle.sam") for _ in range(2)]
    t_full = min(t_fulls)
    dt = max(t_full - t_base, 1e-3)
    log(f"oracle wall: startup {t_base:.2f}s full {t_fulls} -> "
        f"align {dt:.2f}s")
    return N_READS / dt, t_full, t_base


def oracle_once(oracle, ref, reads, workdir, t_base):
    """One more timed oracle run (same-window pairing with our passes:
    this guest sees double-digit steal-time storms from host neighbors, so
    a ratio of measurements taken minutes apart can be off 5x either way;
    pairing each of our passes with an immediately following oracle run
    makes the ratio contention-robust)."""
    t0 = time.time()
    subprocess.run([str(oracle), "-d", str(ref), "-M", "A:G", "-S", "1",
                    "-V", "0", "-p", "1", "-a", str(reads),
                    "-o", str(workdir / "oracle.sam")],
                   check=True, capture_output=True)
    wall = max(time.time() - t0 - t_base, 1e-3)
    return N_READS / wall, wall


def main():
    work = ROOT / ".oracle" / "benchdata"
    work.mkdir(parents=True, exist_ok=True)
    ref_fa, reads_fq = make_data(work)
    log(f"data: {GENOME} bp genome, {N_READS} reads")

    # time the reference FIRST, on a quiet machine (our TPU process sitting
    # idle in claim-wait was previously inflating its wall time)
    oracle = ensure_oracle()
    orps = t_full = t_start = None
    if oracle:
        orps, t_full, t_start = time_oracle(oracle, ref_fa, reads_fq, work)
        log(f"oracle single-thread: {orps:.0f} reads/s "
            f"(full {t_full:.1f}s, startup {t_start:.1f}s)")

    # The axon tunnel has outage windows during which backend init either
    # raises UNAVAILABLE or hangs indefinitely in a connect-retry loop
    # (observed 2026-08-18: one process slept 17 min, a retry errored after
    # 50).  Probe it in a disposable subprocess with a hard timeout; on
    # failure fall back to jax-cpu so the bench still measures the
    # (placement-adaptive) host path and reports a metric.
    # (the chip CLAIM happens at the first device fetch, not at backend
    # init — a healthy tunnel answers jax.devices() in seconds, an outage
    # hangs it for 15+ minutes, so a 240s probe cannot misclassify a
    # cold-but-healthy tunnel)
    platform = "tpu"
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices()[0]; print(d.platform, d)"],
            timeout=240, capture_output=True)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode()[-200:])
        probed = r.stdout.decode().strip().lower()
        if "tpu" not in probed and "axon" not in probed:
            raise RuntimeError(f"backend came up as {probed!r}, not TPU")
    except Exception as e:
        log(f"TPU probe failed ({type(e).__name__}); falling back to jax-cpu")
        platform = "cpu-fallback"

    from basal_tpu.config import AlignParams
    from basal_tpu.index.reference import load_reference
    from basal_tpu.index.seedindex import build_index
    from basal_tpu.reads.io import open_reads
    from basal_tpu.align.pipeline import SingleEndAligner
    import jax
    if platform == "cpu-fallback":
        jax.config.update("jax_platforms", "cpu")

    log(f"jax devices: {jax.devices()}")
    # batch size: 25k keeps tunnel uploads small; on the cpu fallback the
    # host path prefers the reference's own 50k batches (+20% measured)
    global BATCH
    if platform == "cpu-fallback" and PROFILE == "random":
        BATCH = 50_000  # repeat profile keeps 25k (bounded candidate tables)
    p = AlignParams(conversion="A:G", randseed=1, verbose_level=0)
    t0 = time.time()
    ref = load_reference(str(ref_fa), p)
    idx = build_index(ref, p)
    log(f"index built in {time.time()-t0:.1f}s")
    al = SingleEndAligner(p, ref, idx)

    rd = open_reads(str(reads_fq), p)
    sam_parts = []
    # warmup batch at the production shape: jit compile + tunnel chip claim +
    # first device fetch (the axon tunnel's first device->host fetch can take
    # minutes; one-time per process)
    b = rd.next_batch(BATCH)
    t0 = time.time()
    sam_parts.append(al.align_batch(b))
    t_warm = time.time() - t0
    log(f"warmup batch ({len(b)} reads): {t_warm:.1f}s")
    n_warm = len(b)
    # settle the adaptive device/host placement before any timed pass: the
    # cost model needs one measured device wave + one measured host probe
    # (the very first fetch is deliberately excluded from the estimate), so
    # two more untimed batches make pass 0 steady-state
    for _ in range(2):
        b = rd.next_batch(BATCH)
        if not b:
            break
        st = al.submit_batch(b)
        sam_parts.append(al.finish_batch_prefetched(st, al.prefetch_state(st)))
        n_warm += len(b)
    log(f"placement settled after {n_warm} warmup reads")
    # hugepage-collapse the index tables inside the untimed warmup window
    # (TLB-bound seed-scheduling gathers; first-time THP faults on this
    # virtualized host are expensive, so pay them here, not in a timed pass
    # or the background trigger during one)
    t0 = time.time()
    ncol = al.collapse_now()
    log(f"index tables collapsed to hugepages: {ncol} arrays "
        f"in {time.time()-t0:.1f}s")
    # placement-aware batch size: when the measured placement settles on the
    # host evaluator (the usual outcome through the remote tunnel, where the
    # link cost dominates), the steady passes switch to the reference's own
    # 50k batches — host-path fixed costs amortize (+20% measured, same tune
    # as the cpu-fallback branch above).  A device-routed placement keeps
    # 25k batches: small tunnel uploads, no recompile at a new bucket.
    if (platform == "tpu" and PROFILE == "random"
            and al.measured_placement() == "host"
            and N_READS - n_warm >= 2 * 50_000):
        BATCH = 50_000
        log("measured placement = host evaluator; steady passes use "
            "50k-read batches")
        # one untimed batch at the new size: the first 50k batch grows
        # every per-batch buffer (group tables, candidate arrays,
        # encoder planes) — absorb that outside the timed passes
        b = rd.next_batch(BATCH)
        if b:
            st = al.submit_batch(b)
            sam_parts.append(
                al.finish_batch_prefetched(st, al.prefetch_state(st)))
            n_warm += len(b)

    # steady state: device calls stay strictly sequential (the tunnel
    # serializes and degrades under interleaved transfers), but batch k's
    # pure-host tail (replay + SAM formatting) runs in a side thread while
    # batch k+1 encodes/dispatches/fetches
    from concurrent.futures import ThreadPoolExecutor
    tail = ThreadPoolExecutor(1)

    def reopen_skip():
        """Fresh reader positioned right after the warmup reads: skip
        EXACTLY n_warm (partial final request), so every pass times the
        identical read set."""
        r2 = open_reads(str(reads_fq), p)
        skipped = 0
        while skipped < n_warm:
            got = len(r2.next_batch(min(BATCH, n_warm - skipped)))
            if not got:
                break
            skipped += got
        return r2

    def one_pass(reader, collect):
        n = 0
        outs = [] if collect else None
        t0 = time.time()
        futs = []
        while True:
            b = reader.next_batch(BATCH)
            if not b:
                break
            state = al.submit_batch(b)
            counts = al.prefetch_state(state)
            futs.append(tail.submit(al.finish_batch_prefetched, state,
                                    counts))
            n += len(b)
            while len(futs) > 2:
                out = futs.pop(0).result()
                if collect:
                    outs.append(out)
        for f in futs:
            out = f.result()
            if collect:
                outs.append(out)
        return n, time.time() - t0, outs

    # untimed SAM-collection pass FIRST: it both produces the equality
    # output and pre-pays every residual first-pass cost (SAM string arena
    # growth, group-buffer growth at the final batch size, page cache) —
    # in r02 the first timed pass ran ~2x under the best pass because it
    # doubled as the collection pass (pair ratio 1.074 vs 2.683)
    n_rest, dt, outs = one_pass(rd, collect=True)
    sam_parts += outs
    log(f"ours equality pass (untimed): {n_rest} reads in {dt:.2f}s = "
        f"{n_rest/max(dt,1e-9):.0f} reads/s")

    # one more untimed settle pass: the gather-hot tables keep warming
    # (cache/TLB) for ~2 full passes after the THP collapse — r03/r04 logs
    # show a monotone ramp (equality 263k -> pass0 333k -> pass1 500k ->
    # steady 540-620k); pass 0 was the recorded min pair every round
    rd.close()
    rd = reopen_skip()
    n_rest, dt, _ = one_pass(rd, collect=False)
    log(f"ours settle pass (untimed): {n_rest} reads in {dt:.2f}s = "
        f"{n_rest/max(dt,1e-9):.0f} reads/s")

    # seven timed steady passes over the same reads, outputs dropped
    # (host-neighbor steal storms swing both sides 2-3x between windows;
    # the median pair ratio over seven windows is robust)
    rates = []
    ours_walls = []
    paired_orps = []
    paired_owalls = []
    for rep in range(7):  # 7 same-window pairs: stabler median under steal storms
        rd.close()
        rd = reopen_skip()
        n_rest, dt, _ = one_pass(rd, collect=False)
        if n_rest:
            rates.append(n_rest / dt)
            ours_walls.append(dt)
        log(f"ours pass {rep}: {n_rest} reads in {dt:.2f}s = "
            f"{n_rest/dt:.0f} reads/s")
        if oracle:
            o_rps, o_wall = oracle_once(oracle, ref_fa, reads_fq, work,
                                        t_start)
            paired_orps.append(o_rps)
            paired_owalls.append(o_wall)
            log(f"paired oracle run: {o_rps:.0f} reads/s "
                f"(align wall {o_wall:.2f}s)")
    rd.close()
    tail.shutdown()
    # headline value = MEDIAN of the steady passes (consistent with the
    # median pair ratio used for vs_baseline; per-pass rates disclosed)
    ours_rps = sorted(rates)[len(rates) // 2] if rates else n_warm / t_warm
    log(f"ours: median of {len(rates)} passes = {ours_rps:.0f} reads/s")

    extra = {"pass_rates": [round(r) for r in rates],
             "pass_walls_s": [round(w, 3) for w in ours_walls],
             "platform": platform}
    vs = None
    if oracle:
        # same-window pairs: our pass k vs the oracle run right after it;
        # the MEDIAN pair ratio is robust to the host's steal-time storms
        # hitting either side of any single window
        pair_vs = sorted([r / o for r, o in zip(rates, paired_orps)]
                         or [ours_rps / orps])
        vs = pair_vs[len(pair_vs) // 2]
        extra["pair_ratios"] = [round(x, 3) for x in pair_vs]
        # oracle-window context so a 2.2 and a 4.1 vs_baseline are readable
        # as the same code: the oracle's startup-subtracted align wall for
        # each paired run, and its min/median/max reads/s across this
        # run's windows.  r03's paired windows were 130-150k, r04's hit
        # 308k (its fastest ever) on identical oracle code/data — the
        # ratio inherits that lottery; ours_abs does not.
        ow = sorted(paired_orps)
        extra["oracle_pair_align_walls_s"] = [round(w, 3)
                                              for w in paired_owalls]
        extra["oracle_window_reads_per_s"] = {
            "min": round(ow[0]), "median": round(ow[len(ow) // 2]),
            "max": round(ow[-1])} if ow else None
        extra["oracle_startup_s"] = round(t_start, 3)
        orps = max([orps] + paired_orps)
        # SAM equality on the full run
        from basal_tpu.align.sam import sam_header
        ours_text = (sam_header(ref, p, "bench").encode("latin1")
                     + b"".join(sam_parts)).decode("latin1")
        ours_recs = [l for l in ours_text.splitlines()
                     if l and not l.startswith("@")]
        want_recs = [l for l in (work / "oracle.sam").read_text().splitlines()
                     if l and not l.startswith("@")]
        eq = sum(1 for a, b2 in zip(ours_recs, want_recs) if a == b2)
        tot = max(len(want_recs), len(ours_recs), 1)
        extra["sam_equality"] = eq / tot
        extra["oracle_reads_per_s"] = round(orps)
        log(f"SAM equality: {eq}/{tot} = {eq/tot:.4f}")

    print(json.dumps({
        "metric": "reads/s/chip (100bp SE, -M A:G) + SAM equality rate vs reference BASAL",
        "value": round(ours_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "ours_abs_reads_per_s": round(ours_rps, 1),
        "ratio_note": (
            "vs_baseline = median same-window pair ratio; it inherits the "
            "oracle's window lottery (r03 paired windows 130-150k reads/s, "
            "r04 up to 308k, same oracle binary+data) - compare "
            "ours_abs_reads_per_s across rounds for the code signal. "
            "Speed-of-light context (docs/PERF.md): the remote-TPU tunnel "
            "(~35ms RTT, ~50MB/s) caps any device-routed design near 2x "
            "the oracle's L1-resident 4.5us/read scan; the recorded value "
            "is the measured-placement host path."),
        **extra,
    }))


if __name__ == "__main__":
    main()
