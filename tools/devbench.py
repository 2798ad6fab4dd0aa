"""Device-path end-to-end bench: BASAL_TPU_HOST_EVAL=0 (every wave on the
TPU through the tunnel), recorded per round in DEVBENCH.json so the device
path has its own regression line and cannot rot behind the host evaluator
(VERDICT r02 "keep the device path honest").

Same data/profile as bench.py's random profile, smaller read budget (the
device path is tunnel-bound at ~35 ms/transfer + ~50 MB/s uplink).  Prints
one JSON line and writes DEVBENCH.json at the repo root:

  {"metric": "device-path reads/s ...", "value": N, "unit": "reads/s",
   "passes": [...], "sam_equality": 1.0, "blob": true}

Usage:  python tools/devbench.py          (needs the TPU tunnel)
        BENCH_READS=100000 python tools/devbench.py
        BASAL_TPU_BLOB=0 python tools/devbench.py   (pre-blob upload format)
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

os.environ["BASAL_TPU_HOST_EVAL"] = "0"      # every wave on the device

N_READS = int(os.environ.get("BENCH_READS", 150_000))
BATCH = int(os.environ.get("BENCH_BATCH", 25_000))
PASSES = int(os.environ.get("BENCH_PASSES", 7))


def log(m):
    print(f"[devbench] {m}", file=sys.stderr, flush=True)


def main():
    # reuse bench.py's dataset builder (same genome/reads => comparable)
    import bench
    work = ROOT / ".oracle" / "benchdata"
    work.mkdir(parents=True, exist_ok=True)
    ref_fa, reads_fq = bench.make_data(work)

    import jax
    log(f"jax devices: {jax.devices()}")
    platform = jax.devices()[0].platform

    from basal_tpu.align.pipeline import SingleEndAligner
    from basal_tpu.config import AlignParams
    from basal_tpu.index.reference import load_reference
    from basal_tpu.index.seedindex import build_index
    from basal_tpu.reads.io import open_reads

    p = AlignParams(conversion="A:G", randseed=1, verbose_level=0)
    ref = load_reference(str(ref_fa), p)
    idx = build_index(ref, p)
    al = SingleEndAligner(p, ref, idx)

    rd = open_reads(str(reads_fq), p)
    # warmup: chip claim + jit compiles at the bucketed wave shapes
    b = rd.next_batch(BATCH)
    t0 = time.time()
    sam = [al.align_batch(b)]
    log(f"warmup batch: {time.time()-t0:.1f}s")
    n_warm = len(b)
    blob = bool(getattr(al._dev, "use_blob", False)) if al._dev else None

    def one_pass(collect):
        r2 = open_reads(str(reads_fq), p)
        skipped = 0
        while skipped < n_warm:
            got = len(r2.next_batch(min(BATCH, n_warm - skipped)))
            if not got:
                break
            skipped += got
        n = 0
        t0 = time.time()
        outs = []
        while n < N_READS - n_warm:
            b = r2.next_batch(min(BATCH, N_READS - n_warm - n))
            if not b:
                break
            st = al.submit_batch(b)
            out = al.finish_batch_prefetched(st, al.prefetch_state(st))
            if collect:
                outs.append(out)
            n += len(b)
        r2.close()
        return n, time.time() - t0, outs

    # untimed collection pass (equality + residual first-pass costs)
    n, dt, outs = one_pass(collect=True)
    sam += outs
    log(f"equality pass (untimed): {n} reads in {dt:.1f}s = {n/dt:.0f} r/s")

    rates = []
    ab = os.environ.get("BENCH_AB") == "1"
    ab_rates = {True: [], False: []}
    for rep in range(PASSES):
        if ab:  # interleaved blob on/off: same-window comparison, the
            # tunnel's 30% pass-to-pass variance cancels across pairs
            al._dev.use_blob = bool(blob) and (rep % 2 == 0)
        n, dt, _ = one_pass(collect=False)
        rates.append(n / dt)
        if ab:
            ab_rates[al._dev.use_blob].append(n / dt)
        log(f"pass {rep}{' blob=' + str(al._dev.use_blob) if ab else ''}: "
            f"{n} reads in {dt:.1f}s = {n/dt:.0f} reads/s")
    if ab:
        for k, v in ab_rates.items():
            if v:
                log(f"blob={k}: median {sorted(v)[len(v)//2]:.0f} reads/s")
        al._dev.use_blob = bool(blob)
    med = sorted(rates)[len(rates) // 2]

    # SAM equality vs oracle on the warmup+collected range
    eq = None
    oracle = bench.ensure_oracle()
    if oracle:
        import subprocess
        osam = work / "devbench_oracle.sam"
        subprocess.run(
            [str(oracle), "-d", str(ref_fa), "-a", str(reads_fq),
             "-M", "A:G", "-S", "1", "-V", "0", "-p", "1",
             "-E", str(n_warm + n), "-o", str(osam)],
            check=True, capture_output=True)
        from basal_tpu.align.sam import sam_header
        ours = (sam_header(ref, p, "devbench").encode("latin1")
                + b"".join(sam)).decode("latin1")
        ours_recs = [l for l in ours.splitlines()
                     if l and not l.startswith("@")]
        want_recs = [l for l in osam.read_text().splitlines()
                     if l and not l.startswith("@")]
        hit = sum(1 for a, b2 in zip(ours_recs, want_recs) if a == b2)
        eq = hit / max(len(want_recs), len(ours_recs), 1)
        log(f"SAM equality: {hit}/{max(len(want_recs), len(ours_recs))}")

    # ---- speed-of-light analysis (VERDICT r04 item 4, option b) ----
    # measured wire volume from the DeviceContext counters; tunnel
    # characteristics from docs/PERF.md (measured round 2-4: ~35 ms per
    # transfer RTT, ~50 MB/s uplink, ~25 MB/s downlink, serialize-only).
    dev = al._dev
    n_total = n_warm + n
    waves = getattr(dev, "up_waves", 0)
    upb = getattr(dev, "up_bytes", 0)
    n_passes_counted = PASSES + 2  # warmup + equality + timed passes
    per_pass_waves = waves / max(n_passes_counted, 1)
    bytes_per_read = upb / max(n_passes_counted, 1) / max(n, 1)
    RTT, UP_BW, DN_BW = 0.035, 50e6, 25e6
    # per pass: every wave costs one upload transfer + one result fetch
    # (2 serialized RTTs on this tunnel), plus wire time for the blob up
    # and ~8B/cand counts down; device compute overlaps within a wave but
    # transfers serialize (PERF.md: interleaved transfers degrade).
    t_rtt = 2 * RTT * per_pass_waves
    t_wire = (bytes_per_read * n) / UP_BW + (8.0 * 9 * n) / DN_BW / 8
    sol_rps = n / max(t_rtt + t_wire, 1e-9)
    out = {
        "metric": "device-path reads/s (BASAL_TPU_HOST_EVAL=0, 100bp SE "
                  "-M A:G, random profile)",
        "value": round(med, 1),
        "unit": "reads/s",
        "passes": [round(r) for r in rates],
        "platform": platform,
        "blob": blob,
        "sam_equality": eq,
        "n_reads": n_total,
        "speed_of_light": {
            "upload_bytes_per_read": round(bytes_per_read, 1),
            "waves_per_pass": round(per_pass_waves, 1),
            "tunnel_rtt_s": RTT,
            "tunnel_up_MBps": UP_BW / 1e6,
            "tunnel_dn_MBps": DN_BW / 1e6,
            "tunnel_sol_reads_per_s": round(sol_rps),
            "note": "remote-tunnel ceiling: each wave pays ~2 serialized "
                    "35ms RTTs (blob upload + result fetch; transfers "
                    "cannot overlap on this tunnel) plus wire bytes. The "
                    "round-4 blob format already derives valid/lenmask "
                    "on-device, so upload volume is near-minimal "
                    "(loc+rowmeta+base planes); the path is RTT-bound, "
                    "not bandwidth-bound — batch size trades RTT count "
                    "against jit-bucket recompiles. A locally attached "
                    "chip removes both terms; the recorded value is the "
                    "honest remote-tunnel number and the host evaluator "
                    "remains the measured-placement winner end-to-end "
                    "(see BENCH and docs/PERF.md).",
        },
    }
    print(json.dumps(out))
    (ROOT / "DEVBENCH.json").write_text(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
