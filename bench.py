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

N_READS = int(os.environ.get("BENCH_READS", 250_000))
GENOME = int(os.environ.get("BENCH_GENOME", 2_000_000))
READLEN = 100
BATCH = 50_000
WORKERS = int(os.environ.get("BENCH_WORKERS", 3))
SEED = 20260816


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_data(d: Path):
    ref_p, fq_p = d / "ref.fa", d / "reads.fq"
    stamp = d / f".stamp_{GENOME}_{N_READS}_{SEED}"
    if stamp.exists() and ref_p.exists() and fq_p.exists():
        return ref_p, fq_p
    rng = random.Random(SEED)
    g = "".join(rng.choice("ACGT") for _ in range(GENOME))
    with open(d / "ref.fa", "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(g), 60):
            f.write(g[i:i + 60] + "\n")
    with open(d / "reads.fq", "w") as f:
        for i in range(N_READS):
            pos = rng.randrange(0, len(g) - READLEN)
            s = list(g[pos:pos + READLEN])
            for j, c in enumerate(s):
                if c == "A" and rng.random() < 0.5:
                    s[j] = "G"
                elif rng.random() < 0.005:
                    s[j] = rng.choice("ACGT".replace(c, ""))
            f.write(f"@r{i}\n{''.join(s)}\n+\n{'I' * READLEN}\n")
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
    """Single-thread reference reads/s, startup-subtracted."""
    base = [str(oracle), "-d", str(ref), "-M", "A:G", "-S", "1", "-V", "0",
            "-p", "1"]
    t0 = time.time()
    subprocess.run(base + ["-a", str(reads), "-o", str(workdir / "oracle.sam")],
                   check=True, capture_output=True)
    t_full = time.time() - t0
    t0 = time.time()
    subprocess.run(base + ["-a", str(reads), "-E", "1",
                           "-o", str(workdir / "oracle1.sam")],
                   check=True, capture_output=True)
    t_startup = time.time() - t0
    dt = max(t_full - t_startup, 1e-3)
    return N_READS / dt, t_full, t_startup


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

    from basal_tpu.config import AlignParams
    from basal_tpu.index.reference import load_reference
    from basal_tpu.index.seedindex import build_index
    from basal_tpu.reads.io import open_reads
    from basal_tpu.align.pipeline import SingleEndAligner
    import jax

    log(f"jax devices: {jax.devices()}")
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
    # steady state: -p style worker pool over uniform batches
    from collections import deque
    from basal_tpu.align.pipeline import ThreadedRunner
    runner = ThreadedRunner(p, ref, idx, WORKERS)
    n_rest = 0
    t0 = time.time()
    futures = deque()
    while True:
        b = rd.next_batch(BATCH)
        if b:
            futures.append(runner.submit(b))
            n_rest += len(b)
        while futures and (not b or len(futures) > WORKERS):
            sam_parts.append(futures.popleft().result())
        if not b:
            break
    runner.shutdown()
    dt = time.time() - t0
    ours_rps = n_rest / dt if n_rest else n_warm / t_warm
    log(f"ours: {n_rest} reads in {dt:.2f}s = {ours_rps:.0f} reads/s "
        f"({WORKERS} host workers)")

    extra = {}
    vs = None
    if oracle:
        vs = ours_rps / orps
        # SAM equality on the full run
        from basal_tpu.align.sam import sam_header
        ours_text = sam_header(ref, p, "bench") + "".join(sam_parts)
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
        **extra,
    }))


if __name__ == "__main__":
    main()
