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

N_READS = int(os.environ.get("BENCH_READS", 100_000))
GENOME = int(os.environ.get("BENCH_GENOME", 2_000_000))
READLEN = 100
BATCH = 50_000
SEED = 20260816


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def make_data(d: Path):
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
    return d / "ref.fa", d / "reads.fq"


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
    # warmup batch: jit compile + tunnel chip claim + first device fetch
    # (the axon tunnel's first device->host fetch takes minutes; one-time)
    b = rd.next_batch(10_000)
    t0 = time.time()
    sam_parts.append(al.align_batch(b))
    t_warm = time.time() - t0
    log(f"warmup batch ({len(b)} reads): {t_warm:.1f}s")
    n_warm = len(b)
    n_rest = 0
    t0 = time.time()
    pending = None
    while True:
        b = rd.next_batch(BATCH)
        state = al.submit_batch(b) if b else None
        if pending is not None:
            sam_parts.append(al.finish_batch(pending))
        pending = state
        if state is None:
            break
        n_rest += len(b)
    dt = time.time() - t0
    ours_rps = n_rest / dt if n_rest else n_warm / t_warm
    log(f"ours: {n_rest} reads in {dt:.2f}s = {ours_rps:.0f} reads/s")

    extra = {}
    oracle = ensure_oracle()
    vs = None
    if oracle:
        orps, t_full, t_start = time_oracle(oracle, ref_fa, reads_fq, work)
        log(f"oracle single-thread: {orps:.0f} reads/s "
            f"(full {t_full:.1f}s, startup {t_start:.1f}s)")
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
