"""One-off wide fuzz sweep vs the oracle: N fresh-seeded SE + PE configs
using the tests/test_fuzz_configs.py generators, run in parallel worker
processes.  Prints PASS/FAIL per case and a summary.

Usage: python tools/widesweep.py [se_base se_n pe_base pe_n workers]
  defaults: 12000 100 13000 60 4
"""
import os
import random
import subprocess
import sys
import tempfile
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

SE_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
SE_N = int(sys.argv[2]) if len(sys.argv) > 2 else 100
PE_BASE = int(sys.argv[3]) if len(sys.argv) > 3 else 13000
PE_N = int(sys.argv[4]) if len(sys.argv) > 4 else 60
WORKERS = int(sys.argv[5]) if len(sys.argv) > 5 else 4


def _init():
    import jax
    jax.config.update("jax_platforms", "cpu")


def run_se(seed):
    from conftest import make_fastq, make_ref, norm_sam, run_oracle
    from test_differential_se import run_ours
    from test_fuzz_configs import _gen_case
    fz = random.Random(seed)
    rule, genome, reads, flags = _gen_case(fz, seed)
    with tempfile.TemporaryDirectory() as td:
        tp = Path(td)
        make_ref(tp / "ref.fa", [("chrF", genome)])
        make_fastq(tp / "reads.fq", reads)
        base = ["-a", "reads.fq", "-d", "ref.fa", "-M", rule, "-V", "0"]
        r = run_oracle(base + ["-o", "oracle.sam"] + flags, tp)
        if r.returncode != 0:
            return seed, f"oracle rc={r.returncode} flags={flags}"
        ours = run_ours(base + flags, tp)
        want = norm_sam((tp / "oracle.sam").read_text())
        got = norm_sam(ours)
        if got != want:
            return seed, f"MISMATCH flags={flags} rule={rule}"
    return seed, None


def run_pe(seed):
    from conftest import (make_fastq, make_ref, norm_sam, random_genome,
                          run_oracle)
    from test_differential_se import run_ours
    from test_differential_pe import pe_reads
    fz = random.Random(seed)
    rule = fz.choice(["C:T", "A:G", "A:CGT", "G:A", "T:-"])
    g = random_genome(fz, fz.randrange(5000, 10000))
    with tempfile.TemporaryDirectory() as td:
        tp = Path(td)
        make_ref(tp / "ref.fa", [("chrF", g)])
        r1, r2 = pe_reads(fz, g, fz.randrange(15, 35),
                          fz.choice([60, 80, 100]), rule=rule,
                          min_ins=fz.randrange(120, 200),
                          max_ins=fz.randrange(250, 450),
                          orphan_frac=fz.choice([0.0, 0.2]))
        make_fastq(tp / "r1.fq", r1)
        make_fastq(tp / "r2.fq", r2)
        flags = ["-S", str(fz.randrange(1, 1 << 20)), "-u"]
        flags += ["-n", fz.choice("012")]
        if fz.random() < 0.4:
            flags += ["-m", str(fz.randrange(20, 120)),
                      "-x", str(fz.randrange(300, 800))]
        if fz.random() < 0.3:
            flags += ["-g", str(fz.randrange(1, 4))]
        if fz.random() < 0.3:
            flags += ["-r", fz.choice("012")]
        if fz.random() < 0.25:
            flags += ["-R"]
        base = ["-a", "r1.fq", "-b", "r2.fq", "-d", "ref.fa", "-M", rule,
                "-V", "0"]
        r = run_oracle(base + ["-o", "oracle.sam"] + flags, tp)
        if r.returncode != 0:
            return seed, f"oracle rc={r.returncode} flags={flags}"
        ours = run_ours(base + flags, tp)
        want = norm_sam((tp / "oracle.sam").read_text())
        got = norm_sam(ours)
        if got != want:
            return seed, f"MISMATCH flags={flags} rule={rule}"
    return seed, None


def main():
    jobs = [("se", s) for s in range(SE_BASE, SE_BASE + SE_N)] + \
           [("pe", s) for s in range(PE_BASE, PE_BASE + PE_N)]
    fails = []
    done = 0
    with ProcessPoolExecutor(WORKERS, initializer=_init) as ex:
        futs = [ex.submit(run_se if k == "se" else run_pe, s)
                for k, s in jobs]
        for f in futs:
            seed, err = f.result()
            done += 1
            if err:
                fails.append((seed, err))
                print(f"[widesweep] seed {seed}: {err}", flush=True)
            if done % 20 == 0:
                print(f"[widesweep] {done}/{len(jobs)} done, "
                      f"{len(fails)} failures", flush=True)
    print(f"[widesweep] TOTAL {len(jobs)} cases, {len(fails)} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
