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
RRBS_BASE = int(sys.argv[6]) if len(sys.argv) > 6 else 0
RRBS_N = int(sys.argv[7]) if len(sys.argv) > 7 else 0


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


def run_rrbs(seed):
    """RRBS -D fuzz case mirroring tests/test_fuzz_rrbs.py (SE) and, for
    odd seeds, a randomized PE-RRBS pairing over fragment cut sites
    (tests/test_differential_rrbs.py:test_rrbs_pe shape)."""
    from conftest import make_fastq, make_ref, norm_sam, run_oracle
    from test_differential_rrbs import rrbs_genome, rrbs_reads
    from test_differential_se import run_ours
    fz = random.Random(seed)
    rng = fz
    rule = fz.choice(["C:T", "C:T", "A:G"])
    with tempfile.TemporaryDirectory() as td:
        tp = Path(td)
        if seed % 2 == 0:
            g = rrbs_genome(rng, n_frags=fz.randrange(25, 70),
                            frag_lo=fz.randrange(50, 80),
                            frag_hi=fz.randrange(150, 400))
            make_ref(tp / "ref.fa", [("chrR", g)])
            comp = str.maketrans("ACGT", "TGCA")
            readlen = fz.choice([40, 60, 80])
            reads = rrbs_reads(rng, g, fz.randrange(25, 60), readlen=readlen,
                               rule=rule, rate=fz.choice([0.3, 0.6, 0.9]))
            if fz.random() < 0.5:
                reads += [(n + "_rc", s.translate(comp)[::-1]) for n, s in
                          rrbs_reads(rng, g, fz.randrange(5, 20),
                                     readlen=readlen, rule=rule)]
            last = g.rfind("CCGG")  # CCGG_seglen OOB divergence guard
            reads = [(n, s) for n, s in reads
                     if int(n.split("_p")[1].split("_")[0]) + readlen <= last]
            make_fastq(tp / "reads.fq", reads)
            flags = ["-S", str(fz.randrange(1, 1 << 20)), "-u",
                     "-D", "C-CGG", "-n", fz.choice("011")]
            if fz.random() < 0.4:
                flags += ["-v", fz.choice(["0.1", "3", "6"])]
            if fz.random() < 0.3:
                flags += ["-w", str(fz.randrange(3, 25))]
            if fz.random() < 0.3:
                flags += ["-r", fz.choice("012")]
            if fz.random() < 0.3:
                flags += ["-R"]
            base = ["-a", "reads.fq", "-d", "ref.fa", "-M", rule, "-V", "0"]
        else:
            g = rrbs_genome(rng, n_frags=fz.randrange(35, 70),
                            frag_lo=120, frag_hi=fz.randrange(250, 400))
            make_ref(tp / "ref.fa", [("chrR", g)])
            comp = str.maketrans("ACGT", "TGCA")
            frm, tos = rule.split(":")
            sites = []
            i = g.find("CCGG")
            while i >= 0:
                sites.append(i + 1)
                i = g.find("CCGG", i + 1)
            r1s, r2s = [], []
            k = 0
            rate = fz.choice([0.3, 0.6, 0.9])
            for a, b in zip(sites, sites[1:]):
                frag = g[a:b + 1]
                if len(frag) < 80:
                    continue
                conv = "".join(fz.choice(tos)
                               if (c == frm and fz.random() < rate) else c
                               for c in frag)
                L = min(fz.choice([50, 60, 70]), len(conv))
                r1s.append((f"p{k}/1", conv[:L]))
                r2s.append((f"p{k}/2", conv[-L:].translate(comp)[::-1]))
                k += 1
                if k >= fz.randrange(20, 45):
                    break
            make_fastq(tp / "r1.fq", r1s)
            make_fastq(tp / "r2.fq", r2s)
            flags = ["-S", str(fz.randrange(1, 1 << 20)), "-u",
                     "-D", "C-CGG", "-m", str(fz.randrange(20, 60)),
                     "-x", str(fz.randrange(400, 800))]
            if fz.random() < 0.3:
                flags += ["-r", fz.choice("012")]
            if fz.random() < 0.3:
                flags += ["-R"]
            base = ["-a", "r1.fq", "-b", "r2.fq", "-d", "ref.fa", "-M",
                    rule, "-V", "0"]
        r = run_oracle(base + ["-o", "oracle.sam"] + flags, tp)
        if r.returncode != 0:
            return seed, f"oracle rc={r.returncode} flags={flags}"
        ours = run_ours(base + flags, tp)
        want = norm_sam((tp / "oracle.sam").read_text())
        got = norm_sam(ours)
        if got != want:
            return seed, f"MISMATCH flags={flags} rule={rule}"
    return seed, None


RUNNERS = {"se": run_se, "pe": run_pe, "rrbs": run_rrbs}


def main():
    jobs = [("se", s) for s in range(SE_BASE, SE_BASE + SE_N)] + \
           [("pe", s) for s in range(PE_BASE, PE_BASE + PE_N)] + \
           [("rrbs", s) for s in range(RRBS_BASE, RRBS_BASE + RRBS_N)]
    fails = []
    done = 0
    with ProcessPoolExecutor(WORKERS, initializer=_init) as ex:
        futs = [ex.submit(RUNNERS[k], s) for k, s in jobs]
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
