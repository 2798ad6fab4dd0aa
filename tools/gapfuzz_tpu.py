"""On-chip differential fuzz for the gapped Pallas production path.

Runs N randomized GAPPED configs (rules with deletions/insertions allowed,
-g 1..3, mixed -n/-v/-w/-r/-R) through the REAL TPU with device evaluation
forced (BASAL_TPU_HOST_EVAL=0) — i.e. through `extend_gap_pallas_packed`,
the default gapped device kernel — and byte-compares each SAM body against
the reference oracle (.oracle/basal).

One process holds the chip for the whole sweep (single jit cache, no
re-claim cost per config).  Usage:

    python tools/gapfuzz_tpu.py [n_configs] [seed0]

Each config uses a fresh random 60 kbp genome and 3000 planted-conversion
reads (read-level RC mix, substitution noise, planted 1-3 bp gaps).
"""
import os
import random
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

os.environ["BASAL_TPU_HOST_EVAL"] = "0"   # force the device ladder

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SEED0 = int(sys.argv[2]) if len(sys.argv) > 2 else 91000
ORACLE = ROOT / ".oracle" / "basal"


def body(path):
    with open(path, "rb") as f:
        return b"".join(ln for ln in f if not ln.startswith(b"@"))


def main():
    from conftest import random_genome, convert_reads, make_fastq
    from test_differential_gap import deletion_reads, insertion_reads
    import jax
    print(f"[gapfuzz_tpu] devices: {jax.devices()}", file=sys.stderr)
    from basal_tpu.cli import main as cli_main

    rules = ["T:-", "C:T", "A:G", "A:CGT", "G:ACT-", "T:C"]
    fails = 0
    for i in range(N):
        seed = SEED0 + i
        rng = random.Random(seed)
        rule = rng.choice(rules)
        gap = rng.randint(1, 3)
        n_prot = rng.choice([0, 1, 2])
        flags = f"-M {rule} -g {gap} -n {n_prot} -S {rng.randint(1, 9999)}"
        if rng.random() < 0.5:
            flags += " -R"
        if rng.random() < 0.4:
            flags += f" -v {rng.randint(3, 12)}"
        if rng.random() < 0.4:
            flags += f" -w {rng.randint(2, 50)} -r {rng.choice([0, 1, 2])}"
        with tempfile.TemporaryDirectory() as td:
            d = Path(td)
            ref = random_genome(rng, 60000)
            (d / "ref.fa").write_text(">chr1\n" + ref + "\n")
            # mix: conversion reads + planted deletions + planted insertions
            # (convert_reads never deletes, so real gapped alignments must
            # come from the dedicated generators)
            reads = convert_reads(rng, ref, n=1500, readlen=100,
                                  rule=rule, rate=0.4,
                                  sub_rate=0.015, revcomp_frac=0.3)
            frm = rule.split(":")[0]
            dels = deletion_reads(rng, ref, n=800, readlen=100, frm=frm,
                                  max_del=gap)
            ins = insertion_reads(rng, ref, n=700, readlen=100, max_ins=gap)
            reads = reads + [(f"d{n}", s) for n, s in dels] \
                          + [(f"i{n}", s) for n, s in ins]
            make_fastq(d / "reads.fq", reads)
            args = f"-d {d}/ref.fa -a {d}/reads.fq {flags} -V 0"
            subprocess.run([str(ORACLE)] + args.split() +
                           ["-o", f"{d}/oracle.sam"],
                           check=True, capture_output=True)
            argv_save = sys.argv
            sys.argv = ["basal-tpu"] + args.split() + ["-o", f"{d}/ours.sam"]
            try:
                rc = cli_main()
            finally:
                sys.argv = argv_save
            ok = rc in (0, None) and body(d / "oracle.sam") == body(d / "ours.sam")
            print(f"[gapfuzz_tpu] seed {seed} [{flags}] "
                  f"{'OK' if ok else 'MISMATCH'}", file=sys.stderr)
            fails += 0 if ok else 1
    print(f"[gapfuzz_tpu] {N - fails}/{N} byte-identical", file=sys.stderr)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
