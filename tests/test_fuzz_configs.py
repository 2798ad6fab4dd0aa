"""Randomized flag-combination fuzz vs the oracle: 20 seeded random configs
over random data; every one must be byte-identical."""

import random

import pytest

from conftest import have_oracle, make_fastq, make_ref, norm_sam, run_oracle
from test_differential_se import run_ours

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle not built")

RULES = ["C:T", "A:G", "G:A", "T:C", "A:CGT", "C:AGT", "T:-", "G:ACT-"]


def _gen_case(fz, case_id):
    rule = fz.choice(RULES)
    frm, tos = rule.split(":")
    glen = fz.randrange(3000, 12000)
    genome = "".join(fz.choice("ACGT") for _ in range(glen))
    n = fz.randrange(15, 45)
    readlen = fz.choice([36, 50, 75, 100, 150])
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    for i in range(n):
        pos = fz.randrange(0, glen - readlen)
        s = list(genome[pos:pos + readlen])
        for j, c in enumerate(s):
            if c == frm and fz.random() < fz.choice([0.2, 0.5, 0.9]):
                t = fz.choice(tos)
                if t != "-":
                    s[j] = t
            elif fz.random() < 0.01:
                s[j] = fz.choice("ACGT")
        s = "".join(s)
        if fz.random() < 0.3:
            s = s.translate(comp)[::-1]
        if fz.random() < 0.1:
            k = fz.randrange(0, 3)
            s = s[:10] + "N" * k + s[10 + k:]
        reads.append((f"f{case_id}_{i}", s))
    flags = ["-S", str(fz.randrange(1, 1 << 20)), "-u"]
    flags += ["-n", fz.choice("012")]
    if fz.random() < 0.4:
        flags += ["-g", str(fz.randrange(1, 4))]
    if fz.random() < 0.4:
        flags += ["-v", fz.choice(["0.05", "0.15", "2", "5"])]
    if fz.random() < 0.3:
        flags += ["-w", str(fz.randrange(2, 30))]
    if fz.random() < 0.3:
        flags += ["-r", fz.choice("012")]
    if fz.random() < 0.3:
        flags += ["-s", str(fz.randrange(10, 17))]
    if fz.random() < 0.3:
        flags += ["-I", str(fz.choice([1, 2, 4, 8]))]
    if fz.random() < 0.2:
        flags += ["-R"]
    if fz.random() < 0.2:
        flags += ["-f", str(fz.randrange(0, 6))]
    if fz.random() < 0.15:
        flags += ["-N"]
    return rule, genome, reads, flags


@pytest.mark.parametrize("case_id", range(20))
def test_fuzz_config(tmp_path, case_id):
    fz = random.Random(777 + case_id)
    rule, genome, reads, flags = _gen_case(fz, case_id)
    make_ref(tmp_path / "ref.fa", [("chrF", genome)])
    make_fastq(tmp_path / "reads.fq", reads)
    base = ["-a", "reads.fq", "-d", "ref.fa", "-M", rule, "-V", "0"]
    r = run_oracle(base + ["-o", "oracle.sam"] + flags, tmp_path)
    assert r.returncode == 0, (flags, r.stderr)
    ours = run_ours(base + flags, tmp_path)
    want = norm_sam((tmp_path / "oracle.sam").read_text())
    got = norm_sam(ours)
    if got != want:
        import difflib
        d = "\n".join(list(difflib.unified_diff(want, got, "oracle", "ours",
                                                lineterm=""))[:30])
        raise AssertionError(f"flags={flags} rule={rule}\n{d}")


@pytest.mark.parametrize("case_id", range(8))
def test_fuzz_pe_config(tmp_path, case_id):
    """Random PE configs (protocol, inserts, gaps, rules) vs the oracle."""
    from test_differential_pe import pe_reads
    from conftest import random_genome
    fz = random.Random(999 + case_id)
    rule = fz.choice(["C:T", "A:G", "A:CGT"])
    g = random_genome(fz, fz.randrange(5000, 10000))
    make_ref(tmp_path / "ref.fa", [("chrF", g)])
    r1, r2 = pe_reads(fz, g, fz.randrange(15, 35), fz.choice([60, 80, 100]),
                      rule=rule, min_ins=fz.randrange(120, 200),
                      max_ins=fz.randrange(250, 450),
                      orphan_frac=fz.choice([0.0, 0.2]))
    make_fastq(tmp_path / "r1.fq", r1)
    make_fastq(tmp_path / "r2.fq", r2)
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
    r = run_oracle(base + ["-o", "oracle.sam"] + flags, tmp_path)
    assert r.returncode == 0, (flags, r.stderr)
    ours = run_ours(base + flags, tmp_path)
    want = norm_sam((tmp_path / "oracle.sam").read_text())
    got = norm_sam(ours)
    if got != want:
        import difflib
        d = "\n".join(list(difflib.unified_diff(want, got, "oracle", "ours",
                                                lineterm=""))[:30])
        raise AssertionError(f"flags={flags} rule={rule}\n{d}")
