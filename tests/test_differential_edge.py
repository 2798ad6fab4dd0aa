"""Edge-case differential tests: PBAT protocol, absolute -v, tight -w caps,
filtered-short reads, high-error reads, -I 1 dense index."""

import pytest

from conftest import (convert_reads, have_oracle, make_fastq, make_ref,
                      norm_sam, random_genome, run_oracle)
from test_differential_se import run_ours

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle not built")

COMP = str.maketrans("ACGT", "TGCA")


def check(tmp_path, flags, reads, seqs, rule="C:T"):
    make_ref(tmp_path / "ref.fa", seqs)
    make_fastq(tmp_path / "reads.fq", reads)
    base = ["-a", "reads.fq", "-d", "ref.fa", "-M", rule, "-V", "0"]
    r = run_oracle(base + ["-o", "oracle.sam"] + flags, tmp_path)
    assert r.returncode == 0, r.stderr
    ours = run_ours(base + flags, tmp_path)
    want = norm_sam((tmp_path / "oracle.sam").read_text())
    got = norm_sam(ours)
    assert got == want, _fd(got, want)


def _fd(got, want):
    import difflib
    return "\n".join(list(difflib.unified_diff(want, got, "oracle", "ours",
                                               lineterm=""))[:40])


def test_pbat_protocol(tmp_path, rng):
    """-n 2: map SE reads to reverse strands only."""
    g = random_genome(rng, 6000)
    fwd = convert_reads(rng, g, 20, 80, "C:T")
    # PBAT reads present the complementary strand
    rev = [(n + "_r", s.translate(COMP)[::-1]) for n, s in
           convert_reads(rng, g, 20, 80, "C:T")]
    check(tmp_path, ["-S", "1", "-n", "2", "-u"], fwd + rev, [("c1", g)])


def test_absolute_v(tmp_path, rng):
    g = random_genome(rng, 6000)
    reads = convert_reads(rng, g, 40, 90, "C:T", sub_rate=0.04)
    check(tmp_path, ["-S", "2", "-v", "3", "-u"], reads, [("c1", g)])
    check(tmp_path, ["-S", "3", "-v", "0", "-u"], reads, [("c1", g)])


def test_tight_w_cap(tmp_path, rng):
    """-w 2 with a highly repetitive reference: bucket caps + aborts."""
    unit = random_genome(rng, 400)
    g = unit * 12 + random_genome(rng, 2000)
    reads = convert_reads(rng, unit, 30, 70, "C:T", sub_rate=0.01)
    check(tmp_path, ["-S", "4", "-w", "2", "-r", "2", "-u"], reads,
          [("c1", g)])
    check(tmp_path, ["-S", "5", "-w", "2", "-r", "1", "-u"], reads,
          [("c1", g)])


def test_short_and_bad_reads(tmp_path, rng):
    g = random_genome(rng, 5000)
    reads = convert_reads(rng, g, 20, 60, "C:T")
    reads += [("tiny1", "ACGTACGT"), ("tiny2", "A" * 18)]
    reads += [("junk", "".join(rng.choice("ACGT") for _ in range(80)))]
    check(tmp_path, ["-S", "6", "-u"], reads, [("c1", g)])


def test_interval_1(tmp_path, rng):
    """-I 1 dense index."""
    g = random_genome(rng, 4000)
    reads = convert_reads(rng, g, 30, 70, "C:T")
    check(tmp_path, ["-S", "7", "-I", "1", "-u"], reads, [("c1", g)])


def test_interval_16(tmp_path, rng):
    g = random_genome(rng, 6000)
    reads = convert_reads(rng, g, 30, 90, "C:T")
    check(tmp_path, ["-S", "8", "-I", "16", "-u"], reads, [("c1", g)])


def test_ga_and_tc_rules(tmp_path, rng):
    """Remaining one-way rules G:A and T:C exercise other alphabet remaps."""
    g = random_genome(rng, 6000)
    reads = convert_reads(rng, g, 30, 80, "G:A")
    check(tmp_path, ["-S", "9", "-u"], reads, [("c1", g)], rule="G:A")
    reads = convert_reads(rng, g, 30, 80, "T:C")
    check(tmp_path, ["-S", "10", "-u"], reads, [("c1", g)], rule="T:C")


def test_g_act_deletion_rule(tmp_path, rng):
    """-M G:ACT- (m7G-quant-seq): multi-way including deletion."""
    g = random_genome(rng, 6000)
    reads = convert_reads(rng, g, 30, 80, "G:ACT", rate=0.3)
    check(tmp_path, ["-S", "11", "-n", "1", "-g", "1", "-u"], reads,
          [("c1", g)], rule="G:ACT-")
