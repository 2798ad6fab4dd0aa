"""Differential: the stale-seed-buffer quirk on mixed-length batches.

Reference behavior (align.cpp:468-480, align.h:90): ``xseed_array`` /
``xseedreg_array`` are fixed 480-entry per-thread buffers written only for
offsets [0, L-s] of each read.  When a read has (L-I+1) % s == 0, the
best-offset search is skipped and the previous read's start offset leaks
into AdjustSeedStartArray (align.cpp:500-524), whose probes then index the
buffer BEYOND the current read's range — reading the previous longer read's
seed values (or zeros from the freshly-mapped heap on first touch).  With
-p 1 this is deterministic; quality-trimmed real data hits it constantly.

These tests pin byte-equality on batches engineered to consume stale
entries: lengths with max_offset == 0 (83, 99) interleaved with lengths
that set a nonzero stale start (90, 100, 94).
"""

import pytest

from conftest import (convert_reads, have_oracle, make_fastq, make_ref,
                      norm_sam, random_genome, run_oracle)
from test_differential_se import _first_diff, run_ours

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle not built")


def mixed_reads(rng, ref, n, rule, lengths, rate=0.5, sub_rate=0.01,
                revcomp_frac=0.3):
    out = []
    for i in range(n):
        L = lengths[i % len(lengths)] if i % 3 else rng.choice(lengths)
        r = convert_reads(rng, ref, 1, L, rule, rate=rate,
                          sub_rate=sub_rate, revcomp_frac=revcomp_frac)[0]
        out.append((f"r{i}_{r[0]}", r[1]))
    return out


def stale_case(tmp_path, rng, rule, flags, lengths, n_reads=120,
               genome_len=9000, **kw):
    seqs = [("chr1", random_genome(rng, genome_len)),
            ("chr2", random_genome(rng, genome_len // 2))]
    make_ref(tmp_path / "ref.fa", seqs)
    cat = "".join(s for _, s in seqs)
    make_fastq(tmp_path / "reads.fq",
               mixed_reads(rng, cat, n_reads, rule, lengths, **kw))
    args = ["-a", "reads.fq", "-d", "ref.fa", "-M", rule, "-V", "0",
            "-o", "oracle.sam"] + flags
    r = run_oracle(args, tmp_path)
    assert r.returncode == 0, r.stderr
    ours = run_ours(["-a", "reads.fq", "-d", "ref.fa", "-M", rule,
                     "-V", "0"] + flags, tmp_path)
    want = norm_sam((tmp_path / "oracle.sam").read_text())
    got = norm_sam(ours)
    assert got == want, _first_diff(got, want)


# max_offset = (L - I + 1) % s with I=4, s=16: 83->0, 99->0, 90->7, 100->1,
# 94->11 — the 0-lengths consume whatever start the others left behind.
STALE_LENGTHS = [90, 83, 100, 99, 94, 83]


def test_stale_ct(tmp_path, rng):
    stale_case(tmp_path, rng, "C:T", ["-S", "1"], STALE_LENGTHS)


def test_stale_ag_multi(tmp_path, rng):
    stale_case(tmp_path, rng, "A:G", ["-S", "3", "-r", "1", "-v", "0.1"],
               STALE_LENGTHS)


def test_stale_multiway(tmp_path, rng):
    stale_case(tmp_path, rng, "A:CGT", ["-S", "5", "-n", "1"], STALE_LENGTHS)


def test_stale_gap(tmp_path, rng):
    stale_case(tmp_path, rng, "C:T", ["-S", "2", "-g", "2"], STALE_LENGTHS)


def test_stale_qualtrim(tmp_path, rng):
    """The organic path: -q quality trimming produces mixed lengths."""
    import random
    seqs = [("chr1", random_genome(rng, 9000))]
    make_ref(tmp_path / "ref.fa", seqs)
    reads = convert_reads(rng, seqs[0][1], 120, 100, "C:T", rate=0.5,
                          sub_rate=0.01, revcomp_frac=0.3)
    # per-read low-quality tails of random length -> -q 20 trims to varied
    # lengths incl. (L-I+1)%s == 0 ones
    with open(tmp_path / "reads.fq", "w") as f:
        for name, seq in reads:
            ntail = rng.randrange(0, 40)
            qual = "I" * (len(seq) - ntail) + "#" * ntail
            f.write(f"@{name}\n{seq}\n+\n{qual}\n")
    args = ["-a", "reads.fq", "-d", "ref.fa", "-M", "C:T", "-V", "0",
            "-q", "20", "-S", "1", "-o", "oracle.sam"]
    r = run_oracle(args, tmp_path)
    assert r.returncode == 0, r.stderr
    ours = run_ours(["-a", "reads.fq", "-d", "ref.fa", "-M", "C:T",
                     "-V", "0", "-q", "20", "-S", "1"], tmp_path)
    want = norm_sam((tmp_path / "oracle.sam").read_text())
    got = norm_sam(ours)
    assert got == want, _first_diff(got, want)
