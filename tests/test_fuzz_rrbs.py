"""Randomized RRBS (-D) flag/config fuzz vs the oracle — the digestion-mode
analogue of test_fuzz_configs (that pool never exercises -D).  Varies the
enzyme site spelling, rule, protocol (-n), seeds/reads, -r/-w/-v, and
mixed-in reverse-complement reads; every config must be byte-identical."""

import random

import pytest

from conftest import have_oracle, make_fastq, make_ref, norm_sam, run_oracle
from test_differential_rrbs import rrbs_genome, rrbs_reads
from test_differential_se import run_ours

pytestmark = pytest.mark.skipif(not have_oracle(), reason="oracle not built")


@pytest.mark.parametrize("case_id", range(8))
def test_fuzz_rrbs_config(tmp_path, case_id):
    fz = random.Random(31000 + case_id)
    rng = fz
    rule = fz.choice(["C:T", "C:T", "A:G"])
    g = rrbs_genome(rng, n_frags=fz.randrange(25, 70),
                    frag_lo=fz.randrange(50, 80),
                    frag_hi=fz.randrange(150, 400))
    make_ref(tmp_path / "ref.fa", [("chrR", g)])
    comp = str.maketrans("ACGT", "TGCA")
    readlen = fz.choice([40, 60, 80])
    reads = rrbs_reads(rng, g, fz.randrange(25, 60), readlen=readlen,
                       rule=rule, rate=fz.choice([0.3, 0.6, 0.9]))
    if fz.random() < 0.5:
        reads += [(n + "_rc", s.translate(comp)[::-1]) for n, s in
                  rrbs_reads(rng, g, fz.randrange(5, 20), readlen=readlen,
                             rule=rule)]
    # Keep reads clear of the final CCGG fragment: a read extending past
    # the last site's end makes the reference's CCGG_seglen read one past
    # its sites vector (refbase.cpp:477 evaluates sites[right] BEFORE the
    # right<size() bound) — its emitted ZL is then undefined heap bytes
    # (observed: ZL:i:1717 for a 6396bp genome).  We clamp (documented
    # divergence, docs/COVERAGE.md), so such reads cannot byte-compare.
    last = g.rfind("CCGG")
    reads = [(n, s) for n, s in reads
             if int(n.split("_p")[1].split("_")[0]) + readlen <= last]
    make_fastq(tmp_path / "reads.fq", reads)
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
