import os

# Force CPU with a virtual 8-device mesh for sharding tests; the real TPU is
# reserved for bench.py.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
)

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; the config knob works.
jax.config.update("jax_platforms", "cpu")

import random
import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ORACLE = Path(__file__).resolve().parents[1] / ".oracle" / "basal"

# Fail LOUDLY if the C++ engine does not build: the suite would otherwise
# silently pass through the pure-Python twins (golden but ~100x slower),
# leaving native-path regressions untested.
if not os.environ.get("BASAL_TPU_NO_NATIVE"):
    from basal_tpu.native import native_available
    assert native_available(), (
        "native engine failed to build -- see stderr; "
        "set BASAL_TPU_NO_NATIVE=1 to test the Python twins on purpose")


def have_oracle() -> bool:
    return ORACLE.exists()


# Build the vendored samtools validator on demand so the strongest BAI
# validation (tests/test_bamindex.py) never silently skips on a fresh
# checkout (VERDICT r03 item 6).  Cheap no-op when already built.
_SAMTOOLS = ORACLE.parent / "samtools"
if not _SAMTOOLS.exists():
    _script = Path(__file__).resolve().parents[1] / "tools" / "build_samtools.sh"
    if _script.exists():
        subprocess.run(["bash", str(_script)], capture_output=True,
                       timeout=600)


def run_oracle(args, cwd):
    return subprocess.run([str(ORACLE)] + args, cwd=cwd, capture_output=True,
                          text=True, timeout=600)


def make_ref(path, seqs):
    with open(path, "w") as f:
        for name, seq in seqs:
            f.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60] + "\n")


def make_fastq(path, reads):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def random_genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def convert_reads(rng, ref, n, readlen, rule, rate=0.5, sub_rate=0.0,
                  revcomp_frac=0.0):
    """Simulate base-conversion reads: convert-from base -> one of the
    convert-to bases at `rate`; optional random substitutions."""
    frm, tos = rule.split(":")
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    for i in range(n):
        pos = rng.randrange(0, len(ref) - readlen)
        s = list(ref[pos:pos + readlen])
        rc = rng.random() < revcomp_frac
        if rc:
            s = [c.translate(comp) for c in reversed(s)]
        for j, c in enumerate(s):
            if c == frm and rng.random() < rate:
                t = rng.choice(tos)
                if t == "-":
                    continue  # deletions handled by dedicated tests
                s[j] = t
            elif sub_rate and rng.random() < sub_rate:
                s[j] = rng.choice("ACGT".replace(c, ""))
        reads.append((f"r{i}_p{pos}{'_rc' if rc else ''}", "".join(s)))
    return reads


def norm_sam(text):
    """SAM lines normalized for comparison: drop @PG (command line differs)."""
    out = []
    for line in text.splitlines():
        if line.startswith("@PG"):
            continue
        out.append(line)
    return out


@pytest.fixture
def rng():
    return random.Random(20260816)
