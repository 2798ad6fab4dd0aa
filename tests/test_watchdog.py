"""Device-fetch stall watchdog: a fetch that exceeds the adaptive timeout
is abandoned and its wave is evaluated on the host evaluator instead —
output must stay byte-identical (the host evaluator is the device kernel's
bit-exact twin), and the stall must feed the measured cost so placement
flips hostward.  Simulates the tunnel stalls recorded in DEVBENCH_r03
(one pass at 5,330 reads/s, ~20x)."""

import os
import time

import numpy as np
import pytest

from conftest import (convert_reads, have_oracle, make_fastq, make_ref,
                      norm_sam, random_genome, run_oracle)
from test_differential_se import run_ours

from basal_tpu.align import pipeline as P


@pytest.mark.skipif(not have_oracle(), reason="oracle not built")
def test_watchdog_stall_falls_back_to_host(tmp_path, rng, monkeypatch):
    seqs = [("chrW", random_genome(rng, 6000))]
    make_ref(tmp_path / "ref.fa", seqs)
    reads = convert_reads(rng, seqs[0][1], 80, 90, "A:G", rate=0.5,
                          sub_rate=0.01, revcomp_frac=0.3)
    make_fastq(tmp_path / "reads.fq", reads)
    base = ["-a", "reads.fq", "-d", "ref.fa", "-M", "A:G",
            "-V", "0", "-S", "29", "-u"]
    r = run_oracle(base + ["-o", "oracle.sam"], tmp_path)
    assert r.returncode == 0, r.stderr

    monkeypatch.setenv("BASAL_TPU_HOST_EVAL", "0")  # device waves
    monkeypatch.setenv("BASAL_TPU_WATCHDOG_MIN", "0.05")

    stalled_devs = []
    orig_init = P.DeviceContext.__init__
    orig_fetch_one = P.DeviceContext._fetch_one

    def slow_init(self, ref, params):
        orig_init(self, ref, params)
        # pretend the cost model has already been measured (tiny test
        # waves are below the 16384-candidate measurement threshold)
        self._meas_skip = 0
        self.meas_t = 1e-9
        self.meas_n = 1
        stalled_devs.append(self)

    def slow_fetch_one(self, C, res):
        time.sleep(0.5)  # >> WATCHDOG_MIN: every fetch "stalls"
        return orig_fetch_one(self, C, res)

    # the conftest 8-device CPU mesh would select ShardedDeviceContext;
    # the watchdog targets the single-chip tunnel path
    import basal_tpu.parallel.mesh as mesh
    monkeypatch.setattr(mesh, "make_sharded_context", lambda *a, **k: None)
    monkeypatch.setattr(P.DeviceContext, "__init__", slow_init)
    monkeypatch.setattr(P.DeviceContext, "_fetch_one", slow_fetch_one)
    ours = run_ours(base, tmp_path)
    assert stalled_devs and all(d.stalls > 0 for d in stalled_devs), \
        "watchdog never fired"
    # the stall penalty must register in the measured device cost
    assert all(d.meas_t > 0.04 or d.meas_n <= 1 for d in stalled_devs)
    assert norm_sam(ours) == norm_sam((tmp_path / "oracle.sam").read_text())


@pytest.mark.skipif(not have_oracle(), reason="oracle not built")
def test_watchdog_quiet_on_healthy_device(tmp_path, rng, monkeypatch):
    """No stalls, no behavior change when fetches return promptly."""
    seqs = [("chrW", random_genome(rng, 5000))]
    make_ref(tmp_path / "ref.fa", seqs)
    reads = convert_reads(rng, seqs[0][1], 50, 90, "C:T", rate=0.6,
                          sub_rate=0.01, revcomp_frac=0.3)
    make_fastq(tmp_path / "reads.fq", reads)
    base = ["-a", "reads.fq", "-d", "ref.fa", "-M", "C:T",
            "-V", "0", "-S", "7", "-u"]
    r = run_oracle(base + ["-o", "oracle.sam"], tmp_path)
    assert r.returncode == 0, r.stderr
    monkeypatch.setenv("BASAL_TPU_HOST_EVAL", "0")
    devs = []
    orig_init = P.DeviceContext.__init__

    def spy_init(self, ref, params):
        orig_init(self, ref, params)
        self._meas_skip = 0
        self.meas_t = 1e-9
        self.meas_n = 1
        devs.append(self)

    import basal_tpu.parallel.mesh as mesh
    monkeypatch.setattr(mesh, "make_sharded_context", lambda *a, **k: None)
    monkeypatch.setattr(P.DeviceContext, "__init__", spy_init)
    ours = run_ours(base, tmp_path)
    assert devs and all(d.stalls == 0 for d in devs)
    assert norm_sam(ours) == norm_sam((tmp_path / "oracle.sam").read_text())
