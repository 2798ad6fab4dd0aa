"""basal_tpu — a TPU-native base-conversion sequencing aligner.

A from-scratch reimplementation of the capabilities of BASAL
(JiejunShi/BASAL v1.8.1): conversion-aware short-read alignment for
base-conversion chemistries (C:T bisulfite, A:G GLORI/eTAM, A:CGT m1A,
T:- BID-seq, ...), plus the BASALkit post-processing toolkit.

Architecture: jax/XLA/Pallas device kernels for the conversion-masked
mismatch counting (the hot loop), numpy host layers for indexing/IO, and an
exact sequential replay for bit-parity with the reference's SAM output.
"""
__version__ = "0.1.0"


def _tune_malloc():
    """Keep large per-batch numpy buffers on the heap instead of fresh mmaps.

    The pipeline allocates multi-MB arrays (group tables, candidate/count
    buffers, encoder planes) per 25k-read batch.  glibc serves >128 KB
    allocations with mmap and munmaps them on free, so every batch re-pays
    page faults + kernel zeroing for hundreds of MB; glibc's *dynamic*
    threshold adapts only slowly (measured on the bench host: passes warm
    34k -> 82k -> 156k reads/s as the threshold creeps up).  Pinning
    M_MMAP_THRESHOLD/M_TRIM_THRESHOLD at 256 MB makes the first pass run at
    steady-state speed (147k cold / 265k warm on the same workload).
    Buffers >256 MB (repeat-profile candidate tails) still mmap, so they
    are returned to the OS.  BASAL_TPU_NO_MALLOC_TUNE=1 disables; explicit
    MALLOC_*_THRESHOLD_ env vars take precedence (glibc reads them first
    and mallopt here would override, so we skip if either is set)."""
    import ctypes
    import os
    if os.environ.get("BASAL_TPU_NO_MALLOC_TUNE") == "1":
        return
    if ("MALLOC_MMAP_THRESHOLD_" in os.environ
            or "MALLOC_TRIM_THRESHOLD_" in os.environ):
        return
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        thr = 256 << 20
        libc.mallopt(ctypes.c_int(M_MMAP_THRESHOLD), ctypes.c_int(thr))
        libc.mallopt(ctypes.c_int(M_TRIM_THRESHOLD), ctypes.c_int(thr))
    except Exception:
        pass  # non-glibc platforms: the tune is an optimization only


_tune_malloc()
