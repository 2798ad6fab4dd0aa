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
