"""Pallas TPU kernels for the hot DSP ops."""

from ddsp_tpu.ops.pallas_kernels.harmonic import (  # noqa: F401
    fused_harmonic_synthesis, harmonic_kernel_supported)
