"""Pallas TPU kernels for the hot DSP ops."""

from ddsp_tpu.ops.pallas_kernels.gru import (  # noqa: F401
    fused_gru, gru_kernel_supported)
from ddsp_tpu.ops.pallas_kernels.harmonic import (  # noqa: F401
    fused_harmonic_synthesis, harmonic_kernel_supported)
