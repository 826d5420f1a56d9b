"""ddsp_tpu: a TPU-native differentiable digital signal processing framework.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of
magenta/ddsp: differentiable synthesizers and effects composed into processor
DAGs, neural control networks, multi-scale spectral losses, and a full
training / evaluation / inference stack — designed for TPU hardware
(MXU-friendly shapes, fused Pallas kernels for the oscillator and FIR paths,
mesh-sharded data and time axes) rather than ported from the TF reference.
"""

__version__ = '0.1.0'

from ddsp_tpu import ops  # noqa: F401
