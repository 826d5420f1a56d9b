"""Losses: multi-scale spectral, parameter, consistency families."""

from ddsp_tpu.losses.spectral import Loss  # noqa: F401
from ddsp_tpu.losses.spectral import LossGroup  # noqa: F401
from ddsp_tpu.losses.spectral import mean_difference  # noqa: F401
from ddsp_tpu.losses.spectral import ParamLoss  # noqa: F401
from ddsp_tpu.losses.spectral import SpectralLoss  # noqa: F401
