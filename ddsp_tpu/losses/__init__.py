"""Losses: multi-scale spectral, parameter, consistency, TWM, HMM families."""

from ddsp_tpu.losses.spectral import Loss  # noqa: F401
from ddsp_tpu.losses.spectral import LossGroup  # noqa: F401
from ddsp_tpu.losses.spectral import mean_difference  # noqa: F401
from ddsp_tpu.losses.spectral import ParamLoss  # noqa: F401
from ddsp_tpu.losses.spectral import SpectralLoss  # noqa: F401
from ddsp_tpu.losses.consistency import amp_loss  # noqa: F401
from ddsp_tpu.losses.consistency import FilteredNoiseConsistencyLoss  # noqa: F401
from ddsp_tpu.losses.consistency import freq_loss  # noqa: F401
from ddsp_tpu.losses.consistency import HarmonicConsistencyLoss  # noqa: F401
from ddsp_tpu.losses.consistency import KDEConsistencyLoss  # noqa: F401
from ddsp_tpu.losses.consistency import mixture_log_prob  # noqa: F401
from ddsp_tpu.losses.consistency import normal_log_prob  # noqa: F401
from ddsp_tpu.losses.consistency import wasserstein_distance  # noqa: F401
from ddsp_tpu.losses.consistency import WassersteinConsistencyLoss  # noqa: F401
from ddsp_tpu.losses.hmm_transcriber import HmmTranscriber  # noqa: F401
from ddsp_tpu.losses.twm import TWMLoss  # noqa: F401
from ddsp_tpu.losses.crepe_embedding import EmbeddingLoss  # noqa: F401,E402
from ddsp_tpu.losses.crepe_embedding import PretrainedCREPEEmbeddingLoss  # noqa: F401,E402
