"""Parallelism: device meshes, shardings, time-axis sharding utilities."""

from ddsp_tpu.parallel.mesh import batch_sharding  # noqa: F401
from ddsp_tpu.parallel.mesh import create_mesh  # noqa: F401
from ddsp_tpu.parallel.mesh import replicate  # noqa: F401
from ddsp_tpu.parallel.mesh import replicated_sharding  # noqa: F401
from ddsp_tpu.parallel.mesh import shard_batch  # noqa: F401
from ddsp_tpu.parallel.mesh import single_device_mesh  # noqa: F401
from ddsp_tpu.parallel import pallas_halo  # noqa: F401
from ddsp_tpu.parallel import time_shard  # noqa: F401
from ddsp_tpu.parallel.time_shard import time_sharded_fft_convolve  # noqa: F401
from ddsp_tpu.parallel.time_shard import time_sharded_harmonic_synthesis  # noqa: F401
from ddsp_tpu.parallel.time_shard import time_sharded_spectral_loss  # noqa: F401,E402
from ddsp_tpu.parallel.sp_train import make_sp_train_step  # noqa: F401,E402
from ddsp_tpu.parallel.sp_train import sp_synth_and_loss  # noqa: F401,E402
from ddsp_tpu.parallel import sp_model  # noqa: F401,E402
from ddsp_tpu.parallel.sp_model import has_time_sharding  # noqa: F401,E402
from ddsp_tpu.parallel.sp_model import sp_forward_with_losses  # noqa: F401,E402
