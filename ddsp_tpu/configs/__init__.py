"""Model presets (the config system; plays gin's role in the reference)."""

from ddsp_tpu.configs import presets  # noqa: F401
from ddsp_tpu.configs.presets import ae  # noqa: F401
from ddsp_tpu.configs.presets import solo_instrument  # noqa: F401
from ddsp_tpu.configs.presets import tiny  # noqa: F401
