"""Utilities: preset registry, operative spec serialization."""

from ddsp_tpu.utils.registry import build_model  # noqa: F401
from ddsp_tpu.utils.registry import get_preset  # noqa: F401
from ddsp_tpu.utils.registry import list_presets  # noqa: F401
from ddsp_tpu.utils.registry import load_spec  # noqa: F401
from ddsp_tpu.utils.registry import model_from_spec  # noqa: F401
from ddsp_tpu.utils.registry import register_preset  # noqa: F401
from ddsp_tpu.utils.registry import save_spec  # noqa: F401
from ddsp_tpu.utils import cloud  # noqa: F401,E402
from ddsp_tpu.utils import notebook  # noqa: F401,E402
from ddsp_tpu.utils import test_util  # noqa: F401,E402
