"""Data providers and dataset IO."""

from ddsp_tpu.data.providers import ArrayDataProvider  # noqa: F401
from ddsp_tpu.data.providers import DataProvider  # noqa: F401
from ddsp_tpu.data.providers import SyntheticSinusoidProvider  # noqa: F401
from ddsp_tpu.data.providers import TFRecordProvider  # noqa: F401
