"""Data providers and dataset IO."""

from ddsp_tpu.data.providers import ArrayDataProvider  # noqa: F401
from ddsp_tpu.data.providers import DataProvider  # noqa: F401
from ddsp_tpu.data.providers import ExperimentalDataProvider  # noqa: F401
from ddsp_tpu.data.providers import LegacyTFRecordProvider  # noqa: F401
from ddsp_tpu.data.providers import SyntheticSinusoidProvider  # noqa: F401
from ddsp_tpu.data.providers import TFRecordProvider  # noqa: F401
from ddsp_tpu.data.tfds import NSynthTfds  # noqa: F401
from ddsp_tpu.data.tfds import TfdsProvider  # noqa: F401
from ddsp_tpu.data import synthetic_data  # noqa: F401,E402
from ddsp_tpu.data.multi import BaseMultiProvider  # noqa: F401,E402
from ddsp_tpu.data.multi import MixedProvider  # noqa: F401,E402
from ddsp_tpu.data.multi import SyntheticNotesProvider  # noqa: F401,E402
from ddsp_tpu.data.multi import Urmp  # noqa: F401,E402
from ddsp_tpu.data.multi import UrmpMidi  # noqa: F401,E402
from ddsp_tpu.data.multi import UrmpMidiUnsegmented  # noqa: F401,E402
from ddsp_tpu.data.multi import ZippedProvider  # noqa: F401,E402
from ddsp_tpu.data.prepare import prepare_records  # noqa: F401,E402
from ddsp_tpu.data.prefetch import prefetch_to_device  # noqa: F401,E402
