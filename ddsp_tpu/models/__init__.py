"""Models: Autoencoder (flagship), MidiAutoencoder(+Z), InverseSynthesis."""

from ddsp_tpu.models.autoencoder import Autoencoder  # noqa: F401
from ddsp_tpu.models.inverse_synthesis import InverseSynthesis  # noqa: F401
from ddsp_tpu.models.midi_autoencoder import MarginLoss  # noqa: F401
from ddsp_tpu.models.midi_autoencoder import MidiAutoencoder  # noqa: F401
from ddsp_tpu.models.midi_autoencoder import SlownessLoss  # noqa: F401
from ddsp_tpu.models.midi_autoencoder import ZMidiAutoencoder  # noqa: F401
from ddsp_tpu.models.model import Model  # noqa: F401
