"""Models: Autoencoder (flagship), later MidiAutoencoder, InverseSynthesis."""

from ddsp_tpu.models.autoencoder import Autoencoder  # noqa: F401
from ddsp_tpu.models.model import Model  # noqa: F401
