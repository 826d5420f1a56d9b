"""Processors: synths, effects, routing, and the DAG engine."""

from ddsp_tpu.proc.dags import DAGModule  # noqa: F401
from ddsp_tpu.proc.dags import default_module_name  # noqa: F401
from ddsp_tpu.proc.dags import is_loss  # noqa: F401
from ddsp_tpu.proc.dags import is_processor  # noqa: F401
from ddsp_tpu.proc.processors import Add  # noqa: F401
from ddsp_tpu.proc.processors import Crop  # noqa: F401
from ddsp_tpu.proc.processors import Mix  # noqa: F401
from ddsp_tpu.proc.processors import Processor  # noqa: F401
from ddsp_tpu.proc.processors import ProcessorGroup  # noqa: F401
from ddsp_tpu.proc.synths import FilteredNoise  # noqa: F401
from ddsp_tpu.proc.synths import Harmonic  # noqa: F401
from ddsp_tpu.proc.synths import Sinusoidal  # noqa: F401
from ddsp_tpu.proc.synths import TensorToAudio  # noqa: F401
from ddsp_tpu.proc.synths import Wavetable  # noqa: F401
from ddsp_tpu.proc.effects import ExpDecayReverb  # noqa: F401
from ddsp_tpu.proc.effects import FilteredNoiseReverb  # noqa: F401
from ddsp_tpu.proc.effects import FIRFilter  # noqa: F401
from ddsp_tpu.proc.effects import ModDelay  # noqa: F401
from ddsp_tpu.proc.effects import Reverb  # noqa: F401
