"""Inference: rebuilt-from-spec models and streaming (VST) modules."""

from ddsp_tpu.infer.inference import AutoencoderInference  # noqa: F401
from ddsp_tpu.infer.inference import load_params  # noqa: F401
from ddsp_tpu.infer.inference import VSTExtractFeatures  # noqa: F401
from ddsp_tpu.infer.inference import VSTPredictControls  # noqa: F401
from ddsp_tpu.infer.inference import VSTStatelessPredictControls  # noqa: F401
from ddsp_tpu.infer.inference import VSTSynthesize  # noqa: F401
from ddsp_tpu.infer.inference import VSTSynthesizeHarmonic  # noqa: F401
from ddsp_tpu.infer.inference import VSTSynthesizeNoise  # noqa: F401
from ddsp_tpu.infer.export import export_impulse_response  # noqa: F401
from ddsp_tpu.infer.export import export_model  # noqa: F401
