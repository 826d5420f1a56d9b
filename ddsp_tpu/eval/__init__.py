"""Evaluation: metrics, evaluators, summaries, and the eval loop."""

from ddsp_tpu.eval import eval_util  # noqa: F401
from ddsp_tpu.eval import metrics  # noqa: F401
from ddsp_tpu.eval import summaries  # noqa: F401
from ddsp_tpu.eval.evaluators import BaseEvaluator  # noqa: F401
from ddsp_tpu.eval.evaluators import BasicEvaluator  # noqa: F401
from ddsp_tpu.eval.evaluators import F0LdEvaluator  # noqa: F401
from ddsp_tpu.eval.eval_util import evaluate_or_sample  # noqa: F401
from ddsp_tpu.eval import heuristics  # noqa: F401,E402
from ddsp_tpu.eval import postprocessing  # noqa: F401,E402
from ddsp_tpu.eval.evaluators import BasicEvaluator  # noqa: F401,E402
from ddsp_tpu.eval.evaluators import F0LdEvaluator  # noqa: F401,E402
from ddsp_tpu.eval.evaluators import MidiAutoencoderEvaluator  # noqa: F401,E402
from ddsp_tpu.eval.evaluators import MidiHeuristicEvaluator  # noqa: F401,E402
from ddsp_tpu.eval.evaluators import TWMEvaluator  # noqa: F401,E402
from ddsp_tpu.eval import plotting  # noqa: F401,E402
