"""Data-driven DAGs of modules over nested dictionaries of arrays.

Reference behavior: /root/reference/ddsp/dags.py (DAGLayer:58, run_dag:134).

A DAG is a list of nodes `(module, [input_key, ...], [output_key, ...])`:
  * `module`: a flax module (Processor, Loss, or plain network module).
  * `input_key`: nested keys ('a/b/c') into the growing outputs dictionary.
    DAG inputs are available both at the top level and under 'inputs/'.
  * `output_key`: optional names for positional return values; ignored when
    the module returns a dict.
The graph is executed sequentially and must be topologically sorted. Each
node's outputs land under the module's name; 'out' aliases the final node.

Unlike the reference (which reflects on Keras argspecs at runtime), modules
here declare everything statically, so an entire DAG traces into a single XLA
program with zero host-side work per step.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax

from ddsp_tpu.ops.core import nested_lookup, to_dict

Array = jax.Array
TensorDict = Dict[str, Any]
Node = Tuple[Any, ...]
DAG = Sequence[Node]


def is_processor(v) -> bool:
  """Duck typing for processors (get_controls -> get_signal modules)."""
  return hasattr(v, 'get_signal') and hasattr(v, 'get_controls')


def is_loss(v) -> bool:
  """Duck typing for losses."""
  return hasattr(v, 'get_losses_dict')


def snake_case(name: str) -> str:
  s1 = re.sub('(.)([A-Z][a-z]+)', r'\1_\2', name)
  return re.sub('([a-z0-9])([A-Z])', r'\1_\2', s1).lower()


def default_module_name(module) -> str:
  """Module's explicit name if given, else snake_case of the class name."""
  name = getattr(module, 'name', None)
  return name if name else snake_case(type(module).__name__)


def loss_module_name(loss_obj) -> str:
  """Stable dict key for a loss module.

  linen names tuple-field submodules positionally ('losses_0',
  '<field>_losses_1', ...); those carry no meaning in a losses dict, so
  fall back to the snake_case class name. Shared by every model's
  losses-dict assembly (don't re-derive the rule per model).
  """
  name = default_module_name(loss_obj)
  if re.fullmatch(r'[a-z_]*losses_\d+', name):
    name = snake_case(type(loss_obj).__name__)
  return name


class _NodeSpec:
  """Opaque holder for a dag node's module.

  Keeps the module invisible to linen's dataclass submodule scanner (which
  would otherwise auto-register it under a positional name like 'dag_0_0',
  clobbering the module's intended name). The module's name is captured at
  construction time, before any binding.
  """

  __slots__ = ('module', 'name')

  def __init__(self, module):
    self.module = module
    self.name = default_module_name(module)


class DAGModule(nn.Module):
  """Flax module that strings submodules together according to a dag spec.

  Attributes:
    dag: Sequence of (module, input_keys[, output_keys]) nodes.
  """

  dag: DAG

  def __post_init__(self):
    # Wrap node modules before linen scans fields for submodules, so node
    # names follow the module's own name rather than its dag position.
    dag = tuple(
        (node[0] if isinstance(node[0], _NodeSpec) else _NodeSpec(node[0]),)
        + tuple(node[1:]) for node in self.dag)
    object.__setattr__(self, 'dag', dag)
    super().__post_init__()

  def setup(self):
    names = []
    input_keys = []
    output_keys = []
    for node in self.dag:
      spec = node[0]
      name = spec.name
      module = spec.module.clone(name=name)
      if name in names:
        raise ValueError(f'Duplicate module name in dag: {name!r}')
      # Register each module as an attribute so its params live under its
      # own name in the param tree (like the reference's setattr pattern,
      # reference dags.py:113-127).
      setattr(self, name, module)
      names.append(name)
      input_keys.append(tuple(node[1]))
      output_keys.append(tuple(node[2]) if len(node) > 2 else None)
    self.node_names = tuple(names)
    self.node_input_keys = tuple(input_keys)
    self.node_output_keys = tuple(output_keys)

  @property
  def module_names(self):
    return list(self.node_names)

  @property
  def dag_modules(self):
    return [getattr(self, name) for name in self.node_names]

  def __call__(self, inputs: TensorDict, **kwargs) -> TensorDict:
    return self.run_dag(inputs, **kwargs)

  def run_dag(self, inputs: TensorDict, **kwargs) -> TensorDict:
    """Connect and run the dag over an input dictionary.

    Args:
      inputs: Dictionary of input arrays fed to the dag.
      **kwargs: Extra kwargs passed to every submodule (e.g. training=...).

    Returns:
      A nested dictionary of all output tensors, keyed by module name, with
      'out' aliasing the final node's outputs and the dag inputs available
      both at top level and under 'inputs'.
    """
    outputs = dict(inputs)
    outputs['inputs'] = inputs

    module_outputs = {}
    for module, name, in_keys, out_keys in zip(
        self.dag_modules, self.node_names, self.node_input_keys,
        self.node_output_keys):
      node_inputs = [nested_lookup(key, outputs) for key in in_keys]

      if is_processor(module):
        module_outputs = module(*node_inputs, return_outputs_dict=True,
                                **kwargs)
      elif is_loss(module):
        module_outputs = module.get_losses_dict(*node_inputs, **kwargs)
      else:
        module_outputs = module(*node_inputs, **kwargs)

      if not isinstance(module_outputs, dict):
        module_outputs = to_dict(module_outputs, out_keys)

      outputs[name] = module_outputs

    # 'out' is a reserved key for the final dag output.
    outputs['out'] = module_outputs
    return outputs
