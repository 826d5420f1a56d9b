"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-device sharding paths are exercised on CPU with
xla_force_host_platform_device_count=8, per the project test strategy
(SURVEY.md section 4). Must run before jax is imported anywhere.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8').strip()

# The env var alone is not enough on this machine (the axon TPU plugin
# still wins); force the platform through the config API before any
# backend initialization.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
  config.addinivalue_line(
      'markers', 'slow: long-running end-to-end tests (full CLI runs)')
