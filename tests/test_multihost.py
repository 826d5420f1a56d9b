"""Multi-host (multi-process) data-parallel training actually executes.

The reference only ever tests TF_CONFIG *parsing* for its multi-worker
path (/root/reference/ddsp/training/docker/task_test.py:26-74); here two
real processes initialize jax.distributed against a local coordinator,
form one 4-device global mesh (2 virtual CPU devices per process, gloo
collectives), and run real Trainer steps with per-host batch feeding -
the same code path `run.py --multihost` uses on a TPU pod.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = '''
import os, sys
sys.path.insert(0, {repo!r})
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax
jax.config.update('jax_platforms', 'cpu')
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address='127.0.0.1:' + sys.argv[2],
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

import numpy as np
from ddsp_tpu.utils import build_model
from ddsp_tpu.parallel import create_mesh
from ddsp_tpu.train import Trainer

model = build_model('tiny', n_samples=4000, time_steps=50, n_harmonics=6,
                    n_noise_magnitudes=5, reverb_length=500)
# Per-host batch rows (different per process); global batch = 4 rows
# assembled across hosts by shard_batch.
rng = np.random.RandomState(100 + pid)
local_batch = {{
    'audio': (0.1 * rng.randn(2, 4000)).astype(np.float32),
    'f0_hz': np.full((2, 50, 1), 220.0, np.float32),
    'loudness_db': (-30 + 5 * rng.randn(2, 50)).astype(np.float32),
}}
mesh = create_mesh(n_data=4)
trainer = Trainer(model, mesh=mesh, seed=0)
state = trainer.init(local_batch)
prev = None
for _ in range(2):
  state, losses = trainer.train_step(state, local_batch)
  total = float(losses['total_loss'])
  assert np.isfinite(total), total
print('MULTIHOST_OK process=%d step=%d loss=%.6f'
      % (pid, int(jax.device_get(state.step)), total), flush=True)
'''


def _free_port():
  s = socket.socket()
  s.bind(('127.0.0.1', 0))
  port = s.getsockname()[1]
  s.close()
  return port


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
  script = tmp_path / 'worker.py'
  script.write_text(WORKER.format(repo=REPO))
  port = str(_free_port())
  env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
  env.pop('XLA_FLAGS', None)  # Workers set their own 2-device flag.
  procs = [
      subprocess.Popen([sys.executable, str(script), str(i), port],
                       env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True)
      for i in range(2)
  ]
  outs = []
  for p in procs:
    out, _ = p.communicate(timeout=1200)
    outs.append(out)
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f'process {i} failed:\n{out[-3000:]}'
    assert 'MULTIHOST_OK' in out, out[-2000:]

  # Both processes computed the SAME global loss (one SPMD program over
  # the 4-device mesh, loss replicated), from different local data.
  losses = [out.split('loss=')[1].split()[0].strip() for out in outs]
  assert losses[0] == losses[1], losses
