"""HMM pitch->MIDI transcriber: NLL loss + Viterbi MIDI decode.

Reference behavior: /root/reference/ddsp/losses.py (HmmTranscriber:247):
one hidden state per MIDI pitch plus an "off" state (state 0); (pitch, amp)
observations are diagonal gaussians; transitions are peaked on the diagonal
with expected note length `avg_length`.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops import hmm

Array = jax.Array


@flax.struct.dataclass
class HmmTranscriber:
  """HMM for decoding MIDI from pitch (MIDI) and amplitude trajectories.

  States: 0 = note off (broad pitch prior, low amp), 1..n_pitches-1 = the
  MIDI pitch (tight pitch gaussian, "on" amp).
  """

  log_initial: Array
  log_transition: Array
  obs_locs: Array
  obs_scales: Array
  n_pitches: int = flax.struct.field(pytree_node=False, default=128)
  weight: float = flax.struct.field(pytree_node=False, default=1.0)

  @classmethod
  def create(cls, avg_length: float = 200, midi_std: float = 0.5,
             amps_on_center: float = 1.5, amps_on_scale: float = 0.5,
             amps_off_center: float = 0.0, amps_off_scale: float = 0.1,
             n_pitches: int = 128, weight: float = 1.0) -> 'HmmTranscriber':
    # Uniform initial distribution.
    log_initial = jnp.full((n_pitches,), -np.log(n_pitches),
                           dtype=jnp.float32)

    # Transitions heavily peaked on the diagonal: hold with probability
    # 1 - 1/avg_length, otherwise uniform over the other states.
    hold = 1.0 - 1.0 / avg_length
    other = (1.0 - hold) / (n_pitches - 1)
    transitions = ((hold - other) * np.eye(n_pitches) +
                   other * np.ones((n_pitches, n_pitches)))
    transitions /= transitions.sum(axis=1, keepdims=True)
    log_transition = jnp.log(jnp.asarray(transitions, dtype=jnp.float32))

    # Observation gaussians over (pitch_midi, amp). State 0 ("off") has a
    # broad pitch prior centered mid-range and a near-zero amp.
    p_loc = np.arange(1, n_pitches, dtype=np.float32)
    pitch_loc = np.concatenate([[n_pitches / 2.0], p_loc])
    pitch_scale = np.concatenate([[float(n_pitches)],
                                  np.full(n_pitches - 1, midi_std)])
    amps_loc = np.concatenate([[amps_off_center],
                               np.full(n_pitches - 1, amps_on_center)])
    amps_scale = np.concatenate([[amps_off_scale],
                                 np.full(n_pitches - 1, amps_on_scale)])
    obs_locs = jnp.asarray(np.stack([pitch_loc, amps_loc], axis=-1),
                           dtype=jnp.float32)
    obs_scales = jnp.asarray(np.stack([pitch_scale, amps_scale], axis=-1),
                             dtype=jnp.float32)
    return cls(log_initial=log_initial, log_transition=log_transition,
               obs_locs=obs_locs, obs_scales=obs_scales,
               n_pitches=n_pitches, weight=weight)

  def _obs_ll(self, pitch: Array, amps: Array) -> Array:
    pa = jnp.concatenate([pitch, amps], axis=-1)
    return hmm.gaussian_obs_log_prob(pa, self.obs_locs, self.obs_scales)

  def log_prob(self, pitch: Array, amps: Array) -> Array:
    """log p(pitch, amps) per example; inputs [batch, time, 1]."""
    return hmm.forward_log_prob(self.log_initial, self.log_transition,
                                self._obs_ll(pitch, amps))

  def __call__(self, pitch: Array, amps: Array) -> Array:
    return self.nll(pitch, amps)

  def nll(self, pitch: Array, amps: Array,
          per_example_loss: bool = False) -> Array:
    """Negative log-likelihood per timestep."""
    avg_nll = -self.log_prob(pitch, amps) / pitch.shape[1]
    loss = avg_nll if per_example_loss else jnp.mean(avg_nll)
    return self.weight * loss

  def get_losses_dict(self, pitch: Array, amps: Array):
    return {'hmm_nll': self.nll(pitch, amps)}

  @staticmethod
  def straight_through(x: Array, x_quant: Array) -> Array:
    """Straight-through estimator: forward x_quant, gradient of x."""
    return x - jax.lax.stop_gradient(x - x_quant)

  def predict_midi(self, pitch: Array, amps: Array,
                   channel_dim: bool = True,
                   dtype=jnp.float32) -> Array:
    """Viterbi decode the most likely state as quantized MIDI."""
    q_pitch = hmm.viterbi_decode(self.log_initial, self.log_transition,
                                 self._obs_ll(pitch, amps)).astype(dtype)
    if channel_dim:
      q_pitch = q_pitch[:, :, jnp.newaxis]
    return q_pitch
