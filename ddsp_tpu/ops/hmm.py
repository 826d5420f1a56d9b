"""Hidden Markov model primitives: forward log-likelihood and Viterbi.

Replaces the reference's use of tfp.distributions.HiddenMarkovModel
(/root/reference/ddsp/losses.py:247 HmmTranscriber,
/root/reference/ddsp/spectral_ops.py:525 create_hmm / :559 viterbi_decode)
with lax.scan implementations that trace into one XLA program. The
observation model is supplied as per-step log-likelihoods
[batch, time, n_states], so any emission distribution plugs in.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def forward_log_prob(log_initial: Array, log_transition: Array,
                     obs_ll: Array) -> Array:
  """Marginal log-likelihood of observations via the forward algorithm.

  Args:
    log_initial: Log initial state distribution, [n_states].
    log_transition: Log transition matrix, [n_states, n_states]
      (rows = from-state).
    obs_ll: Per-step observation log-likelihoods, [batch, time, n_states].

  Returns:
    log p(observations), shape [batch].
  """
  obs_ll = jnp.swapaxes(obs_ll, 0, 1)  # [time, batch, n_states]

  def step(log_alpha, ll_t):
    # logsumexp over the from-state axis.
    log_alpha = jax.nn.logsumexp(
        log_alpha[:, :, jnp.newaxis] + log_transition, axis=1) + ll_t
    return log_alpha, None

  log_alpha0 = log_initial + obs_ll[0]
  log_alpha, _ = jax.lax.scan(step, log_alpha0, obs_ll[1:])
  return jax.nn.logsumexp(log_alpha, axis=-1)


def viterbi_decode(log_initial: Array, log_transition: Array,
                   obs_ll: Array) -> Array:
  """Most likely state sequence (posterior mode).

  Args:
    log_initial: [n_states].
    log_transition: [n_states, n_states].
    obs_ll: [batch, time, n_states].

  Returns:
    State indices, int32 [batch, time].
  """
  obs_ll = jnp.swapaxes(obs_ll, 0, 1)  # [time, batch, n_states]

  def fwd(delta, ll_t):
    # scores[b, i, j] = delta[b, i] + log_transition[i, j]
    scores = delta[:, :, jnp.newaxis] + log_transition
    backptr = jnp.argmax(scores, axis=1).astype(jnp.int32)
    delta = jnp.max(scores, axis=1) + ll_t
    return delta, backptr

  delta0 = log_initial + obs_ll[0]
  delta_final, backptrs = jax.lax.scan(fwd, delta0, obs_ll[1:])

  last_state = jnp.argmax(delta_final, axis=-1).astype(jnp.int32)

  def bwd(state, backptr_t):
    state = jnp.take_along_axis(backptr_t, state[:, jnp.newaxis],
                                axis=1)[:, 0]
    return state, state

  _, states_rev = jax.lax.scan(bwd, last_state, backptrs, reverse=True)
  return jnp.concatenate([states_rev, last_state[jnp.newaxis]],
                         axis=0).swapaxes(0, 1)


def gaussian_obs_log_prob(observations: Array, locs: Array,
                          scales: Array) -> Array:
  """Diagonal-gaussian observation log-likelihoods for every state.

  Args:
    observations: [batch, time, obs_dim].
    locs: Per-state means, [n_states, obs_dim].
    scales: Per-state stddevs, [n_states, obs_dim].

  Returns:
    Log-likelihoods, [batch, time, n_states].
  """
  x = observations[:, :, jnp.newaxis, :]  # [batch, time, 1, obs_dim]
  z = (x - locs) / scales
  log_2pi = 1.8378770664093453
  ll = -0.5 * (z * z + log_2pi) - jnp.log(scales)
  return jnp.sum(ll, axis=-1)
