"""Actor-critic recurrent policy networks.

Parity reference: gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL.py:53-256
(ScannedRNN / ActorCriticRNN / Single- & Multi-head outputs).

TPU note: set config["NETWORK_DTYPE"] = "bfloat16" to run all Dense/GRU
matmuls in bf16 on the MXU (parameters, the GRU carry, logits, and values
stay float32 — bf16 is the *compute* dtype only). Default float32 matches
the reference bit-for-bit.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.initializers import constant, orthogonal

from .distributions import (AutoregressiveMultiCategorical, Categorical,
                            MultiCategorical)


def _compute_dtype(config: Dict):
    name = (config or {}).get("NETWORK_DTYPE", "float32")
    return None if name in (None, "float32", "f32") else jnp.dtype(name)


class ScannedRNN(nn.Module):
    """GRU scanned over time with hidden reset on done flags
    (reference :53-78). The carry is stored float32; `dtype` only sets the
    GRUCell's matmul compute dtype."""
    dtype: Optional[jnp.dtype] = None

    @functools.partial(
        nn.scan,
        variable_broadcast="params",
        in_axes=0,
        out_axes=0,
        split_rngs={"params": False},
    )
    @nn.compact
    def __call__(self, carry, x):
        rnn_state = carry
        ins, resets = x
        rnn_state = jnp.where(
            resets[:, jnp.newaxis],
            self.initialize_carry(*rnn_state.shape),
            rnn_state)
        new_rnn_state, y = nn.GRUCell(features=ins.shape[1],
                                      dtype=self.dtype)(rnn_state, ins)
        return new_rnn_state.astype(jnp.float32), y

    @staticmethod
    def initialize_carry(batch_size, hidden_size):
        cell = nn.GRUCell(features=hidden_size)
        return cell.initialize_carry(jax.random.PRNGKey(0),
                                     (batch_size, hidden_size))


class SingleActionOutput(nn.Module):
    """(reference :183-201)"""
    action_dim: int
    config: Dict

    @nn.compact
    def __call__(self, x):
        logits = nn.Dense(self.action_dim, kernel_init=orthogonal(0.01),
                          bias_init=constant(0.0),
                          dtype=_compute_dtype(self.config))(x)
        return Categorical(logits=logits.astype(jnp.float32))


class MultiActionOutputIndependent(nn.Module):
    """(reference :80-100)"""
    action_dims: Sequence[int]
    config: Dict

    @nn.compact
    def __call__(self, x):
        logits_list = [
            nn.Dense(dim, kernel_init=orthogonal(0.01),
                     bias_init=constant(0.0),
                     dtype=_compute_dtype(self.config))(x)
            .astype(jnp.float32)
            for dim in self.action_dims
        ]
        return MultiCategorical(logits_list)


class MultiActionOutputAutoregressive(nn.Module):
    """Chain-rule multi-head output: head i's logits condition on embeddings
    of actions 0..i-1 (reference :102-181).

    The reference wires this by creating flax submodules lazily from the
    distribution's sample()/log_prob() — which runs *outside* the module
    apply scope and cannot work (it is also unreachable there: the
    independent-heads `elif` shadows it, reference :244-252). Here the
    parameters are materialised eagerly inside @compact and the conditional
    logits function is a pure jnp closure over them, so sampling works
    anywhere."""
    action_dims: Sequence[int]
    config: Dict
    embed_dim: int = 32

    @nn.compact
    def __call__(self, x, given_actions=None):
        feat = x.shape[-1]
        hidden_dim = self.config["GRU_HIDDEN_DIM"] // 2
        n = len(self.action_dims)

        w0 = self.param("action_0_head_kernel", orthogonal(0.01),
                        (feat, self.action_dims[0]))
        b0 = self.param("action_0_head_bias", constant(0.0),
                        (self.action_dims[0],))
        embeds = [self.param(f"action_{j}_embed", nn.initializers.normal(1.0),
                             (self.action_dims[j], self.embed_dim))
                  for j in range(n - 1)]
        heads = []
        for i in range(1, n):
            wh = self.param(f"action_{i}_hidden_kernel", orthogonal(2),
                            (feat + i * self.embed_dim, hidden_dim))
            bh = self.param(f"action_{i}_hidden_bias", constant(0.0),
                            (hidden_dim,))
            wo = self.param(f"action_{i}_head_kernel", orthogonal(0.01),
                            (hidden_dim, self.action_dims[i]))
            bo = self.param(f"action_{i}_head_bias", constant(0.0),
                            (self.action_dims[i],))
            heads.append((wh, bh, wo, bo))

        def logits_fn(x, action_idx, prev_actions):
            if action_idx == 0:
                return x @ w0 + b0
            # jnp.take, not raw indexing: checkpoint-restored params are
            # host numpy arrays, and np_array[traced_action] cannot trace
            emb = [jnp.take(embeds[j], prev_actions[j], axis=0)
                   for j in range(len(prev_actions))]
            combined = jnp.concatenate([x] + emb, axis=-1)
            wh, bh, wo, bo = heads[action_idx - 1]
            h = nn.relu(combined @ wh + bh)
            return h @ wo + bo

        return AutoregressiveMultiCategorical(
            actor_features=x, action_dims=self.action_dims,
            logits_fn=logits_fn, given_actions=given_actions)


class ActorCriticRNN(nn.Module):
    """Dense -> GRU -> {critic head, actor heads} (reference :203-256)."""
    action_dim: Union[int, Sequence[int]]
    config: Dict

    @nn.compact
    def __call__(self, hidden, x):
        dtype = _compute_dtype(self.config)
        obs, dones = x
        embedding = nn.Dense(self.config["FC_DIM_SIZE"],
                             kernel_init=orthogonal(jnp.sqrt(2)),
                             bias_init=constant(0.0), dtype=dtype)(obs)
        embedding = nn.relu(embedding)

        hidden, embedding = ScannedRNN(dtype=dtype)(hidden,
                                                    (embedding, dones))

        critic = nn.Dense(self.config["FC_DIM_SIZE"],
                          kernel_init=orthogonal(2),
                          bias_init=constant(0.0), dtype=dtype)(embedding)
        critic = nn.relu(critic)
        critic = nn.Dense(1, kernel_init=orthogonal(1.0),
                          bias_init=constant(0.0), dtype=dtype)(critic)
        critic = critic.astype(jnp.float32)

        actor = nn.Dense(self.config["GRU_HIDDEN_DIM"],
                         kernel_init=orthogonal(2),
                         bias_init=constant(0.0), dtype=dtype)(embedding)
        actor = nn.relu(actor)

        action_dim = self.action_dim
        if isinstance(action_dim, (list, tuple)) and len(action_dim) == 1:
            action_dim = action_dim[0]

        if isinstance(action_dim, int):
            pi = SingleActionOutput(action_dim=action_dim,
                                    config=self.config)(actor)
        elif self.config.get("AUTOREGRESSIVE", False):
            # the autoregressive head's params are plain f32 closures; keep
            # its feature input f32 for consistent promotion
            pi = MultiActionOutputAutoregressive(
                action_dims=action_dim,
                config=self.config)(actor.astype(jnp.float32))
        else:
            pi = MultiActionOutputIndependent(
                action_dims=action_dim, config=self.config)(actor)

        return hidden, pi, jnp.squeeze(critic, axis=-1)
