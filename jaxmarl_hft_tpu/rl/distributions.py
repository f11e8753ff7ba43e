"""Minimal policy distributions (the reference depends on distrax; these are
self-contained replacements with identical sampling semantics).

Parity reference: distrax.Categorical usage plus the MultiCategorical /
AutoregressiveMultiCategorical wrappers in
gymnax_exchange/jaxrl/MARL/ippo_rnn_JAXMARL.py:259-366.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


class Categorical:
    """Categorical over logits: sample / log_prob / entropy / mode."""

    def __init__(self, logits: jax.Array):
        self.logits = logits

    def sample(self, seed: jax.Array) -> jax.Array:
        return jax.random.categorical(seed, self.logits, axis=-1)

    def log_prob(self, value: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(
            logp, value[..., None].astype(jnp.int32), axis=-1)[..., 0]

    def entropy(self) -> jax.Array:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        p = jnp.exp(logp)
        return -jnp.sum(p * logp, axis=-1)

    def mode(self) -> jax.Array:
        return jnp.argmax(self.logits, axis=-1)


class MultiCategorical:
    """Independent categorical heads; log-probs and entropies sum
    (reference: ippo_rnn_JAXMARL.py:259-281)."""

    def __init__(self, logits_list: Sequence[jax.Array]):
        self.categoricals = [Categorical(l) for l in logits_list]

    def sample(self, seed):
        keys = jax.random.split(seed, len(self.categoricals))
        return jnp.stack([c.sample(k) for c, k
                          in zip(self.categoricals, keys)], axis=-1)

    def log_prob(self, actions):
        lps = [c.log_prob(actions[..., i])
               for i, c in enumerate(self.categoricals)]
        return jnp.sum(jnp.stack(lps, axis=-1), axis=-1)

    def entropy(self):
        ents = [c.entropy() for c in self.categoricals]
        return jnp.sum(jnp.stack(ents, axis=-1), axis=-1)

    def mode(self):
        return jnp.stack([c.mode() for c in self.categoricals], axis=-1)


class AutoregressiveMultiCategorical:
    """Chain-rule factorised multi-head categorical: each head's logits are a
    function of previously sampled actions
    (reference: ippo_rnn_JAXMARL.py:284-366)."""

    def __init__(self, actor_features, action_dims: Sequence[int],
                 logits_fn: Callable, given_actions: Optional[jax.Array] = None):
        self.actor_features = actor_features
        self.action_dims = tuple(action_dims)
        self.logits_fn = logits_fn
        self.given_actions = given_actions

    def sample(self, seed):
        keys = jax.random.split(seed, len(self.action_dims))
        samples: List[jax.Array] = []
        for i, key in enumerate(keys):
            logits = self.logits_fn(self.actor_features, i, samples)
            samples.append(Categorical(logits).sample(key))
        return jnp.stack(samples, axis=-1)

    def log_prob(self, actions):
        lps = []
        for i in range(len(self.action_dims)):
            prev = [actions[..., j] for j in range(i)]
            logits = self.logits_fn(self.actor_features, i, prev)
            lps.append(Categorical(logits).log_prob(actions[..., i]))
        return jnp.sum(jnp.stack(lps, axis=-1), axis=-1)

    def mode(self):
        """Greedy chain-rule decode: each head's argmax conditions the
        next head (the deterministic analogue of sample)."""
        modes: List[jax.Array] = []
        for i in range(len(self.action_dims)):
            logits = self.logits_fn(self.actor_features, i, modes)
            modes.append(Categorical(logits).mode())
        return jnp.stack(modes, axis=-1)

    def entropy(self):
        """Sum of conditional entropies. When no conditioning actions are
        available (rollout time), heads i>0 are conditioned on zero actions —
        a deterministic approximation (the true entropy would marginalise
        over prefixes; the reference makes the same approximation but feeds
        an *empty* prefix, which shape-errors for i>0)."""
        batch_shape = self.actor_features.shape[:-1]
        ents = []
        for i in range(len(self.action_dims)):
            if i == 0:
                prev = []
            elif self.given_actions is not None:
                prev = [self.given_actions[..., j] for j in range(i)]
            else:
                prev = [jnp.zeros(batch_shape, dtype=jnp.int32)
                        for _ in range(i)]
            logits = self.logits_fn(self.actor_features, i, prev)
            ents.append(Categorical(logits).entropy())
        return jnp.sum(jnp.stack(ents, axis=-1), axis=-1)
