"""Jittable observation/action spaces.

Parity reference: gymnax_exchange/jaxen/from_JAXMARL/spaces.py (itself
vendored from JaxMARL). Minimal, jit-compatible sample/contains.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Dict as TDict
from typing import Sequence, Tuple as TTuple, Union

import chex
import jax
import jax.numpy as jnp


class Space:
    def sample(self, rng: chex.PRNGKey) -> chex.Array:
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


class Discrete(Space):
    def __init__(self, num_categories: int, dtype=jnp.int32):
        assert num_categories >= 0
        self.n = num_categories
        self.shape = ()
        self.dtype = dtype

    def sample(self, rng):
        return jax.random.randint(rng, (), 0, self.n).astype(self.dtype)

    def contains(self, x):
        return jnp.logical_and(x >= 0, x < self.n)


class MultiDiscrete(Space):
    def __init__(self, num_categories: Sequence[int], dtype=jnp.int32):
        self.num_categories = jnp.asarray(num_categories)
        self.n = tuple(num_categories)
        self.shape = (len(num_categories),)
        self.dtype = dtype

    def sample(self, rng):
        u = jax.random.uniform(rng, self.shape)
        return jnp.floor(u * self.num_categories).astype(self.dtype)

    def contains(self, x):
        return jnp.all((x >= 0) & (x < self.num_categories))


class Box(Space):
    def __init__(self, low, high, shape: TTuple[int, ...], dtype=jnp.float32):
        self.low = low
        self.high = high
        self.shape = shape
        self.dtype = dtype

    def sample(self, rng):
        return jax.random.uniform(
            rng, self.shape, minval=self.low, maxval=self.high
        ).astype(self.dtype)

    def contains(self, x):
        return jnp.all(x >= self.low) & jnp.all(x <= self.high)


class Dict(Space):
    def __init__(self, spaces: TDict[str, Space]):
        self.spaces = OrderedDict(spaces)

    def sample(self, rng):
        keys = jax.random.split(rng, len(self.spaces))
        return OrderedDict(
            (k, s.sample(keys[i]))
            for i, (k, s) in enumerate(self.spaces.items()))

    def contains(self, x):
        ok = jnp.asarray(True)
        for k, s in self.spaces.items():
            ok = ok & s.contains(x[k])
        return ok


class Tuple(Space):
    def __init__(self, spaces: Sequence[Space]):
        self.spaces = tuple(spaces)

    def sample(self, rng):
        keys = jax.random.split(rng, len(self.spaces))
        return tuple(s.sample(k) for s, k in zip(self.spaces, keys))

    def contains(self, x):
        ok = jnp.asarray(True)
        for s, xi in zip(self.spaces, x):
            ok = ok & s.contains(xi)
        return ok
