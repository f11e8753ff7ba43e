"""Pytree and integer-allocation utilities.

Parity reference: gymnax_exchange/utils/utils.py (:11-114).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def tree_stack(trees):
    """Stack a list of pytrees leaf-wise (reference :62-63)."""
    return jtu.tree_map(lambda *v: jnp.stack(v), *trees)


def tree_unstack(tree):
    leaves, treedef = jtu.tree_flatten(tree)
    return [treedef.unflatten(leaf) for leaf in zip(*leaves, strict=True)]


def index_tree(tree, index):
    """Index every leaf's leading axis (reference :72-77)."""
    return jtu.tree_map(lambda a: a[index], tree)


def argsort_rev(arr):
    """Indices sorting `arr` descending with left-to-right tie priority
    (reference :11-13)."""
    return (arr.shape[0] - 1 - jnp.argsort(arr[::-1]))[::-1]


def rank_rev(arr):
    """Descending rank with left-to-right tie priority (reference :15-17)."""
    return jnp.argsort(argsort_rev(arr))


def clip_by_sum_int(a: jax.Array, max_sum: int) -> jax.Array:
    """Clip an int vector so its sum is <= max_sum, preserving proportions;
    ties resolved left-to-right (reference :20-52)."""
    def clip(a, a_sum):
        q, remainders = jnp.divmod(a * max_sum, a_sum)
        rest = max_sum - jnp.sum(q)
        ranks = rank_rev(remainders)
        return jnp.where(ranks < rest, q + 1, q)

    a_sum = jnp.sum(a)
    return jax.lax.cond(a_sum > max_sum, lambda: clip(a, a_sum), lambda: a)


def hamilton_apportionment_permuted_jax(votes, seats, key):
    """Randomised largest-remainder apportionment (reference :79-114). Used
    to cap execution-agent action quantities at the remaining task size."""
    std_divisor = jnp.sum(votes) / seats
    init_seats, remainders = jnp.divmod(votes, std_divisor)
    remaining = jnp.array(seats - init_seats.sum(), dtype=jnp.int32)

    def alloc(carry, x):
        key, seats_acc, rem = carry
        key, subkey = jax.random.split(key)
        dist = (rem == rem.max()) / (rem == rem.max()).sum()
        chosen = jax.random.choice(subkey, rem.size, p=dist)
        seats_acc = seats_acc.at[chosen].add(jnp.where(x < remaining, 1, 0))
        rem = rem.at[chosen].set(0)
        return (key, seats_acc, rem), x

    (key, init_seats, remainders), _ = jax.lax.scan(
        alloc, (key, init_seats, remainders), xs=jnp.arange(votes.shape[0]))
    return init_seats
