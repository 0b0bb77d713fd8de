"""Ciphertext / Plaintext containers.

A ciphertext is a pair (c0, c1) of ring elements stored as one uint32
tensor of shape [2, l, N]: evaluation (NTT) domain, Montgomery form, one
row per active RNS limb.  `l` plays the role of the reference's
`chain_index()` (test_fully_enc_bsgs.py:32): rescale and mod-switch drop
the trailing limb row.  The scale is tracked exactly as a float64, like
SEAL/Phantom's `scale()`/`set_scale()` (gpu/phantom_binding.cu:163).

Both types are jax pytrees: the tensor is a leaf, scale is aux data (a
static part of the tree structure — ops jitted over ciphertexts retrace
when the scale changes, which happens a bounded number of times per
circuit shape).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ["Ciphertext", "Plaintext"]


@jax.tree_util.register_pytree_node_class
@dataclass
class Ciphertext:
    c: jnp.ndarray       # [2, l, N] uint32, NTT domain, Montgomery form
    scale: float

    @property
    def level(self) -> int:
        """Number of active RNS limbs (the reference's chain index)."""
        return self.c.shape[-2]

    def tree_flatten(self):
        return (self.c,), self.scale

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


@jax.tree_util.register_pytree_node_class
@dataclass
class Plaintext:
    p: jnp.ndarray       # [l, N] uint32, NTT domain, Montgomery form
    scale: float

    @property
    def level(self) -> int:
        return self.p.shape[-2]

    def tree_flatten(self):
        return (self.p,), self.scale

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)
