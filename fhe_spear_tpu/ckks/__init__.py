"""TPU-native CKKS: contexts, ciphertext ops, rotations, keyswitching."""

from .ciphertext import Ciphertext, Plaintext
from .context import CkksContext, CkksParams, KeySwitchKey

__all__ = ["Ciphertext", "Plaintext", "CkksContext", "CkksParams", "KeySwitchKey"]
