"""youtokentome_tpu: a TPU-native BPE tokenizer framework.

A from-scratch JAX/XLA re-design with the capabilities of
VKCOM/YouTokenToMe: fast BPE training and encoding, BPE-dropout, the
U+2581 space meta-symbol convention, character coverage, special-token
id management, a byte-compatible ``.yttm`` model format, a drop-in
Python API, and a CLI.
"""

from .api import BPE, OutputType

__all__ = ["BPE", "OutputType"]
__version__ = "0.1.0"
