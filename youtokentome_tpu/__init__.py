"""youtokentome_tpu: a TPU-native BPE tokenizer framework.

A from-scratch JAX/XLA re-design with the capabilities of
VKCOM/YouTokenToMe: fast BPE training and encoding, BPE-dropout, the
U+2581 space meta-symbol convention, character coverage, special-token
id management, a byte-compatible ``.yttm`` model format, a drop-in
Python API, and a CLI.
"""

import os as _os

# Honor JAX_PLATFORMS explicitly: TPU PJRT plugins can take platform
# priority at registration time, in which case the env var alone does
# not win.  Users (and the test/CI environment) expect
# JAX_PLATFORMS=cpu to actually select CPU.
_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from .api import BPE, OutputType

__all__ = ["BPE", "OutputType"]
__version__ = "0.1.0"
