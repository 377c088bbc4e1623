"""Data-parallel batched encoding over a device mesh.

Equivalent of the reference's sentence-block thread fan-out
(encode_parallel, bpe.cpp:1697-1738): word batches are sharded along the
``data`` axis, rule tables are replicated, and every row is independent,
so the only collective is the loop-termination reduce.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.encode_kernel import EncoderTables, _encode_greedy
from .mesh import DATA_AXIS, data_mesh


def encode_batch_sharded(
    tables: EncoderTables,
    tokens: np.ndarray,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Greedy-encode a [B, L] batch sharded over devices (dropout-free).

    Rows are padded to the device count; results are bit-identical to the
    single-device kernel at any device count.
    """
    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    b, L = tokens.shape
    bp = -(-b // n_dev) * n_dev
    if bp != b:
        tokens = np.concatenate(
            [tokens, np.full((bp - b, L), -1, dtype=tokens.dtype)]
        )
    toks = jax.device_put(
        jnp.asarray(tokens, jnp.int32), NamedSharding(mesh, P(DATA_AXIS, None))
    )
    tables_r = jax.device_put(tables, NamedSharding(mesh, P()))
    out = _encode_greedy(tables_r, toks)
    return np.asarray(out)[:b]
