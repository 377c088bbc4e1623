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

from ..ops.encode_kernel import EncoderTables, _encode_greedy, _encode_greedy_u16
from .mesh import DATA_AXIS, data_mesh


def encode_greedy_sharded(
    tables: EncoderTables,
    tokens: np.ndarray,
    mesh: Mesh,
) -> jax.Array:
    """Asynchronously dispatch a [B, L] greedy-encode with the batch
    sharded over the mesh (B must be a multiple of the device count).
    Returns the (sharded) device array without blocking, so callers can
    pipeline multiple chunks like the single-device fast path does.
    """
    toks = jax.device_put(
        jnp.asarray(tokens, jnp.int32), NamedSharding(mesh, P(DATA_AXIS, None))
    )
    tables_r = jax.device_put(tables, NamedSharding(mesh, P()))
    return _encode_greedy(tables_r, toks)


def encode_greedy_sharded_u16(
    tables: EncoderTables,
    tokens_u16: np.ndarray,
    unk_id: int,
    mesh: Mesh,
) -> jax.Array:
    """uint16-wire variant of encode_greedy_sharded (see the layout note
    in ops/encode_kernel.py): same sharding, half the transfer bytes."""
    toks = jax.device_put(
        jnp.asarray(tokens_u16, jnp.uint16),
        NamedSharding(mesh, P(DATA_AXIS, None)),
    )
    tables_r = jax.device_put(tables, NamedSharding(mesh, P()))
    return _encode_greedy_u16(tables_r, toks, np.int32(unk_id))


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
    out = encode_greedy_sharded(tables, tokens, mesh)
    return np.asarray(out)[:b]
