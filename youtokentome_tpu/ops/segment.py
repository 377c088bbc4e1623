"""Shared vectorized primitives for the BPE kernels.

The reference manipulates per-word doubly-linked lists with run-length
compression (bpe.cpp:421-478).  On TPU the same semantics are expressed
over dense ``[batch, length]`` token tensors with three primitives:

* ``select_leftmost_nonoverlapping`` — turns a "this adjacent pair
  matches" mask into the subset a left-to-right non-overlapping scan
  would merge (the floor(run/2) rule for equal pairs, bpe.cpp:140-143 /
  stress_test.cpp:152-159 / 181-188).
* ``pair_count_mask`` — which adjacent positions contribute to pair
  counts (the equal-run skip rule).
* ``compact_rows`` — front-packs surviving tokens after a merge round.

All are elementwise ops + one associative scan + one row scatter: no
data-dependent shapes, so they fuse under jit and map onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

PAD = -1  # padding slot in token tensors


def select_leftmost_nonoverlapping(hit: jnp.ndarray) -> jnp.ndarray:
    """Subset of ``hit`` a left-to-right non-overlapping scan would take.

    ``hit[b, i]`` marks adjacent-pair positions matching some fixed pair
    (x, y).  Two hits can only be adjacent when x == y (a run of equal
    tokens); a sequential scan merges the run's even offsets, i.e.
    floor(run_len/2) merges.  Positions within each maximal run of
    consecutive hits are selected iff their offset from the run start is
    even.
    """
    n = hit.shape[-1]
    idx = lax.broadcasted_iota(jnp.int32, hit.shape, len(hit.shape) - 1)
    nonhit_idx = jnp.where(hit, -1, idx)
    last_nonhit = lax.associative_scan(jnp.maximum, nonhit_idx, axis=-1)
    offset = idx - last_nonhit - 1
    return hit & (offset % 2 == 0)


def pair_count_mask(left: jnp.ndarray, right: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Which adjacent positions are counted for pair statistics.

    Inside a run of equal tokens, only even offsets count (the reference
    skips i+1 whenever v[i]==v[i+1]==v[i+2], stress_test.cpp:155-157).
    Pairs of unequal tokens always count.
    """
    eq = (left == right) & valid
    return valid & (~eq | select_leftmost_nonoverlapping(eq))


def compact_rows(vals: jnp.ndarray, keep: jnp.ndarray, pad_val: int = PAD) -> jnp.ndarray:
    """Stable front-pack of ``vals[keep]`` per row; tail filled with pad."""
    b, n = vals.shape
    cs = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    dest = jnp.where(keep, cs - 1, n)  # non-kept entries all dump into slot n
    out = jnp.full((b, n + 1), pad_val, vals.dtype)
    out = out.at[jnp.arange(b)[:, None], dest].set(jnp.where(keep, vals, pad_val))
    return out[:, :n]


def apply_merge_rows(tokens: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
                     sel_extra: jnp.ndarray | None = None) -> jnp.ndarray:
    """Merge occurrences of pair (x, y) -> z in each row, left-to-right
    non-overlapping, exactly like the oracle scan (stress_test.cpp:181-188).

    ``x``/``y``/``z`` broadcast against rows (scalars or [B, 1]).
    ``sel_extra`` optionally restricts which matching positions merge
    (used by the encoder's per-word min-rank rule).
    """
    left = tokens[:, :-1]
    right = tokens[:, 1:]
    valid = (left != PAD) & (right != PAD)
    hit = valid & (left == x) & (right == y)
    if sel_extra is not None:
        hit = hit & sel_extra
    sel = select_leftmost_nonoverlapping(hit)
    # Position i becomes z, position i+1 dies.
    selL = jnp.pad(sel, ((0, 0), (0, 1)))           # aligned with token i
    selR = jnp.pad(sel, ((0, 0), (1, 0)))           # aligned with token i+1
    merged = jnp.where(selL, jnp.broadcast_to(z, tokens.shape), tokens)
    keep = ~selR & (tokens != PAD)
    return compact_rows(merged, keep)
