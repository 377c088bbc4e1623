"""Device-resident open-addressing hash map for (uint32, uint32) -> int32.

TPU-native replacement for the reference's ``flat_hash_map`` on the hot
lookup paths (rule2id lookups during encoding, bpe.cpp:1549-1553;
pair2cnt during training).  The table is built on the host (numpy) and
queried on device with a fixed number of unrolled linear-probe steps —
each step is one gather + compare, fully vectorized over the query batch.

Layout: power-of-two capacity, linear probing, empty slots keyed by
EMPTY_KEY.  ``max_probes`` is recorded at build time so device lookups
are exact (a query either finds its key within max_probes steps or it is
absent).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

EMPTY_KEY = np.uint32(0xFFFFFFFF)
MISS = np.int32(0x7FFFFFFF)


def _mix(x: np.ndarray | jnp.ndarray, y, xp=np):
    """Cheap avalanche hash of a key pair (murmur-style finalizer)."""
    x = x * xp.uint32(0x9E3779B1)
    y = y * xp.uint32(0x85EBCA77)
    h = (x ^ y) + xp.uint32(0x165667B1)
    h = h ^ (h >> xp.uint32(15))
    h = h * xp.uint32(0x2545F491)
    h = h ^ (h >> xp.uint32(13))
    return h


@dataclasses.dataclass
class PairTable:
    """Immutable device-side pair -> value map (a jax pytree: the arrays
    are leaves, capacity/probe-count are static aux data)."""

    kx: jnp.ndarray      # [cap] uint32
    ky: jnp.ndarray      # [cap] uint32
    val: jnp.ndarray     # [cap] int32
    max_probes: int
    cap: int

    def lookup(self, qx: jnp.ndarray, qy: jnp.ndarray) -> jnp.ndarray:
        """Vectorized lookup; absent keys return MISS.

        ``qx``/``qy`` are int32 arrays of any shape; negative or
        out-of-range values never match (they hash to slots whose stored
        keys cannot equal them since stored keys are < 2**31).
        """
        ux = qx.astype(jnp.uint32)
        uy = qy.astype(jnp.uint32)
        h = _mix(ux, uy, xp=jnp)
        mask = jnp.uint32(self.cap - 1)
        out = jnp.full(qx.shape, MISS, dtype=jnp.int32)
        found = jnp.zeros(qx.shape, dtype=bool)
        for p in range(self.max_probes):
            slot = ((h + jnp.uint32(p)) & mask).astype(jnp.int32)
            tkx = self.kx[slot]
            tky = self.ky[slot]
            tv = self.val[slot]
            hit = (~found) & (tkx == ux) & (tky == uy) & (tkx != EMPTY_KEY)
            out = jnp.where(hit, tv, out)
            found = found | hit
        return out


import jax


jax.tree_util.register_pytree_node(
    PairTable,
    lambda t: ((t.kx, t.ky, t.val), (t.max_probes, t.cap)),
    lambda aux, ch: PairTable(ch[0], ch[1], ch[2], aux[0], aux[1]),
)


def build_pair_table(keys_x, keys_y, values, min_cap: int = 16) -> PairTable:
    """Host-side construction (numpy). Keys must be unique pairs."""
    keys_x = np.asarray(keys_x, dtype=np.uint32)
    keys_y = np.asarray(keys_y, dtype=np.uint32)
    values = np.asarray(values, dtype=np.int32)
    n = keys_x.size
    cap = max(min_cap, 1 << int(np.ceil(np.log2(max(1, 2 * n)))))
    kx = np.full(cap, EMPTY_KEY, dtype=np.uint32)
    ky = np.full(cap, EMPTY_KEY, dtype=np.uint32)
    val = np.zeros(cap, dtype=np.int32)
    maskv = cap - 1

    h = _mix(keys_x, keys_y, xp=np).astype(np.int64) & maskv
    order = np.arange(n)
    max_probes = 1
    probe = 0
    pending = order
    slots = h.copy()
    # Vectorized batched insertion: resolve collisions wave by wave.
    while pending.size:
        s = slots[pending]
        # First pending key targeting each slot wins it if the slot is free.
        free = kx[s] == EMPTY_KEY
        # dedupe targets within the wave: stable "first wins"
        uniq_slot, first_idx = np.unique(s, return_index=True)
        winners_mask = np.zeros(pending.size, dtype=bool)
        winners_mask[first_idx] = True
        can_place = winners_mask & free
        placed = pending[can_place]
        ps = s[can_place]
        kx[ps] = keys_x[placed]
        ky[ps] = keys_y[placed]
        val[ps] = values[placed]
        rest = pending[~can_place]
        slots[rest] = (slots[rest] + 1) & maskv
        pending = rest
        probe += 1
        max_probes = max(max_probes, probe)
        if probe > cap:
            raise RuntimeError("hash table insertion failed (table full)")
    return PairTable(
        kx=jnp.asarray(kx),
        ky=jnp.asarray(ky),
        val=jnp.asarray(val),
        max_probes=int(max_probes),
        cap=cap,
    )
