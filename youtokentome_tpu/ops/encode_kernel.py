"""Batched BPE encoding on device.

The reference encodes one word at a time with a priority queue over a
linked list (bpe.cpp:1455-1632).  The TPU formulation processes a padded
``[batch, length]`` tensor of words per step:

  round:  rank[b,i] = rule rank of pair (t[b,i], t[b,i+1])   (hash lookup)
          m[b]      = min_i rank[b,i]
          merge all leftmost-non-overlapping occurrences of the rank-m
          pair in row b; compact the row

Equivalence with the reference's (rank, pos)-ordered queue: merging an
occurrence of the minimum-rank rule only creates pairs containing the new
token z, and every rule mentioning z was learned later and therefore has
a larger rank (ids grow monotonically during training, preserved by the
order-preserving rename bpe.cpp:814-837).  Hence no merge can enable a
rule of rank smaller than the current minimum, and all current
occurrences of the minimum-rank rule are merged before anything else —
exactly the queue order.  Occurrences of one pair can only overlap when
x == y, where the left-to-right scan keeps even run offsets
(floor(run/2) merges), reproduced by ``select_leftmost_nonoverlapping``.

BPE-dropout (bpe.cpp:1415-1453): each candidate is independently skipped
with probability p per round; the leftmost surviving candidate of minimal
rank merges; a row with candidates but no survivor is frozen (the
reference's DropoutQueue returns false when every element was skipped,
ending the word's merge loop).  Matches the reference process
distributionally; bit-exactness is only claimed at p == 0, where the
reference itself is nondeterministic across threads (unseeded shared
std::mt19937, bpe.cpp:1415).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.state import BPEState
from .hashmap import MISS, PairTable, build_pair_table
from .segment import PAD, compact_rows, select_leftmost_nonoverlapping

PLACEHOLDER_START = 10**9  # unknown-run placeholder ids (bpe.cpp:1503-1527)

# uint16-packed transfer layout for the id-mode fast paths: device
# uploads/downloads through the remote tunnel run at ~10-30 MB/s, so
# halving the wire format doubles effective encode throughput on padded
# batches (PROFILE.md §1).  Real ids stay as-is; PAD packs to 0xFFFF and
# the per-word unknown-run placeholder ph packs to 0xFFFE - ph (word
# length <= 512 bounds ph, so 0xF000 is a safe floor).  Only models with
# vocab_size < 0xF000 use the packed path.
U16_PAD = 0xFFFF
U16_PH_TOP = 0xFFFE
U16_PH_FLOOR = 0xF000


class EncoderTables:
    """Device-side tables derived from a trained model (a jax pytree)."""

    def __init__(self, state: BPEState = None, *, _parts=None):
        if _parts is not None:
            self.table, self.rules_z, self.n_rules = _parts
            return
        rules = state.rules
        n = len(rules)
        kx = np.fromiter((r[0] for r in rules), dtype=np.uint32, count=n)
        ky = np.fromiter((r[1] for r in rules), dtype=np.uint32, count=n)
        ranks = np.arange(n, dtype=np.int32)
        self.table = build_pair_table(kx, ky, ranks)
        self.rules_z = jnp.asarray(
            np.fromiter((r[2] for r in rules), dtype=np.int32, count=n)
            if n
            else np.zeros(1, dtype=np.int32)
        )
        self.n_rules = n


jax.tree_util.register_pytree_node(
    EncoderTables,
    lambda t: ((t.table, t.rules_z), (t.n_rules,)),
    lambda aux, ch: EncoderTables(_parts=(ch[0], ch[1], aux[0])),
)


def _rank_lookup(table: PairTable, tokens: jnp.ndarray) -> jnp.ndarray:
    left = tokens[:, :-1]
    right = tokens[:, 1:]
    valid = (left != PAD) & (right != PAD)
    ranks = table.lookup(left, right)
    return jnp.where(valid, ranks, MISS)


@jax.jit
def _encode_greedy(tables: EncoderTables, tokens: jnp.ndarray) -> jnp.ndarray:
    """Deterministic (dropout = 0) batched merge loop."""
    if tables.n_rules == 0:
        return tokens
    n_len = tokens.shape[1]

    def cond(state):
        _, done, rounds = state
        return (~done) & (rounds < n_len)

    def body(state):
        toks, _, rounds = state
        ranks = _rank_lookup(tables.table, toks)
        m = jnp.min(ranks, axis=1, keepdims=True)
        active = m < MISS
        hit = (ranks == m) & active
        sel = select_leftmost_nonoverlapping(hit)
        z = tables.rules_z[jnp.clip(m, 0, tables.n_rules - 1)]
        sel_l = jnp.pad(sel, ((0, 0), (0, 1)))
        sel_r = jnp.pad(sel, ((0, 0), (1, 0)))
        merged = jnp.where(sel_l, jnp.broadcast_to(z, toks.shape), toks)
        keep = ~sel_r & (toks != PAD)
        new_toks = compact_rows(merged, keep)
        done = ~jnp.any(active)
        return new_toks, done, rounds + 1

    toks, _, _ = jax.lax.while_loop(
        cond, body, (tokens, jnp.asarray(False), jnp.asarray(0, jnp.int32))
    )
    return toks


def pack_tokens_u16(mat: np.ndarray) -> np.ndarray:
    """Host-side [B, L] int32 -> uint16 wire format (see layout note)."""
    ph = mat >= PLACEHOLDER_START
    out = np.where(
        mat < 0,
        U16_PAD,
        np.where(ph, U16_PH_TOP - (mat - PLACEHOLDER_START), mat),
    )
    return out.astype(np.uint16)


def _unpack_u16(toks_u16: jnp.ndarray) -> jnp.ndarray:
    u = toks_u16.astype(jnp.int32)
    return jnp.where(
        u == U16_PAD,
        PAD,
        jnp.where(u >= U16_PH_FLOOR, PLACEHOLDER_START + (U16_PH_TOP - u), u),
    )


@jax.jit
def _encode_greedy_u16(
    tables: EncoderTables, toks_u16: jnp.ndarray, unk_id: jnp.ndarray
) -> jnp.ndarray:
    """uint16-wire greedy encode: unpack, merge, pack.  Placeholders map
    to ``unk_id`` on device (the id-mode paths do this on the host
    anyway, and it keeps every output value < 0xF000 < U16_PAD)."""
    out = _encode_greedy(tables, _unpack_u16(toks_u16))
    o = jnp.where(out >= PLACEHOLDER_START, unk_id.astype(jnp.int32), out)
    return jnp.where(out == PAD, U16_PAD, o).astype(jnp.uint16)


@jax.jit
def _encode_dropout(
    tables: EncoderTables, tokens: jnp.ndarray, key: jnp.ndarray, p: jnp.ndarray
) -> jnp.ndarray:
    """BPE-dropout batched merge loop (one merge per row per round)."""
    if tables.n_rules == 0:
        return tokens
    b, n_len = tokens.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n_len - 1), 1)

    def cond(state):
        _, frozen, _, rounds = state
        return (~jnp.all(frozen)) & (rounds < n_len)

    def body(state):
        toks, frozen, key, rounds = state
        key, sub = jax.random.split(key)
        ranks = _rank_lookup(tables.table, toks)
        has_candidate = jnp.any(ranks < MISS, axis=1)
        drop = jax.random.uniform(sub, ranks.shape) < p
        surv = jnp.where(drop, MISS, ranks)
        m = jnp.min(surv, axis=1, keepdims=True)
        active = (m < MISS) & ~frozen[:, None]
        # leftmost surviving occurrence of the minimal surviving rank
        is_min = (surv == m) & active
        first = jnp.argmax(is_min, axis=1)
        sel = is_min & (col == first[:, None])
        z = tables.rules_z[jnp.clip(m, 0, tables.n_rules - 1)]
        sel_l = jnp.pad(sel, ((0, 0), (0, 1)))
        sel_r = jnp.pad(sel, ((0, 0), (1, 0)))
        merged = jnp.where(sel_l, jnp.broadcast_to(z, toks.shape), toks)
        keep = ~sel_r & (toks != PAD)
        new_toks = compact_rows(merged, keep)
        # A row whose every candidate was dropped this round ends its loop.
        new_frozen = frozen | (has_candidate & ~active[:, 0]) | ~has_candidate
        return new_toks, new_frozen, key, rounds + 1

    toks, _, _, _ = jax.lax.while_loop(
        cond,
        body,
        (tokens, jnp.zeros((b,), bool), key, jnp.asarray(0, jnp.int32)),
    )
    return toks


def encode_batch(
    tables: EncoderTables,
    tokens: np.ndarray,
    dropout_prob: float = 0.0,
    key: jax.Array | None = None,
) -> np.ndarray:
    """Encode a padded [B, L] int32 word batch; returns merged [B, L]."""
    toks = jnp.asarray(tokens, dtype=jnp.int32)
    if dropout_prob == 0.0:
        out = _encode_greedy(tables, toks)
    else:
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        out = _encode_dropout(tables, toks, key, jnp.float32(dropout_prob))
    return np.asarray(out)
