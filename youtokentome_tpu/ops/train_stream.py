"""Flat-stream BPE trainer: the v1 device training kernel.

Same semantics as ops/train_kernel.py (the naive global-argmax-per-round
formulation the reference's stress suite certifies, stress_test.cpp:
420-434) but over the flat deduplicated-word token stream used by the
encode pipeline instead of per-length bucket matrices:

  state:  t [M] int32   concatenated unique words (space-prefixed)
          wid [M] int32 word id per token (-1 padding)
          freq [WCAP]   occurrence count per word id

  round:  pair keys + run-parity count mask  ->  one 3-array sort
          segmented reduce-by-key            ->  pair counts
          4 masked reductions                ->  tie-broken argmax
          parity-selected merge + stable-sort compaction

Everything is sorts, scans and gathers — no scatter ops (TPU scatters
serialize badly) and no ragged padding waste.  One lax.while_loop, zero
host round-trips.
"""

from __future__ import annotations

import functools
import sys
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .stream_kernel import _compact
from .train_kernel import _argmax_tiebreak

BIG = jnp.int32(0x7FFFFFFF)
PAD = -1


def _segment_counts_flat(kx, ky, wf):
    """Sorted reduce-by-key; totals at segment ends, zeros elsewhere."""
    kx_s, ky_s, w_s = lax.sort((kx, ky, wf), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (kx_s[1:] != kx_s[:-1]) | (ky_s[1:] != ky_s[:-1])]
    )
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    cw = jnp.cumsum(w_s)
    end_marks = jnp.where(is_end, cw, 0)
    prev_end = jnp.concatenate(
        [jnp.zeros((1,), end_marks.dtype),
         lax.cummax(end_marks)[:-1]]
    )
    cnt = jnp.where(is_end & (kx_s != BIG), cw - prev_end, 0)
    return cnt, kx_s, ky_s


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def train_rounds_stream(
    t: jnp.ndarray,      # [M] int32 tokens, PAD-padded
    wid: jnp.ndarray,    # [M] int32 word ids, PAD-padded
    freq: jnp.ndarray,   # [WCAP] int32 word frequencies
    used_ids0: jnp.ndarray,
    vocab_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    m = t.shape[0]
    idx = jnp.arange(m)
    rules0 = jnp.full((vocab_size, 3), -1, dtype=jnp.int32)

    def cond(state):
        _, _, used, done = state
        return (~done) & (used < vocab_size)

    def body(state):
        (t, wid), rules, used, _ = state[0], state[1], state[2], state[3]
        nxt_t = jnp.concatenate([t[1:], jnp.full((1,), PAD, t.dtype)])
        nxt_w = jnp.concatenate([wid[1:], jnp.full((1,), PAD, wid.dtype)])
        valid = (wid >= 0) & (wid == nxt_w)
        # run-parity count mask: inside equal runs only even offsets count
        eq = valid & (t == nxt_t)
        last_noneq = lax.cummax(jnp.where(eq, -1, idx))
        offset = idx - last_noneq - 1
        counted = valid & (~eq | (offset % 2 == 0))
        w = jnp.where(counted, freq[jnp.maximum(wid, 0)], 0).astype(jnp.int32)
        kx = jnp.where(valid, t, BIG)
        ky = jnp.where(valid, nxt_t, BIG)
        cnt, xs, ys = _segment_counts_flat(kx, ky, w)
        c, xb, yb = _argmax_tiebreak(cnt, xs, ys)
        done = c <= 0
        z = used

        # apply merge (x, y) -> z with left-to-right non-overlap
        hit = valid & (t == xb) & (nxt_t == yb) & ~done
        ln = lax.cummax(jnp.where(hit, -1, idx))
        sel = hit & ((idx - ln - 1) % 2 == 0)
        new_t = jnp.where(sel, z, t)
        kill = jnp.concatenate([jnp.zeros((1,), bool), sel[:-1]])
        keep = ~kill & (new_t != PAD)
        (t2, w2), n_new = _compact(keep, (new_t, wid))

        rules = lax.cond(
            done,
            lambda r: r,
            lambda r: r.at[used - used_ids0].set(
                jnp.stack([xb, yb, z]).astype(jnp.int32)
            ),
            rules,
        )
        used = jnp.where(done, used, used + 1)
        return (t2, w2), rules, used, done

    (_, _), rules, used, _ = lax.while_loop(
        cond,
        body,
        (
            (t.astype(jnp.int32), wid.astype(jnp.int32)),
            rules0,
            used_ids0.astype(jnp.int32),
            jnp.asarray(False),
        ),
    )
    return rules, used - used_ids0


def flatten_word_buckets(buckets) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[(tokens [W, L], freq [W])...] -> (t [M], wid [M], freq [WCAP]).

    M is padded to a power of two to bound compiled-shape count.
    """
    ts = []
    ws = []
    fs = []
    wbase = 0
    for mat, cnt in buckets:
        valid = mat >= 0
        ts.append(mat[valid].astype(np.int32))
        k = mat.shape[0]
        widm = np.broadcast_to(
            (wbase + np.arange(k, dtype=np.int32))[:, None], mat.shape
        )
        ws.append(widm[valid].astype(np.int32))
        fs.append(cnt.astype(np.int32))
        wbase += k
    t = np.concatenate(ts) if ts else np.zeros(0, np.int32)
    wid = np.concatenate(ws) if ws else np.zeros(0, np.int32)
    freq = np.concatenate(fs) if fs else np.zeros(1, np.int32)
    m = max(16, 1 << int(np.ceil(np.log2(max(t.size, 1)))))
    tp = np.full(m, PAD, np.int32)
    wp = np.full(m, PAD, np.int32)
    tp[: t.size] = t
    wp[: wid.size] = wid
    return tp, wp, freq


def run_training_stream(buckets, used_ids0: int, vocab_size: int) -> List[Tuple[int, int, int]]:
    """Host wrapper matching ops/train_kernel.run_training's contract."""
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    t, wid, freq = flatten_word_buckets(buckets)
    rules, n_rules = train_rounds_stream(
        jnp.asarray(t),
        jnp.asarray(wid),
        jnp.asarray(freq),
        jnp.asarray(used_ids0, jnp.int32),
        vocab_size,
    )
    n = int(n_rules)
    if used_ids0 + n < vocab_size:
        print(f"WARNING merged only: {used_ids0 + n} pairs of tokens", file=sys.stderr)
    out = np.asarray(rules[:n])
    return [tuple(map(int, r)) for r in out]
