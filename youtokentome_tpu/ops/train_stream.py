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


def _topk_candidates(cnt, xs, ys, k):
    """Top-k candidates in the reference tie-break order via one sort:
    ascending (-count, max, min, -x)."""
    mx = jnp.maximum(xs, ys)
    mn = jnp.minimum(xs, ys)
    key1 = jnp.where(cnt > 0, -cnt, BIG)
    key2 = jnp.where(cnt > 0, mx, BIG)
    key3 = jnp.where(cnt > 0, mn, BIG)
    key4 = jnp.where(cnt > 0, -xs, BIG)
    _, _, _, _, cx, cy, cc = lax.sort(
        (key1, key2, key3, key4, xs, ys, cnt), num_keys=4
    )
    return cc[:k], cx[:k], cy[:k]


@functools.partial(jax.jit, static_argnames=("vocab_size", "batch_k"))
def train_rounds_stream(
    t: jnp.ndarray,      # [M] int32 tokens, PAD-padded
    wid: jnp.ndarray,    # [M] int32 word ids, PAD-padded
    freq: jnp.ndarray,   # [WCAP] int32 word frequencies
    used_ids0: jnp.ndarray,
    vocab_size: int,
    batch_k: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge rounds with exact k-deep batching.

    Generalizes the reference's 1-deep speculative pipeline
    (bpe.cpp:1152-1169): per round, take the top-k candidates in
    tie-break order and accept the longest prefix in which no candidate
    intersects an earlier accepted one (rule_intersection,
    bpe.cpp:145-147: y_i == x_j or x_i == y_j).  Exactness argument:

    * accepted candidates are pairwise non-intersecting, so no accepted
      merge changes another's occurrence count (overlap of two pair
      occurrences forces a shared boundary token, i.e. an intersection);
    * a merge (x,y)->z only creates pairs containing z; such a pair
      (l,z) has count <= count(l,x), and (l,x) intersects (x,y), so if
      (l,x) outranked a later accepted candidate the prefix would have
      stopped there first — hence no created pair can outrank any
      accepted candidate or the next round's top (on equal counts the
      created pair loses the tie because z is the largest id);
    * stopping (not skipping) at the first intersection preserves the
      sequential order for everything after it.

    Within a round the accepted merges touch disjoint positions (two
    adjacent hits of different rules would require y_i == x_j), so they
    apply in one vectorized pass; runs of equal hits belong to a single
    x==y rule and use the usual parity selection.
    """
    m = t.shape[0]
    idx = jnp.arange(m)
    rules0 = jnp.full((vocab_size, 3), -1, dtype=jnp.int32)
    kb = batch_k

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
        cc, cx, cy = _topk_candidates(cnt, xs, ys, kb)

        # prefix acceptance with stop-at-first-intersection
        remaining = vocab_size - used

        def acc_step(j, carry):
            acc, stopped = carry
            inter = jnp.any(acc & ((cy == cx[j]) | (cx == cy[j])))
            ok = (
                (cc[j] > 0)
                & ~stopped
                & ~inter
                & (jnp.sum(acc.astype(jnp.int32)) < remaining)
            )
            acc = acc.at[j].set(ok)
            return acc, stopped | ~ok

        acc, _ = lax.fori_loop(
            0, kb, acc_step, (jnp.zeros((kb,), bool), jnp.asarray(False))
        )
        n_acc = jnp.sum(acc.astype(jnp.int32))
        done = n_acc == 0
        # z ids follow acceptance order
        zs = used + jnp.cumsum(acc.astype(jnp.int32)) - 1

        # vectorized apply of all accepted merges: per position, which
        # accepted rule hits (at most one — pairs are distinct)
        hitk = (
            valid[:, None]
            & acc[None, :]
            & (t[:, None] == cx[None, :])
            & (nxt_t[:, None] == cy[None, :])
        )
        hit = jnp.any(hitk, axis=1)
        rix = jnp.argmax(hitk, axis=1)
        ln = lax.cummax(jnp.where(hit, -1, idx))
        sel = hit & ((idx - ln - 1) % 2 == 0)
        new_t = jnp.where(sel, zs[rix], t)
        kill = jnp.concatenate([jnp.zeros((1,), bool), sel[:-1]])
        keep = ~kill & (new_t != PAD)
        (t2, w2), _ = _compact(keep, (new_t, wid))

        # store accepted rules at their batch slots (others drop out of range)
        slot = jnp.where(acc, zs - used_ids0, vocab_size)
        rules = rules.at[slot].set(
            jnp.stack([cx, cy, zs], axis=1).astype(jnp.int32), mode="drop"
        )
        used = used + n_acc
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
