"""Block-sparse BPE trainer: the v4 device training kernel.

The v2 delta trainer (ops/train_delta.py) made pair counting
incremental, but its per-round *work* is still O(M log M): extracting
the affected words' contributions and compacting the applied stream are
full-stream sorts no matter how few words a round touches.  At 100 MB
(M ~ 8.4M) those sorts dominate, while a typical late round touches a
few hundred words — the reference touches only the merge sites
(pair2pos, bpe.cpp:436-478).

v4 makes the per-round sorted work proportional to the AFFECTED part of
the stream:

  * **block layout** — unique words are packed into fixed [B]-token
    blocks that words never cross (host-side, per length group), so the
    resident stream is an [NB, B] matrix whose rows are independent for
    counting, application, and compaction; the flat [NB*B] view with
    ``wid`` boundary guards still serves every existing flat helper
    (block padding is PAD with wid -1, exactly like word padding);
  * per round, accepted-pair hits are detected with one fused
    elementwise pass over the flat stream (O(M) bandwidth, no sorts),
    reduced to a per-block flag, and the <= KB affected block indices
    are compacted with a sort over NB (= M/B, tiny);
  * the affected blocks are **row-gathered** into a [KB, B] mini-stream
    where all sorted work happens: old-side contributions, the
    vectorized apply with **per-row compaction** (one dimension-1 sort
    — rows are independent), and new-side contributions; contributions
    of gathered-but-unaffected words cancel exactly (-w then +w), so
    gathering whole blocks keeps the fold exact;
  * the mini contributions fold into the replicated count table with
    one sort over pcap + 2*KB*B (the v2 fold shape, mini-sized);
  * the compacted mini rows **row-scatter** back (unique indices);
  * rounds whose affected blocks exceed KB (the earliest rounds, where
    the top pair occurs everywhere) take a full-stream branch: flat
    apply with per-row compaction of all NB rows + a full recount —
    the same amortization shape as v2's recount fallback.

Semantics are identical to v1/v2/v3 (same candidate order, same k-deep
prefix acceptance, same parity selection); only the bookkeeping
differs.  Eligibility: every word must fit a block (the host driver
picks B = next_pow2(max word length), capped at 512; streams with
longer words — e.g. spaceless CJK lines — use the v2 delta trainer).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .train_delta import (
    PADKEY,
    _concat_keys,
    _fit_table,
    _next_pow2,
    _pack_keys,
    _pcap_budget,
    _reduce_by_key,
    _unpack_key,
    host_count_table,
)
from .train_stream import (
    BIG,
    PAD,
    _topk_candidates,
    accept_prefix,
    pair_hits as pair_hit_flags,  # one fused elementwise pass, no sorts
    pair_keys_and_weights_fw,
    sort_compact,
    store_rules,
)


def _apply_rowwise(t, wid, fw, hit, rix, zs, B: int):
    """Vectorized merge application with per-row compaction.

    sel/kill flags are the flat apply_accepted logic (runs of hits never
    cross a word, hence never a row, so flat scans are exact); the
    compaction is one dimension-1 sort of the [rows, B] view — rows are
    independent because words never cross blocks."""
    m = t.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    ln = lax.cummax(jnp.where(hit, -1, idx))
    sel = hit & ((idx - ln - 1) % 2 == 0)
    new_t = jnp.where(sel, zs[rix], t)
    kill = jnp.concatenate([jnp.zeros((1,), bool), sel[:-1]])
    keep = ~kill & (new_t != PAD)

    nrows = m // B
    col = jax.lax.broadcasted_iota(jnp.int32, (nrows, B), 1)
    keep2 = keep.reshape(nrows, B)
    key = jnp.where(keep2, col, BIG)
    key_s, t_s, w_s, f_s = lax.sort(
        (
            key,
            new_t.reshape(nrows, B),
            wid.reshape(nrows, B),
            fw.reshape(nrows, B),
        ),
        dimension=1,
        num_keys=1,
    )
    nkeep = jnp.sum(keep2.astype(jnp.int32), axis=1, keepdims=True)
    live = col < nkeep
    t2 = jnp.where(live, t_s, PAD)
    w2 = jnp.where(live, w_s, PAD)
    f2 = jnp.where(live, f_s, 0)
    return t2.reshape(m), w2.reshape(m), f2.reshape(m)


def _mini_contribs(t, wid, fw, wide: bool):
    """All pair contributions of a (mini) stream, uncompacted: invalid
    or zero-weight entries carry PADKEY / 0 and vanish in the fold."""
    kx, ky, w = pair_keys_and_weights_fw(t, wid, fw)
    keys = _pack_keys(jnp.where(w > 0, kx, BIG), ky, wide)
    return keys, jnp.where(w > 0, w, 0)


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "batch_k", "pcap", "B", "KB"),
)
def train_rounds_block(
    t: jnp.ndarray,       # [NB*B] int32 tokens, block layout
    wid: jnp.ndarray,     # [NB*B] int32 word ids (-1 padding)
    freq: jnp.ndarray,    # [WCAP] int32 word frequencies
    tk: jnp.ndarray,      # key tuple [pcap] (count table)
    tc: jnp.ndarray,      # [pcap] int32 exact pair counts
    rules: jnp.ndarray,   # [vocab_size, 4] int32 [x,y,z,cnt]
    used: jnp.ndarray,
    used_ids0: jnp.ndarray,
    limit: jnp.ndarray,
    vocab_size: int,
    batch_k: int = 16,
    pcap: int = 1 << 16,
    B: int = 128,
    KB: int = 1 << 10,
):
    """Resumable block-sparse merge rounds (see module docstring).
    Same driver contract as train_rounds_delta (stops early with
    ``table_overflow``; host retries with a doubled table)."""
    kb = batch_k
    wide = vocab_size > 65535
    m = t.shape[0]
    NB = m // B
    KB = min(KB, NB)
    fw0 = freq[jnp.maximum(wid, 0)] * (wid >= 0)

    def cond(state):
        _, _, _, used, done, overflow = state
        return (~done) & (~overflow) & (used < jnp.minimum(vocab_size, limit))

    def body(state):
        (t, wid, fw), (tk, tc), rules, used, _, _ = state
        xs, ys = _unpack_key(tk)
        cc, cx, cy = _topk_candidates(tc, xs, ys, kb, narrow=not wide)
        acc, zs, n_acc = accept_prefix(cc, cx, cy, used, vocab_size, kb)
        done = n_acc == 0

        hit, _ = pair_hit_flags(t, wid, acc, cx, cy)
        bflag = jnp.any(hit.reshape(NB, B), axis=1)
        n_baff = jnp.sum(bflag.astype(jnp.int32))

        def block_path(args):
            t, wid, fw, tk, tc = args
            (bidx_full,), _ = sort_compact(
                bflag, (jnp.arange(NB, dtype=jnp.int32),), (NB,)
            )
            bidx = bidx_full[:KB]
            validb = jnp.arange(KB, dtype=jnp.int32) < n_baff
            bidx_c = jnp.minimum(bidx, NB - 1)
            t2d = t.reshape(NB, B)
            w2d = wid.reshape(NB, B)
            f2d = fw.reshape(NB, B)
            mt = jnp.where(validb[:, None], t2d[bidx_c], PAD).reshape(-1)
            mw = jnp.where(validb[:, None], w2d[bidx_c], PAD).reshape(-1)
            mf = jnp.where(validb[:, None], f2d[bidx_c], 0).reshape(-1)

            ko, vo = _mini_contribs(mt, mw, mf, wide)
            mhit, mrix = pair_hit_flags(mt, mw, acc, cx, cy)
            mt2, mw2, mf2 = _apply_rowwise(mt, mw, mf, mhit, mrix, zs, B)
            kn, vn = _mini_contribs(mt2, mw2, mf2, wide)

            tk2, tc2, n_live = _reduce_by_key(
                _concat_keys(_concat_keys(tk, ko), kn),
                jnp.concatenate([tc, -vo, vn]),
                pcap,
            )
            # row-scatter the compacted mini blocks back (invalid slots
            # are dropped via distinct out-of-range indices — duplicated
            # fill indices would void the unique_indices contract)
            bidx_put = jnp.where(
                validb, bidx, NB + jnp.arange(KB, dtype=jnp.int32)
            )
            t_out = t2d.at[bidx_put].set(
                mt2.reshape(KB, B), mode="drop", unique_indices=True
            ).reshape(m)
            w_out = w2d.at[bidx_put].set(
                mw2.reshape(KB, B), mode="drop", unique_indices=True
            ).reshape(m)
            f_out = f2d.at[bidx_put].set(
                mf2.reshape(KB, B), mode="drop", unique_indices=True
            ).reshape(m)
            return t_out, w_out, f_out, tk2, tc2, n_live

        def full_path(args):
            t, wid, fw, tk, tc = args
            rix = pair_hit_flags(t, wid, acc, cx, cy)[1]
            t2, w2, f2 = _apply_rowwise(t, wid, fw, hit, rix, zs, B)
            kf, wf = _mini_contribs(t2, w2, f2, wide)
            tk2, tc2, n_live = _reduce_by_key(kf, wf, pcap)
            return t2, w2, f2, tk2, tc2, n_live

        t2, w2, f2, tk2, tc2, n_live = lax.cond(
            n_baff <= KB,
            block_path,
            full_path,
            (t, wid, fw, tk, tc),
        )
        table_overflow = n_live > pcap

        rules = store_rules(rules, acc, cx, cy, cc, zs, used_ids0, vocab_size)
        used = used + n_acc
        return (t2, w2, f2), (tk2, tc2), rules, used, done, table_overflow

    (t2, w2, _), (tk2, tc2), rules, used, done, overflow = lax.while_loop(
        cond,
        body,
        (
            (t.astype(jnp.int32), wid.astype(jnp.int32), fw0.astype(jnp.int32)),
            (tk, tc),
            rules,
            used.astype(jnp.int32),
            jnp.asarray(False),
            jnp.asarray(False),
        ),
    )
    n_stream = jnp.sum((t2 >= 0).astype(jnp.int32))
    return t2, w2, tk2, tc2, rules, used, done, overflow, n_stream


def flatten_word_buckets_blocked(
    buckets, B: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[(tokens [W, L], freq [W])...] -> block-layout (t [NB*B], wid
    [NB*B], freq [WCAP]) where no word crosses a [B]-token block
    boundary.  Packing is per length group (k = B // L words per
    block), fully vectorized; word order across groups is irrelevant
    (counting sums by key, application is word-local).  Reuses the
    int32 pair-mass guard of the flat layout."""
    from .train_stream import flatten_word_buckets

    # run the flat version first for its mass guard (cheap) and freq
    _, _, freq = flatten_word_buckets(buckets)

    rows_t: List[np.ndarray] = []
    rows_w: List[np.ndarray] = []
    wbase = 0
    for mat, cnt in buckets:
        W, L = mat.shape
        if L > B:
            raise ValueError(
                f"word length {L} exceeds block size {B}; "
                "use the delta trainer for this stream"
            )
        k = max(B // L, 1)
        nb = -(-W // k)
        tm = np.full((nb * k, L), PAD, np.int32)
        tm[:W] = mat.astype(np.int32)
        wm = np.full((nb * k, L), PAD, np.int32)
        wm[:W] = (
            (wbase + np.arange(W, dtype=np.int32))[:, None]
            * np.ones((1, L), np.int32)
        )
        wm[:W][mat < 0] = PAD
        bt = tm.reshape(nb, k * L)
        bw = wm.reshape(nb, k * L)
        if k * L < B:
            padc = np.full((nb, B - k * L), PAD, np.int32)
            bt = np.concatenate([bt, padc], axis=1)
            bw = np.concatenate([bw, padc], axis=1)
        rows_t.append(bt)
        rows_w.append(bw)
        wbase += W
    if rows_t:
        at = np.concatenate(rows_t, axis=0)
        aw = np.concatenate(rows_w, axis=0)
    else:
        at = np.zeros((0, B), np.int32)
        aw = np.zeros((0, B), np.int32)
    NB = max(_next_pow2(max(at.shape[0], 1)) , 1)
    out_t = np.full((NB, B), PAD, np.int32)
    out_w = np.full((NB, B), PAD, np.int32)
    out_t[: at.shape[0]] = at
    out_w[: at.shape[0]] = aw
    return out_t.reshape(-1), out_w.reshape(-1), np.asarray(freq, np.int32)


def block_size_for(buckets, cap: int = 512) -> int:
    """next_pow2(max word length), floored at 128; 0 when some word
    exceeds ``cap`` (caller falls back to the delta trainer)."""
    max_len = max((mat.shape[1] for mat, _ in buckets), default=1)
    if max_len > cap:
        return 0
    return max(128, _next_pow2(max_len))


def run_training_block(
    buckets,
    used_ids0: int,
    vocab_size: int,
    batch_k: int = 16,
    progress_every: int = 0,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    resume_path: str | None = None,
    progress_cb=None,
) -> List[Tuple[int, int, int]]:
    """Host driver: same contract as run_training_delta (progress /
    checkpoint; snapshots are host-compacted and cross-driver — resume
    re-blocks the compacted stream)."""
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    B = block_size_for(buckets)
    if B == 0:
        from .train_delta import run_training_delta

        return run_training_delta(
            buckets, used_ids0, vocab_size, batch_k, progress_every,
            checkpoint_path, checkpoint_every, resume_path,
        )
    if resume_path:
        from .train_stream import load_snapshot

        tt, ww, freq, rules_j, used = load_snapshot(
            resume_path, used_ids0, vocab_size
        )
        t, wid = _reblock_flat(np.asarray(tt), np.asarray(ww), B)
        freq = np.asarray(freq)
        rules = jnp.asarray(rules_j)
    else:
        t, wid, freq = flatten_word_buckets_blocked(buckets, B)
        rules = jnp.full((vocab_size, 4), -1, dtype=jnp.int32)
        used = used_ids0

    td = jnp.asarray(t)
    wd = jnp.asarray(wid)
    fd = jnp.asarray(freq)
    u0 = jnp.asarray(used_ids0, jnp.int32)

    m = int(td.shape[0])
    wide = vocab_size > 65535
    uk, uc = host_count_table(t, wid, freq)
    pcap = int(os.environ.get("YTTM_TRAIN_PCAP", "0")) or min(
        _pcap_budget(uk.size, vocab_size - used_ids0), _next_pow2(m)
    )
    KB = int(os.environ.get("YTTM_TRAIN_KB", "0")) or min(
        _next_pow2(max(1 << 8, (m // B) >> 4)), 1 << 12
    )
    tk, tc = _fit_table(uk, uc, pcap, wide)

    seg = min(
        x
        for x in (
            progress_every,
            checkpoint_every,
            1000 if progress_cb else 0,
            vocab_size,
        )
        if x
    )
    t_start = time.time()
    while used < vocab_size:
        limit = min(vocab_size, used + seg)
        td, wd, tk, tc, rules, used_d, done, overflow, _ns = (
            train_rounds_block(
                td, wd, fd, tk, tc, rules,
                jnp.asarray(used, jnp.int32), u0,
                jnp.asarray(limit, jnp.int32), vocab_size,
                batch_k, pcap, B, KB,
            )
        )
        used = int(used_d)
        if bool(overflow):
            pcap *= 2
            tn = np.asarray(td)
            wn = np.asarray(wd)
            live = tn >= 0
            uk, uc = host_count_table(tn[live], wn[live], np.asarray(fd))
            while pcap < uk.size:
                pcap *= 2
            tk, tc = _fit_table(uk, uc, pcap, wide)
            continue
        if progress_cb:
            progress_cb(np.asarray(rules), used)
        if progress_every:
            n_merges = used - used_ids0
            dt = time.time() - t_start
            print(
                f"id: {used}/{vocab_size}  merges: {n_merges}  "
                f"({dt:.1f}s, {n_merges / max(dt, 1e-9):.0f} merges/s)",
                file=sys.stderr,
            )
        if checkpoint_path and checkpoint_every and used < vocab_size:
            from .train_stream import save_snapshot

            save_snapshot(
                checkpoint_path, np.asarray(td), np.asarray(wd),
                np.asarray(fd), np.asarray(rules), used, used_ids0,
            )
        if bool(done):
            break

    n = used - used_ids0
    if n < vocab_size - used_ids0:
        print(f"WARNING merged only: {used} pairs of tokens", file=sys.stderr)
    out = np.asarray(rules[:n, :3])
    return [tuple(map(int, r)) for r in out]


def _reblock_flat(t: np.ndarray, wid: np.ndarray, B: int):
    """Re-block a compacted flat stream (snapshot resume): split into
    words, group by length, pack per group (vectorized)."""
    live = wid >= 0
    t = t[live]
    wid = wid[live]
    if t.size == 0:
        return (
            np.full(B, PAD, np.int32),
            np.full(B, PAD, np.int32),
        )
    starts = np.nonzero(
        np.concatenate([[True], wid[1:] != wid[:-1]])
    )[0]
    lens = np.diff(np.concatenate([starts, [t.size]]))
    rows_t: List[np.ndarray] = []
    rows_w: List[np.ndarray] = []
    for L in np.unique(lens):
        sel = np.nonzero(lens == L)[0]
        idx2d = starts[sel][:, None] + np.arange(L)[None, :]
        tm = t[idx2d].astype(np.int32)
        wm = wid[idx2d].astype(np.int32)
        W = sel.size
        k = max(B // int(L), 1)
        nb = -(-W // k)
        tp = np.full((nb * k, L), PAD, np.int32)
        wp = np.full((nb * k, L), PAD, np.int32)
        tp[:W] = tm
        wp[:W] = wm
        bt = tp.reshape(nb, k * int(L))
        bw = wp.reshape(nb, k * int(L))
        if k * int(L) < B:
            padc = np.full((nb, B - k * int(L)), PAD, np.int32)
            bt = np.concatenate([bt, padc], axis=1)
            bw = np.concatenate([bw, padc], axis=1)
        rows_t.append(bt)
        rows_w.append(bw)
    at = np.concatenate(rows_t, axis=0)
    aw = np.concatenate(rows_w, axis=0)
    NB = _next_pow2(max(at.shape[0], 1))
    out_t = np.full((NB, B), PAD, np.int32)
    out_w = np.full((NB, B), PAD, np.int32)
    out_t[: at.shape[0]] = at
    out_w[: at.shape[0]] = aw
    return out_t.reshape(-1), out_w.reshape(-1)
