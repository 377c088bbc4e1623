"""Tiered hot/cold BPE trainer: the v5 device training kernel.

The v4 block trainer (ops/train_block.py) made the *stream* work of a
round proportional to the affected blocks, but every round still paid
two table-sized sorts — the top-k candidate sort and the count-table
fold are O(pcap log pcap), and at 100 MB the live-pair table holds
millions of entries (the reference's pair2cnt is a hash map: its
per-merge table work is O(sites), bpe.cpp:1099-1108).  Measured on the
chip, those two sorts dominate every phase of a 100 MB run.

v5 splits the count table in two, exactly:

  * **hot tier** ``[hcap]`` — every pair whose count exceeds a dynamic
    threshold ``T``, with exact per-round maintenance: the per-round
    delta fold touches only ``hcap + dcap`` entries (~100x smaller than
    pcap), and top-k selection sorts the hot tier only;
  * **cold tier** ``[pcap]`` — a frozen snapshot of the FULL table from
    the last refresh; never touched in the steady-state round;
  * **pending buffer** ``[qcap]`` — each round's compacted deltas are
    appended (no sort); a *refresh* folds cold + pending back into an
    exact full table, re-picks ``T`` (the count at the hcap/2-th rank)
    and rebuilds the hot tier, then continues.

Exactness rests on a monotonicity invariant of BPE itself: **an
existing pair's count never increases**.  A merge (x,y)->z removes
occurrences of pairs containing x or y and creates only pairs
containing z — and z did not exist before the round, so a created pair
key can never collide with a cold key; run-length counts ``floor(L/2)``
are monotone in L, and merges never join two equal-token runs (z sits
between them), so no parity case increases a count either.  Hence a
cold key's true count only decays below its frozen value <= T, and
while every accepted candidate's count is > T the hot tier's order IS
the global order.  Rounds whose top candidate drops to <= T (or whose
pending buffer fills, or whose hot fold overflows) run as *refresh
rounds*: selection comes from the freshly folded full table with no
threshold, so progress never stalls and the final rules are identical
to v1/v2/v4 (same tie-break, same k-deep prefix acceptance).

Stream-side, rounds are **tiered** by affected-block count: <=KB1 and
<=KB2 rounds gather only the affected [KB, B] blocks (the v4 mini
pipeline); denser rounds take the full-stream branch whose recount
doubles as a refresh.  Affected blocks are found with per-block
**token signatures** (a 512-bit presence filter per block, rebuilt
exactly for every modified row) — a conservative superset test that
replaces v4's per-round O(M * k) elementwise hit scan with an
O(NB * W * k) filter over block summaries; exact hit detection then
runs only inside the gathered mini-stream.
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

from .train_block import (
    _apply_rowwise,
    _mini_contribs,
    block_size_for,
)
from .train_delta import (
    PADKEY,
    _compact_kv,
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
    pair_hits,
    sort_compact,
    store_rules,
)

# signature geometry: W uint32 words = 512 presence bits per block
SIG_W = 16
_SIG_BITS = SIG_W * 32
_HASH_MULT = np.uint32(2654435761)


def _sig_pos(tok):
    """Token id -> bit position in the block signature."""
    h = tok.astype(jnp.uint32) * _HASH_MULT
    return (h >> np.uint32(23)).astype(jnp.int32) & (_SIG_BITS - 1)


def sig_build(t2d: jnp.ndarray) -> jnp.ndarray:
    """[R, B] tokens -> [R, SIG_W] uint32 presence signatures (exact for
    the given rows; PAD contributes nothing)."""
    pos = _sig_pos(t2d)
    wordi = pos >> 5
    biti = (pos & 31).astype(jnp.uint32)
    valid = t2d >= 0
    cols = []
    for w in range(SIG_W):
        contrib = jnp.where(
            valid & (wordi == w),
            jnp.left_shift(jnp.uint32(1), biti),
            jnp.uint32(0),
        )
        cols.append(
            lax.reduce(
                contrib, np.uint32(0), lambda a, b: lax.bitwise_or(a, b), (1,)
            )
        )
    return jnp.stack(cols, axis=1)


def sig_build_host(t2d: np.ndarray) -> np.ndarray:
    """numpy mirror of sig_build for the initial full-stream build."""
    h = (t2d.astype(np.uint32) * _HASH_MULT) >> np.uint32(23)
    pos = h.astype(np.int64) & (_SIG_BITS - 1)
    valid = t2d >= 0
    out = np.zeros((t2d.shape[0], SIG_W), np.uint32)
    wordi = pos >> 5
    biti = pos & 31
    rows = np.broadcast_to(
        np.arange(t2d.shape[0])[:, None], t2d.shape
    )
    np.bitwise_or.at(
        out,
        (rows[valid], wordi[valid]),
        (np.uint32(1) << biti[valid].astype(np.uint32)),
    )
    return out


def sig_prefilter(sig, acc, cx, cy):
    """Per-block flag: block MAY contain an occurrence of an accepted
    candidate — a conservative superset (both tokens' presence bits
    set).  O(NB * SIG_W * k) elementwise, no gathers."""

    def present(c):  # [k] token ids -> [NB, k] presence
        pos = _sig_pos(c)
        wordi = pos >> 5            # [k]
        bit = jnp.left_shift(
            jnp.uint32(1), (pos & 31).astype(jnp.uint32)
        )                            # [k]
        wmask = (
            jnp.arange(SIG_W, dtype=jnp.int32)[:, None] == wordi[None, :]
        )                            # [W, k]
        mask = jnp.where(wmask, bit[None, :], jnp.uint32(0))  # [W, k]
        hitw = (sig[:, :, None] & mask[None, :, :]) != 0      # [NB, W, k]
        return jnp.any(hitw, axis=1)

    cand = present(cx) & present(cy) & acc[None, :]
    return jnp.any(cand, axis=1)


def _resplit(fk, fc, hcap: int):
    """Full table -> (hot keys, hot counts, T): T is the count at the
    (hcap/2)-th rank (0 when fewer live entries) and the hot tier holds
    exactly the entries with count > T — so anything outside hot can
    never outrank a candidate accepted at count > T."""
    pcap = fc.shape[0]
    boundary = hcap // 2
    cs = lax.sort(fc)  # ascending
    T = jnp.maximum(cs[pcap - boundary] if pcap >= boundary else cs[0], 0)
    keep = fc > T
    hk, hc, _ = _compact_kv(keep, fk, fc, hcap)
    return hk, hc, T


def host_resplit(uk: np.ndarray, uc: np.ndarray, hcap: int, wide: bool):
    """numpy mirror of _resplit, laid out for the device."""
    boundary = hcap // 2
    if uc.size >= boundary:
        T = int(np.partition(uc, uc.size - boundary)[uc.size - boundary])
        T = max(T, 0)
    else:
        T = 0
    sel = uc > T
    hk, hc = _fit_table(uk[sel], uc[sel], hcap, wide)
    return hk, hc, T


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_size", "batch_k", "pcap", "hcap", "dcap", "qcap",
        "B", "KB1", "KBm", "KB2",
    ),
)
def train_rounds_tiered(
    t: jnp.ndarray,        # [NB*B] int32 tokens, block layout
    wid: jnp.ndarray,      # [NB*B] int32 word ids (-1 padding)
    freq: jnp.ndarray,     # [WCAP] int32 word frequencies
    sig: jnp.ndarray,      # [NB, SIG_W] uint32 block signatures
    hk: Tuple[jnp.ndarray, ...],  # hot keys [hcap]
    hc: jnp.ndarray,       # hot counts [hcap]
    T: jnp.ndarray,        # scalar int32 hot threshold
    ck: Tuple[jnp.ndarray, ...],  # cold keys [pcap] (frozen full table)
    ccold: jnp.ndarray,    # cold counts [pcap]
    qk: Tuple[jnp.ndarray, ...],  # pending delta keys [qcap]
    qv: jnp.ndarray,       # pending delta values [qcap]
    qn: jnp.ndarray,       # scalar int32 pending length
    rules: jnp.ndarray,    # [vocab_size, 4] int32 [x,y,z,cnt]
    used: jnp.ndarray,
    used_ids0: jnp.ndarray,
    limit: jnp.ndarray,
    vocab_size: int,
    batch_k: int = 16,
    pcap: int = 1 << 16,
    hcap: int = 1 << 14,
    dcap: int = 1 << 18,
    qcap: int = 1 << 20,
    B: int = 128,
    KB1: int = 1 << 10,
    KBm: int = 1 << 13,
    KB2: int = 1 << 14,
):
    """Resumable tiered merge rounds (module docstring).  Same driver
    contract as v2/v4: stops early with ``table_overflow`` (host retries
    with a doubled pcap, rebuilding all table state from the stream)."""
    kb = batch_k
    wide = vocab_size > 65535
    m = t.shape[0]
    NB = m // B
    KB1 = min(KB1, NB)
    KBm = min(max(KBm, KB1), NB)
    KB2 = min(max(KB2, KBm), NB)
    fw0 = freq[jnp.maximum(wid, 0)] * (wid >= 0)

    def cond(state):
        _, _, _, _, _, used, done, overflow, _ = state
        return (~done) & (~overflow) & (used < jnp.minimum(vocab_size, limit))

    def tier_mini(args, KB: int):
        """v4 mini pipeline at static KB + compacted per-round deltas."""
        t, wid, fw, sig, acc, cx, cy, zs, bflag, n_baff = args
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
        mhit, mrix = pair_hits(mt, mw, acc, cx, cy)
        mt2, mw2, mf2 = _apply_rowwise(mt, mw, mf, mhit, mrix, zs, B)
        kn, vn = _mini_contribs(mt2, mw2, mf2, wide)

        # compacted net deltas of this round (old negative, new positive)
        dk, dv, n_d = _reduce_by_key_signed(
            _concat_keys(ko, kn), jnp.concatenate([-vo, vn]), dcap
        )

        bidx_put = jnp.where(
            validb, bidx, NB + jnp.arange(KB, dtype=jnp.int32)
        )
        mt2d = mt2.reshape(KB, B)
        t_out = t2d.at[bidx_put].set(
            mt2d, mode="drop", unique_indices=True
        ).reshape(m)
        w_out = w2d.at[bidx_put].set(
            mw2.reshape(KB, B), mode="drop", unique_indices=True
        ).reshape(m)
        f_out = f2d.at[bidx_put].set(
            mf2.reshape(KB, B), mode="drop", unique_indices=True
        ).reshape(m)
        sig_out = sig.at[bidx_put].set(
            sig_build(mt2d), mode="drop", unique_indices=True
        )
        return t_out, w_out, f_out, sig_out, dk, dv, n_d, n_d <= dcap

    def tier_full(args):
        """Full-stream apply; deltas are not representable (the follow-up
        table update recounts from scratch)."""
        t, wid, fw, sig, acc, cx, cy, zs, bflag, n_baff = args
        hit, rix = pair_hits(t, wid, acc, cx, cy)
        t2, w2, f2 = _apply_rowwise(t, wid, fw, hit, rix, zs, B)
        sig2 = sig_build(t2.reshape(NB, B))
        dk = tuple(jnp.full((dcap,), PADKEY, jnp.uint32) for _ in ck)
        dv = jnp.zeros((dcap,), jnp.int32)
        return t2, w2, f2, sig2, dk, dv, jnp.asarray(0, jnp.int32), \
            jnp.asarray(False)

    def body(state):
        (t, wid, fw, sig), (hk, hc, T), (ck, ccold), (qk, qv, qn), rules, \
            used, _, _, stats = state

        # -- selection: hot tier, or full refresh fold ------------------
        hxs, hys = _unpack_key(hk)
        cch, cxh, cyh = _topk_candidates(hc, hxs, hys, kb, narrow=not wide)
        pending_ok = qn + dcap <= qcap
        use_hot = (cch[0] > T) & pending_ok
        is_refresh = ~use_hot

        def fold_full(args):
            """Refresh: exact full table + its top-k candidates (the
            pcap-sized fold and candidate sort run ONLY here)."""
            ck, ccold, qk, qv = args
            fk, fc, n_live = _reduce_by_key(
                _concat_keys(ck, qk), jnp.concatenate([ccold, qv]), pcap
            )
            fxs, fys = _unpack_key(fk)
            ccf, cxf, cyf = _topk_candidates(
                fc, fxs, fys, kb, narrow=not wide
            )
            return fk, fc, n_live, ccf, cxf, cyf

        def keep_cold(args):
            ck, ccold, _, _ = args
            z = jnp.asarray(0, jnp.int32)
            return ck, ccold, z, cch, cxh, cyh

        bk, bc, n_live0, cc, cx, cy = lax.cond(
            is_refresh, fold_full, keep_cold, (ck, ccold, qk, qv)
        )
        overflow_pre = is_refresh & (n_live0 > pcap)

        thresh = jnp.where(is_refresh, 0, T)
        acc, zs, n_acc = accept_prefix(
            cc, cx, cy, used, vocab_size, kb, min_count=thresh
        )
        # a refresh-fold overflow invalidates the selection (entries were
        # dropped): merge nothing, exit, let the host rebuild
        acc = acc & ~overflow_pre
        n_acc = jnp.where(overflow_pre, 0, n_acc)
        done = is_refresh & (n_acc == 0) & ~overflow_pre

        # -- tiered apply ----------------------------------------------
        bflag = sig_prefilter(sig, acc, cx, cy)
        n_baff = jnp.sum(bflag.astype(jnp.int32))
        targs = (t, wid, fw, sig, acc, cx, cy, zs, bflag, n_baff)
        t2, w2, f2, sig2, dk, dv, n_d, delta_ok = lax.cond(
            n_baff <= KB1,
            lambda a: tier_mini(a, KB1),
            lambda a: lax.cond(
                n_baff <= KBm,
                lambda b: tier_mini(b, KBm),
                lambda b: lax.cond(
                    n_baff <= KB2,
                    lambda c: tier_mini(c, KB2),
                    tier_full,
                    b,
                ),
                a,
            ),
            targs,
        )

        # -- table update ----------------------------------------------
        did_full = is_refresh | ~delta_ok

        def update_full(args):
            """Refresh: exact full table -> new cold + re-split hot."""
            bk, bc, dk, dv, qk, qv, t2, w2, f2 = args

            def from_deltas(a):
                bk, bc, dk, dv = a
                return _reduce_by_key(
                    _concat_keys(bk, dk), jnp.concatenate([bc, dv]), pcap
                )

            def from_recount(a):
                _, _, _, _ = a
                kf, wf = _mini_contribs(t2, w2, f2, wide)
                return _reduce_by_key(kf, wf, pcap)

            fk, fc, n_live = lax.cond(
                delta_ok, from_deltas, from_recount, (bk, bc, dk, dv)
            )
            hk2, hc2, T2 = _resplit(fk, fc, hcap)
            qk2 = tuple(jnp.full((qcap,), PADKEY, jnp.uint32) for _ in qk)
            qv2 = jnp.zeros((qcap,), jnp.int32)
            return (
                (hk2, hc2, T2), (fk, fc),
                (qk2, qv2, jnp.asarray(0, jnp.int32)),
                n_live > pcap,
            )

        def update_incremental(args):
            """Steady state: fold deltas into hot, append to pending."""
            _, _, dk, dv, qk, qv, _, _, _ = args
            hk2, hc2, n_hot = _reduce_by_key(
                _concat_keys(hk, dk), jnp.concatenate([hc, dv]), hcap
            )
            # hot overflow: poison T so the next round refreshes (the
            # overflowed fold dropped entries; cold+pending stay exact)
            T2 = jnp.where(n_hot > hcap, BIG - 1, T).astype(T.dtype)
            qs = jnp.clip(qn, 0, qcap - dcap)
            qk2 = tuple(
                lax.dynamic_update_slice(q, d, (qs,))
                for q, d in zip(qk, dk)
            )
            qv2 = lax.dynamic_update_slice(qv, dv, (qs,))
            return (
                (hk2, hc2, T2), (ck, ccold),
                (qk2, qv2, qn + n_d),
                jnp.asarray(False),
            )

        (hkn, hcn, Tn), (ckn, ccn), (qkn, qvn, qnn), overflow_post = lax.cond(
            did_full,
            update_full,
            update_incremental,
            (bk, bc, dk, dv, qk, qv, t2, w2, f2),
        )
        overflow = overflow_pre | overflow_post

        rules = store_rules(rules, acc, cx, cy, cc, zs, used_ids0, vocab_size)
        used = used + n_acc
        stats = stats + jnp.stack([
            jnp.asarray(1, jnp.int32),
            is_refresh.astype(jnp.int32),
            ((n_baff > KB1) & (n_baff <= KB2)).astype(jnp.int32),
            (n_baff > KB2).astype(jnp.int32),
        ])
        return (
            (t2, w2, f2, sig2), (hkn, hcn, Tn), (ckn, ccn),
            (qkn, qvn, qnn), rules, used, done, overflow, stats,
        )

    (t2, w2, _, sig2), hot, cold, pend, rules, used, done, overflow, stats = (
        lax.while_loop(
            cond,
            body,
            (
                (
                    t.astype(jnp.int32), wid.astype(jnp.int32),
                    fw0.astype(jnp.int32), sig,
                ),
                (hk, hc, jnp.asarray(T, jnp.int32)),
                (ck, ccold),
                (qk, qv, jnp.asarray(qn, jnp.int32)),
                rules,
                used.astype(jnp.int32),
                jnp.asarray(False),
                jnp.asarray(False),
                jnp.zeros((4,), jnp.int32),
            ),
        )
    )
    n_stream = jnp.sum((t2 >= 0).astype(jnp.int32))
    return (
        t2, w2, sig2, hot, cold, pend, rules, used, done, overflow,
        n_stream, stats,
    )


def _reduce_by_key_signed(keys, vals, cap: int):
    """reduce_by_key variant that KEEPS negative totals (per-round net
    deltas must carry decays into the hot fold and the pending buffer);
    zero totals and pad keys are dropped."""
    sorted_ = lax.sort(keys + (vals,), num_keys=len(keys))
    ks, vs = sorted_[:-1], sorted_[-1]
    diff = ks[0][1:] != ks[0][:-1]
    for k in ks[1:]:
        diff = diff | (k[1:] != k[:-1])
    first = jnp.concatenate([jnp.ones((1,), bool), diff])
    vp = jnp.maximum(vs, 0)
    vn = vp - vs
    csp = jnp.cumsum(vp)
    csn = jnp.cumsum(vn)
    basep = lax.cummax(jnp.where(first, csp - vp, 0))
    basen = lax.cummax(jnp.where(first, csn - vn, 0))
    total = (csp - basep) - (csn - basen)
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    keep = is_end & (ks[0] != PADKEY) & (total != 0)
    return _compact_kv(keep, ks, total, cap)


@functools.partial(jax.jit, static_argnames=("B",))
def _fold_check(t: jnp.ndarray, B: int):
    """Can the block rows be pairwise-folded into half the rows?
    Pairs the emptiest row with the fullest: feasible iff every pair's
    combined fill fits a block."""
    NB = t.shape[0] // B
    fills = jnp.sum((t.reshape(NB, B) >= 0).astype(jnp.int32), axis=1)
    fs = lax.sort(fills)
    return jnp.max(fs[: NB // 2] + fs[NB // 2 :][::-1]) <= B


@functools.partial(jax.jit, static_argnames=("B",))
def _fold_rows(t, wid, B: int):
    """Halve the block count by merging row pairs (device-side repack).

    The stream physically shrinks 2-4x over a run; per-round full-path
    cost scales with NB, so the driver folds rows whenever occupancy
    drops below half (one extra compiled shape per halving, persistent-
    cached).  Rows hold whole words, so concatenating two rows keeps
    every word intact; the pair-fill precondition (_fold_check) makes
    the [NB/2, 2B] -> [NB/2, B] slice lossless."""
    m = t.shape[0]
    NB = m // B
    t2d = t.reshape(NB, B)
    w2d = wid.reshape(NB, B)
    fills = jnp.sum((t2d >= 0).astype(jnp.int32), axis=1)
    order = jnp.argsort(fills)
    ts = t2d[order]
    ws = w2d[order]
    lo_t, hi_t = ts[: NB // 2], ts[NB // 2 :][::-1]
    lo_w, hi_w = ws[: NB // 2], ws[NB // 2 :][::-1]
    cat_t = jnp.concatenate([hi_t, lo_t], axis=1)  # [NB/2, 2B]
    cat_w = jnp.concatenate([hi_w, lo_w], axis=1)
    col = lax.broadcasted_iota(jnp.int32, cat_t.shape, 1)
    key = jnp.where(cat_t != PAD, col, BIG)
    _, t_s, w_s = lax.sort((key, cat_t, cat_w), dimension=1, num_keys=1)
    nt = t_s[:, :B]
    nw = w_s[:, :B]
    return nt.reshape(-1), nw.reshape(-1), sig_build(nt)


def _max_word_len(buckets) -> int:
    return max(
        (int((mat >= 0).sum(1).max()) for mat, _ in buckets if mat.size),
        default=1,
    )


def flatten_word_buckets_blocked_snug(buckets, B: int):
    """Snug block layout: words grouped by EXACT length (the v4 blocked
    flatten packed whole pow-2 length-class rows, which left ~45% of
    block slots as padding on natural word-length mixes) and NB rounded
    to a multiple of 1024 instead of a power of two (up to another 2x).
    Every full-stream op scales with NB * B, so both matter."""
    from .train_block import _reblock_flat
    from .train_stream import flatten_word_buckets

    t, wid, freq = flatten_word_buckets(buckets)
    live = wid >= 0
    tb, wb = _reblock_flat(t[live], wid[live], B)
    NB = tb.size // B
    t2d = tb.reshape(NB, B)
    live_rows = int(np.max(np.nonzero((t2d >= 0).any(axis=1))[0], initial=0)) + 1
    nb2 = max(-(-live_rows // 1024) * 1024, 1024)
    nb2 = min(nb2, NB)
    return (
        t2d[:nb2].reshape(-1),
        wb.reshape(NB, B)[:nb2].reshape(-1),
        freq,
    )


def run_training_tiered(
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
    """Host driver: same contract as run_training_block (progress /
    checkpoint / cross-driver snapshots; overflow doubles pcap and
    rebuilds every table tier from the live stream)."""
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    # smaller blocks than v4's 128 floor: with ~19 words per 128-token
    # block, a pair touching 0.5% of words touches ~9% of blocks and
    # forces the expensive tiers; at B=64 (~8 words/block) block-hit-rate
    # tracks word-hit-rate ~2x closer at ~93% packing fill
    B = block_size_for(buckets)
    if B:
        floor = int(os.environ.get("YTTM_TRAIN_B", "64"))
        B = max(min(B, max(floor, _next_pow2(_max_word_len(buckets)))), 1)
    if B == 0:
        from .train_delta import run_training_delta

        return run_training_delta(
            buckets, used_ids0, vocab_size, batch_k, progress_every,
            checkpoint_path, checkpoint_every, resume_path,
            progress_cb=progress_cb,
        )
    if resume_path:
        from .train_block import _reblock_flat
        from .train_stream import load_snapshot

        tt, ww, freq, rules_j, used = load_snapshot(
            resume_path, used_ids0, vocab_size
        )
        t, wid = _reblock_flat(np.asarray(tt), np.asarray(ww), B)
        freq = np.asarray(freq)
        rules = jnp.asarray(rules_j)
    else:
        t, wid, freq = flatten_word_buckets_blocked_snug(buckets, B)
        rules = jnp.full((vocab_size, 4), -1, dtype=jnp.int32)
        used = used_ids0

    m = int(t.shape[0])
    NB = m // B
    wide = vocab_size > 65535
    uk, uc = host_count_table(t, wid, freq)
    # floor the budget at m/4: live pair kinds on large corpora exceed
    # the per-merge growth model by far (measured: overflow retries at
    # 100 MB cost ~18 s of host recount + re-entry each)
    pcap = int(os.environ.get("YTTM_TRAIN_PCAP", "0")) or min(
        max(
            _pcap_budget(uk.size, vocab_size - used_ids0),
            _next_pow2(m) >> 2,
        ),
        _next_pow2(m),
    )
    hcap = int(os.environ.get("YTTM_TRAIN_HCAP", "0")) or min(
        _next_pow2(max(1 << 15, 2 * (vocab_size - used_ids0))), pcap
    )
    KB1 = int(os.environ.get("YTTM_TRAIN_KB1", "0")) or min(
        max(256, _next_pow2(NB >> 6)), 1 << 11
    )
    KBm = int(os.environ.get("YTTM_TRAIN_KBM", "0")) or min(
        max(4 * KB1, _next_pow2(NB >> 5)), 1 << 13
    )
    KB2 = int(os.environ.get("YTTM_TRAIN_KB2", "0")) or min(
        _next_pow2(max(NB >> 3, KBm)), 1 << 15
    )
    dcap = int(os.environ.get("YTTM_TRAIN_DCAP2", "0")) or max(
        2 * KB1 * B, 1 << 16
    )
    qcap = int(os.environ.get("YTTM_TRAIN_QCAP", "0")) or max(
        4 * dcap, 1 << 20
    )

    def device_tables():
        ck, ccold = _fit_table(uk, uc, pcap, wide)
        hk, hc, T = host_resplit(uk, uc, hcap, wide)
        qk = tuple(
            jnp.full((qcap,), PADKEY, jnp.uint32) for _ in range(2 if wide else 1)
        )
        qv = jnp.zeros((qcap,), jnp.int32)
        return ck, ccold, hk, hc, T, qk, qv

    ck, ccold, hk, hc, T, qk, qv = device_tables()
    td = jnp.asarray(t)
    wd = jnp.asarray(wid)
    fd = jnp.asarray(freq)
    sigd = jnp.asarray(sig_build_host(np.asarray(t).reshape(NB, B)))
    u0 = jnp.asarray(used_ids0, jnp.int32)
    Td = jnp.asarray(T, jnp.int32)
    qn = 0

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
        (
            td, wd, sigd, (hk, hc, Td), (ck, ccold), (qk, qv, qn_d),
            rules, used_d, done, overflow, _ns, stats,
        ) = train_rounds_tiered(
            td, wd, fd, sigd, hk, hc, Td, ck, ccold, qk, qv,
            jnp.asarray(qn, jnp.int32), rules,
            jnp.asarray(used, jnp.int32), u0,
            jnp.asarray(limit, jnp.int32), vocab_size,
            batch_k, pcap, hcap, dcap, qcap, B, KB1, KB2,
        )
        used = int(used_d)
        qn = qn_d
        # device-side repack: halve the block count once occupancy drops
        # below ~45% and the emptiest/fullest row pairing fits (keeps
        # every per-round cost proportional to the LIVE stream; each new
        # halved shape is one extra compile, persistent-cached)
        if (
            not bool(overflow)
            and m // B > int(os.environ.get("YTTM_TRAIN_FOLD_MIN", "4096"))
            and int(_ns) < int(0.45 * m)
            and bool(_fold_check(td, B))
        ):
            td, wd, sigd = _fold_rows(td, wd, B)
            m = int(td.shape[0])
        if bool(overflow):
            pcap *= 2
            print(
                f"pair-count table overflow: retrying with pcap={pcap}",
                file=sys.stderr,
            )
            tn = np.asarray(td)
            wn = np.asarray(wd)
            live = tn >= 0
            uk, uc = host_count_table(tn[live], wn[live], np.asarray(fd))
            while pcap < uk.size:
                pcap *= 2
            hcap = min(hcap, pcap)
            ck, ccold, hk, hc, T, qk, qv = device_tables()
            Td = jnp.asarray(T, jnp.int32)
            qn = 0
            continue
        if progress_cb:
            progress_cb(np.asarray(rules), used)
        if progress_every:
            n_merges = used - used_ids0
            dt = time.time() - t_start
            st = [int(x) for x in np.asarray(stats)]
            print(
                f"id: {used}/{vocab_size}  merges: {n_merges}  "
                f"({dt:.1f}s, {n_merges / max(dt, 1e-9):.0f} merges/s)  "
                f"seg rounds={st[0]} refresh={st[1]} mid={st[2]} "
                f"full={st[3]} m={td.shape[0]}",
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
