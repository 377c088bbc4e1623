"""Site-local BPE trainer: the v3 device training kernel.

The v2 trainer (ops/train_delta.py) made pair *counting* incremental but
still paid three O(M log M) full-stream sorts per round (delta
compaction x2 + apply compaction), so per-round cost grew with corpus
size — the reference trains 100 MB in ~4 s (benchmark.md:23) because its
merge application touches only occurrence sites (pair2pos,
bpe.cpp:436-478; hot apply bpe.cpp:491-812).

v3 removes every per-round full-stream sort:

  * **tombstone apply** — merged-away slots become PAD *in place*; the
    stream is never compacted, so positions are stable and the
    per-position word frequency / word id arrays are static.  Adjacency
    is over the *live subsequence*: next-live neighbours come from one
    suffix-min scan, run parity (floor(run/2), bpe.cpp:140-143) is
    computed in live-rank space — all O(M) bandwidth-bound scans and
    gathers, no sorts;
  * **searchsorted compaction** — the positions of affected words (the
    only words whose pair contributions change) are extracted with a
    cumsum + batched binary search (O(M) scan + O(dcap log M) gathers)
    instead of a full-stream sort;
  * because positions are stable, ONE site list serves both delta
    sides: the old contribution is gathered from the pre-apply pair
    arrays and the new contribution is recomputed on the gathered
    mini-stream (O(dcap));
  * **tiered delta buffers** — the round body branches (lax.cond) on
    the affected-position count between a small and a large site
    buffer, falling back to a tombstone-aware full recount only when
    even the large tier overflows (the first few dozen rounds);
  * the count table fold stays the v2 one-sort reduce-by-key, but its
    input is O(pcap + dcap), never O(M).

Per-round cost: O(M) scan bandwidth (hit detection + apply masks) plus
O(pcap + dcap) sort work — no O(M log M) term, unlike v1/v2 (measured
round times live in PROFILE.md).  Semantics are identical to v1/v2
(same candidate order, same k-deep prefix acceptance, same parity
selection) — the live-subsequence formulation is the compacted stream
of v2 under the rank bijection, which the differential tests certify.
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
    _affected_positions,
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
    flatten_word_buckets,
    load_snapshot,
    save_snapshot,
    store_rules,
)

def _pairs_tomb(t: jnp.ndarray, wid: jnp.ndarray, fw: jnp.ndarray,
                wide: bool = False):
    """Pair keys + parity-masked weights over a tombstoned (sub)stream.

    Live positions (t >= 0) form the logical stream; each live position
    pairs with its next live neighbour in the same word.  Run parity is
    evaluated in live-rank space, which makes this bit-equivalent to
    train_stream.pair_keys_and_weights_fw on the compacted stream.
    Returns (keys: uint32 tuple (see train_delta key layout), w int32
    [n], live bool [n], d int32 [n]) where d is the 0-based live rank
    (reused by the apply masks).
    """
    n = t.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    live = t >= 0
    d = jnp.cumsum(live.astype(jnp.int32)) - 1
    # next live index (exclusive suffix-min of live positions)
    val = jnp.where(live, idx, n)
    suf = lax.cummin(val[::-1])[::-1]
    nl = jnp.concatenate([suf[1:], jnp.full((1,), n, suf.dtype)])
    nl_c = jnp.minimum(nl, n - 1)
    tn = t[nl_c]
    wn = wid[nl_c]
    haspair = live & (nl < n) & (wid >= 0) & (wid == wn)
    eq = haspair & (t == tn)
    # offset inside the run of equal live tokens (mirrors the dense
    # last_noneq trick of pair_keys_and_weights_fw in rank space;
    # non-live slots contribute -1, i.e. are transparent)
    lnd = lax.cummax(jnp.where(live & ~eq, d, -1))
    off = d - lnd - 1
    counted = haspair & (~eq | (off % 2 == 0))
    w = jnp.where(counted, fw, 0).astype(jnp.int32)
    keys = _pack_keys(jnp.where(haspair, t, BIG), tn, wide)
    return keys, w, live, d


def _apply_tomb(t, keys, live, d, acc, cx, cy, zs, kb: int):
    """Merge every accepted rule's occurrences in place (no compaction):
    selected pair-start positions become z, their live partners become
    PAD tombstones.  Parity selection inside runs of hits matches
    apply_accepted under the live-rank bijection."""
    # accepted candidates in the same key layout as the stream keys; a
    # non-accepted slot never matches because mj is gated on acc[j]
    # (stream padding keys are all-PADKEY and a real candidate's
    # components are < 2**31, so padding can't match either)
    ak = _pack_keys(cx, cy, wide=len(keys) == 2)
    hit = jnp.zeros(t.shape, bool)
    rix = jnp.zeros(t.shape, jnp.int32)
    for j in range(kb):
        mj = acc[j]
        for kc, ac in zip(keys, ak):
            mj = mj & (kc == ac[j])
        rix = jnp.where(mj & ~hit, j, rix)
        hit = hit | mj
    # alternate selection along runs of consecutive (in live order) hits
    lnh = lax.cummax(jnp.where(live & ~hit, d, -1))
    sel = hit & ((d - lnh - 1) % 2 == 0)
    # kill = live position whose previous live position was selected
    pv = lax.cummax(jnp.where(live & sel, d, -1))
    kill = live & ~sel & (d > 0) & (pv == d - 1)
    t2 = jnp.where(sel, zs[rix], t)
    t2 = jnp.where(kill, PAD, t2)
    return t2, hit


def _gather_affected(cs: jnp.ndarray, dcap: int):
    """Positions of the first ``dcap`` set bits of the mask whose cumsum
    is ``cs``: one batched binary search instead of a full-stream sort."""
    tgt = jnp.arange(1, dcap + 1, dtype=cs.dtype)
    pos = jnp.searchsorted(cs, tgt, side="left")
    valid = tgt <= cs[-1]
    return pos.astype(jnp.int32), valid


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "batch_k", "pcap", "dcap0", "dcap1"),
)
def train_rounds_sparse(
    t: jnp.ndarray,       # [M] int32 tokens; PAD marks tombstones/padding
    wid: jnp.ndarray,     # [M] int32 word ids (static; -1 on tail padding)
    freq: jnp.ndarray,    # [WCAP] int32 word frequencies
    tk: jnp.ndarray,      # [pcap] uint32 packed pair keys (count table)
    tc: jnp.ndarray,      # [pcap] int32 exact pair counts
    rules: jnp.ndarray,   # [vocab_size, 4] int32 [x,y,z,cnt]
    used: jnp.ndarray,    # scalar int32
    used_ids0: jnp.ndarray,
    limit: jnp.ndarray,   # scalar int32: pause once used >= limit
    vocab_size: int,
    batch_k: int = 16,
    pcap: int = 1 << 16,
    dcap0: int = 1 << 15,
    dcap1: int = 1 << 19,
):
    """Resumable merge rounds, site-local (see module docstring).

    Same driver contract as train_rounds_delta: stops early with
    ``table_overflow`` when live pairs exceed ``pcap`` (the host retries
    with a doubled table)."""
    kb = batch_k
    wide = vocab_size > 65535
    fw0 = freq[jnp.maximum(wid, 0)] * (wid >= 0)

    def cond(state):
        _, _, _, used, done, overflow = state
        return (~done) & (~overflow) & (used < jnp.minimum(vocab_size, limit))

    def body(state):
        (t, fw), (tk, tc), rules, used, _, _ = state
        xs, ys = _unpack_key(tk)
        cc, cx, cy = _topk_candidates(tc, xs, ys, kb, narrow=not wide)
        acc, zs, n_acc = accept_prefix(cc, cx, cy, used, vocab_size, kb)
        done = n_acc == 0

        keys, w, live, d = _pairs_tomb(t, wid, fw, wide)
        t2, hit = _apply_tomb(t, keys, live, d, acc, cx, cy, zs, kb)
        aff = _affected_positions(t, wid, hit)
        cs = jnp.cumsum(aff.astype(jnp.int32))
        n_aff = cs[-1]

        def tier(dcap):
            def run(args):
                t2, fw, keys, w, cs, tk, tc = args
                pos, validj = _gather_affected(cs, dcap)
                posc = jnp.minimum(pos, t2.shape[0] - 1)
                # old side: gather from the pre-apply pair arrays
                ko = tuple(jnp.where(validj, k[posc], PADKEY) for k in keys)
                wo = jnp.where(validj, w[posc], 0)
                # new side: recount the gathered mini-stream (affected
                # words arrive whole and in order, so pair/run semantics
                # are preserved; wid guards the word seams)
                tt = jnp.where(validj, t2[posc], PAD)
                twid = jnp.where(validj, wid[posc], -1)
                tfw = jnp.where(validj, fw[posc], 0)
                kn, wn, _, _ = _pairs_tomb(tt, twid, tfw, wide)
                dkeys = _concat_keys(_concat_keys(tk, ko), kn)
                dvals = jnp.concatenate([tc, -wo, wn])
                return _reduce_by_key(dkeys, dvals, pcap)

            return run

        def recount(args):
            t2, fw, keys, w, cs, tk, tc = args
            kf, wf, _, _ = _pairs_tomb(t2, wid, fw, wide)
            return _reduce_by_key(kf, wf, pcap)

        args = (t2, fw, keys, w, cs, tk, tc)
        tk2, tc2, n_live = lax.cond(
            n_aff <= dcap0,
            tier(dcap0),
            lambda a: lax.cond(n_aff <= dcap1, tier(dcap1), recount, a),
            args,
        )
        table_overflow = n_live > pcap

        rules = store_rules(rules, acc, cx, cy, cc, zs, used_ids0, vocab_size)
        used = used + n_acc
        return (t2, fw), (tk2, tc2), rules, used, done, table_overflow

    (t2, _), (tk2, tc2), rules, used, done, overflow = lax.while_loop(
        cond,
        body,
        (
            (t.astype(jnp.int32), fw0.astype(jnp.int32)),
            (tk, tc),
            rules,
            used.astype(jnp.int32),
            jnp.asarray(False),
            jnp.asarray(False),
        ),
    )
    return t2, tk2, tc2, rules, used, done, overflow


def _host_table_tomb(t: np.ndarray, wid: np.ndarray, freq: np.ndarray):
    """host_count_table over a possibly tombstoned stream (filter the
    live subsequence first; the rank bijection keeps counts exact)."""
    t = np.asarray(t)
    wid = np.asarray(wid)
    live = t >= 0
    return host_count_table(t[live], wid[live], freq)


def run_training_sparse(
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
    checkpoint / resume; snapshots are host-compacted so they stay
    cross-compatible with the v1/v2 drivers)."""
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    if resume_path:
        t, wid, freq, rules, used = load_snapshot(
            resume_path, used_ids0, vocab_size
        )
    else:
        t, wid, freq = flatten_word_buckets(buckets)
        rules = jnp.full((vocab_size, 4), -1, dtype=jnp.int32)
        used = used_ids0

    td = jnp.asarray(t)
    wd = jnp.asarray(wid)
    fd = jnp.asarray(freq)
    u0 = jnp.asarray(used_ids0, jnp.int32)

    m = int(td.shape[0])
    dcap0 = int(os.environ.get("YTTM_TRAIN_DCAP0", "0")) or _next_pow2(
        min(max(1 << 14, m >> 6), 1 << 17)
    )
    dcap1 = int(os.environ.get("YTTM_TRAIN_DCAP1", "0")) or _next_pow2(
        max(dcap0 * 2, m >> 3)
    )
    wide = vocab_size > 65535
    uk, uc = host_count_table(t, wid, freq)
    n_live = uk.size
    # live pair kinds can never exceed the number of stream positions,
    # so the merge-count budget is capped at next_pow2(M) (a huge
    # vocab_size on a small corpus must not inflate the table)
    pcap = int(os.environ.get("YTTM_TRAIN_PCAP", "0")) or min(
        _pcap_budget(n_live, vocab_size - used_ids0), _next_pow2(m)
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
        td, tk, tc, rules, used_d, done, overflow = train_rounds_sparse(
            td, wd, fd, tk, tc, rules,
            jnp.asarray(used, jnp.int32), u0,
            jnp.asarray(limit, jnp.int32), vocab_size,
            batch_k, pcap, dcap0, dcap1,
        )
        used = int(used_d)
        if bool(overflow):
            pcap *= 2
            uk, uc = _host_table_tomb(np.asarray(td), np.asarray(wd), np.asarray(fd))
            while pcap < uk.size:
                pcap *= 2
            tk, tc = _fit_table(uk, uc, pcap, wide)
            continue
        if progress_cb:
            progress_cb(np.asarray(rules), used)
        if progress_every:
            n_merges = used - used_ids0
            dt = time.time() - t_start
            kinds = int((np.asarray(tk[0]) != 0xFFFFFFFF).sum())
            print(
                f"id: {used}/{vocab_size}  merges: {n_merges}  "
                f"({dt:.1f}s, {n_merges / max(dt, 1e-9):.0f} merges/s, "
                f"{kinds} live pair kinds / pcap {pcap})",
                file=sys.stderr,
            )
        if checkpoint_path and checkpoint_every and used < vocab_size:
            save_snapshot(checkpoint_path, td, wd, fd, rules, used, used_ids0)
        if bool(done):
            break

    n = used - used_ids0
    if n < vocab_size - used_ids0:
        print(f"WARNING merged only: {used} pairs of tokens", file=sys.stderr)
    out = np.asarray(rules[:n, :3])
    return [tuple(map(int, r)) for r in out]
