"""Incremental-count BPE trainer: the v2 device training kernel.

The v1 trainer (ops/train_stream.py) recounts every adjacent pair each
round — an O(M log M) multi-operand sort over the whole token stream per
round, the per-round hot spot.  The reference is O(N) total because it
maintains pair counts *incrementally*: occurrence lists + count deltas
at merge sites (pair2pos/pair2cnt, bpe.cpp:436-478) behind a lazily
revalidated two-tier queue (bpe.cpp:149-314).

This kernel is the tensor-native equivalent:

  * an exact **pair-count table** lives on device: uint32 key tuples
    (packed x<<16|y below vocab 65536, two components above — see the
    key-layout note below) + int32 counts, capacity PCAP — the analog
    of pair2cnt, always exact (no lazy revalidation needed because
    updates are applied synchronously each round);
  * per round, the tie-ordered top-k candidates come from a sort over
    the *table* (|table| ~ unique pairs, 16-64x smaller than the
    stream);
  * merges are applied to the stream exactly as in v1 (the accepted
    prefix of pairwise non-intersecting candidates, vectorized);
  * count maintenance is **word-granular delta recounting**: only words
    containing a merge site are recounted (before and after the apply);
    the +/- contributions are compacted into a bounded delta buffer and
    folded into the table with one sort over PCAP + 2*DCAP.  Words are
    the natural delta unit because pairs never cross word boundaries
    and the run-parity count rule (floor(run/2), bpe.cpp:140-143) is
    confined to a word;
  * rounds whose delta volume overflows the buffer (the earliest
    rounds, where the top pair occurs in most words) fall back to a
    full recount — the same amortization shape as the reference's
    queue rebuilds.

Semantics are identical to v1 (same candidate order, same k-deep
acceptance, same apply); only the count bookkeeping differs, and the
table is exact by construction at every round boundary.
"""

from __future__ import annotations

import functools
import sys
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .train_stream import (
    BIG,
    PAD,
    _topk_candidates,
    accept_prefix,
    apply_accepted,
    flatten_word_buckets,
    load_snapshot,
    pair_hits,
    pair_keys_and_weights_fw,
    save_snapshot,
    sort_compact,
    store_rules,
)

# numpy (host) scalar, NOT jnp -- see the BIG note in train_stream.py
PADKEY = np.uint32(0xFFFFFFFF)

# Pair keys are tuples of uint32 arrays so the same kernels serve every
# vocab size:
#   narrow (vocab < 65536, the common case): one packed component
#     x<<16 | y — 2-operand 1-key sorts in the hot loop;
#   wide (vocab >= 65536; the reference has no vocab limit): two
#     components (x, y) — 3-operand 2-key lexicographic sorts.
# Every component of an invalid/padding key is PADKEY (all-ones), which
# sorts last in both layouts and can never equal a real component
# (token ids are < 2**31).


def _pack_keys(kx: jnp.ndarray, ky: jnp.ndarray, wide: bool) -> Tuple[jnp.ndarray, ...]:
    """(x, y) int32 -> key tuple; invalid (BIG) -> all-PADKEY."""
    bad = kx == BIG
    if wide:
        return (
            jnp.where(bad, PADKEY, kx.astype(jnp.uint32)),
            jnp.where(bad, PADKEY, ky.astype(jnp.uint32)),
        )
    key = (kx.astype(jnp.uint32) << 16) | (ky.astype(jnp.uint32) & 0xFFFF)
    return (jnp.where(bad, PADKEY, key),)


def _unpack_key(keys: Tuple[jnp.ndarray, ...]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if len(keys) == 2:
        invalid = keys[0] == PADKEY
        kx = jnp.where(invalid, BIG, keys[0].astype(jnp.int32))
        ky = jnp.where(invalid, BIG, keys[1].astype(jnp.int32))
        return kx, ky
    key = keys[0]
    invalid = key == PADKEY
    kx = jnp.where(invalid, BIG, (key >> 16).astype(jnp.int32))
    ky = jnp.where(invalid, BIG, (key & 0xFFFF).astype(jnp.int32))
    return kx, ky


def _compact_kv(keep: jnp.ndarray, keys: Tuple[jnp.ndarray, ...],
                vals: jnp.ndarray, cap: int):
    """Front-pack (key, val) entries where ``keep`` into a [cap] buffer
    (PADKEY / 0 fill) via one multi-operand sort (scatter-free: TPU
    scatters serialize, sorts don't).  Returns (keys [cap], vals [cap],
    n_keep)."""
    outs, n_keep = sort_compact(
        keep,
        tuple(jnp.where(keep, k, PADKEY) for k in keys)
        + (jnp.where(keep, vals, 0),),
        (PADKEY,) * len(keys) + (0,),
    )
    ko, vo = outs[:-1], outs[-1]
    n = vo.shape[0]
    if n < cap:
        ko = tuple(
            jnp.concatenate([k, jnp.full((cap - n,), PADKEY, k.dtype)])
            for k in ko
        )
        vo = jnp.concatenate([vo, jnp.zeros((cap - n,), vo.dtype)])
    return tuple(k[:cap] for k in ko), vo[:cap], n_keep


def _reduce_by_key(keys: Tuple[jnp.ndarray, ...], vals: jnp.ndarray, cap: int):
    """Sort (keys..., val), sum vals per key, keep positive non-pad
    totals, compact to [cap].  Gather-free: TPU profiling (PROFILE.md
    §3b) showed the former segment-base *gathers* (cs[ws] - vs[ws])
    cost ~2.3 ms/round at n=160k — more than the sort itself — so the
    mixed-sign values are split into positive/negative parts whose
    cumsums are each monotone, letting the segment base fill forward
    with a cummax of end marks (scans are ~100x cheaper than gathers
    on TPU).  The worst-case cumsum magnitude (all positive entries:
    table counts + new-side deltas) is unchanged from the mixed-sign
    version, so the flatten_word_buckets mass guard still applies."""
    sorted_ = lax.sort(keys + (vals,), num_keys=len(keys))
    ks, vs = sorted_[:-1], sorted_[-1]
    diff = ks[0][1:] != ks[0][:-1]
    for k in ks[1:]:
        diff = diff | (k[1:] != k[:-1])
    first = jnp.concatenate([jnp.ones((1,), bool), diff])
    vp = jnp.maximum(vs, 0)
    vn = vp - vs  # = max(-vs, 0)
    csp = jnp.cumsum(vp)
    csn = jnp.cumsum(vn)
    # segment base = exclusive cumsum at the segment's first slot,
    # filled forward (both exclusive cumsums are >= 0 and nondecreasing,
    # so cummax of first-marks propagates exactly)
    basep = lax.cummax(jnp.where(first, csp - vp, 0))
    basen = lax.cummax(jnp.where(first, csn - vn, 0))
    total = (csp - basep) - (csn - basen)
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    keep = is_end & (ks[0] != PADKEY) & (total > 0)
    return _compact_kv(keep, ks, total, cap)


def _concat_keys(a: Tuple[jnp.ndarray, ...], b: Tuple[jnp.ndarray, ...]):
    return tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))


def _full_recount(t, wid, fw, pcap, wide: bool):
    """Count every pair from scratch; table compacted to [pcap]."""
    kx, ky, w = pair_keys_and_weights_fw(t, wid, fw)
    keys = _pack_keys(jnp.where(w > 0, kx, BIG), ky, wide)
    vals = jnp.where(w > 0, w, 0)
    return _reduce_by_key(keys, vals, pcap)


def _affected_positions(t, wid, hit):
    """Per-position flag: does MY word contain any accepted-pair hit?

    Scan-only (no segment reductions): word-start/word-end indices come
    from cummax over position indices; a word is affected iff the last
    hit at-or-after its start is inside it (forward scan) or the next
    hit at-or-before its end is (backward scan)."""
    m = t.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), wid[1:] != wid[:-1]]
    )
    ws = lax.cummax(jnp.where(seg_start, idx, 0))
    last_hit = lax.cummax(jnp.where(hit, idx, -1))
    before = last_hit >= ws
    # backward: index of next hit at-or-after each position
    ridx = m - 1 - idx
    next_hit_r = lax.cummax(jnp.where(hit, ridx, -1)[::-1])[::-1]
    next_hit = m - 1 - next_hit_r  # m when none
    seg_end_flag = jnp.concatenate([seg_start[1:], jnp.ones((1,), bool)])
    we_r = lax.cummax(jnp.where(seg_end_flag, ridx, 0)[::-1])[::-1]
    we = m - 1 - we_r
    after = (next_hit <= we) & (next_hit < m)
    return before | after


def _delta_contributions(t, wid, fw, aff_pos, dcap, sign, wide):
    """Pair contributions of affected words, compacted to [dcap] with
    ``sign`` applied.  Returns (keys, weights, n, overflow)."""
    kx, ky, w = pair_keys_and_weights_fw(t, wid, fw)
    mask = aff_pos & (w > 0)
    keys = _pack_keys(kx, ky, wide)
    vals = sign * w
    dk, dv, n = _compact_kv(mask, keys, vals, dcap)
    return dk, dv, n, n > dcap


@functools.partial(
    jax.jit, static_argnames=("vocab_size", "batch_k", "pcap", "dcap")
)
def train_rounds_delta(
    t: jnp.ndarray,       # [M] int32 tokens, PAD-padded
    wid: jnp.ndarray,     # [M] int32 word ids, PAD-padded
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
    dcap: int = 1 << 15,
):
    """Resumable merge rounds with an incrementally maintained count
    table (see module docstring).  Stops early with ``table_overflow``
    if live pairs ever exceed ``pcap`` (host retries with 2x pcap).

    The round body is scan/sort-only (no scatters, no segment
    reductions): per-position word frequencies ``fw`` and the affected
    flag are carried *through* the apply compaction, so the new-side
    delta needs no word-level lookup."""
    kb = batch_k
    wide = vocab_size > 65535
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

        hit, rix = pair_hits(t, wid, acc, cx, cy)
        aff = _affected_positions(t, wid, hit)
        dk_old, dv_old, n_old, of_old = _delta_contributions(
            t, wid, fw, aff, dcap, np.int32(-1), wide
        )
        t2, w2, fw2, aff2 = apply_accepted(
            t, wid, acc, cx, cy, zs,
            extra=(fw, aff.astype(jnp.int32)), hit=hit, rix=rix,
        )
        dk_new, dv_new, n_new, of_new = _delta_contributions(
            t2, w2, fw2, aff2 != 0, dcap, np.int32(1), wide
        )

        def delta_path(args):
            tk, tc, dk_old, dv_old, dk_new, dv_new, t2, w2, fw2 = args
            keys = _concat_keys(_concat_keys(tk, dk_old), dk_new)
            vals = jnp.concatenate([tc, dv_old, dv_new])
            return _reduce_by_key(keys, vals, pcap)

        def recount_path(args):
            _, _, _, _, _, _, t2, w2, fw2 = args
            return _full_recount(t2, w2, fw2, pcap, wide)

        tk2, tc2, n_live = lax.cond(
            of_old | of_new,
            recount_path,
            delta_path,
            (tk, tc, dk_old, dv_old, dk_new, dv_new, t2, w2, fw2),
        )
        table_overflow = n_live > pcap

        rules = store_rules(rules, acc, cx, cy, cc, zs, used_ids0, vocab_size)
        used = used + n_acc
        return (t2, w2, fw2), (tk2, tc2), rules, used, done, table_overflow

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
    # live stream tokens (the stream is front-compacted every round, so
    # the host can re-pack to a smaller padded shape when this halves)
    n_stream = jnp.sum((t2 >= 0).astype(jnp.int32))
    return t2, w2, tk2, tc2, rules, used, done, overflow, n_stream


def host_count_table(t: np.ndarray, wid: np.ndarray, freq: np.ndarray):
    """Exact initial pair-count table on the host (numpy mirror of
    pair_keys_and_weights + reduce-by-key).  A device init program would
    cost ~1-2 min of remote compilation on the axon toolchain for 10 ms
    of work; numpy does it instantly."""
    t = np.asarray(t, np.int64)
    wid = np.asarray(wid, np.int64)
    freq = np.asarray(freq, np.int64)
    m = t.size
    idx = np.arange(m, dtype=np.int64)
    nxt_t = np.concatenate([t[1:], [PAD]])
    nxt_w = np.concatenate([wid[1:], [PAD]])
    valid = (wid >= 0) & (wid == nxt_w)
    eq = valid & (t == nxt_t)
    last_noneq = np.maximum.accumulate(np.where(eq, -1, idx))
    offset = idx - last_noneq - 1
    counted = valid & (~eq | (offset % 2 == 0))
    w = np.where(counted, freq[np.maximum(wid, 0)], 0)
    sel = w > 0
    # uint64 (x<<32 | y) host keys hold any vocab; _fit_table lays them
    # out for the device (packed uint32 below 65536, two-component above)
    keys = (t[sel].astype(np.uint64) << 32) | nxt_t[sel].astype(np.uint64)
    uk, inv = np.unique(keys, return_inverse=True)
    cnts = np.bincount(inv, weights=w[sel].astype(np.float64)).astype(np.int64)
    return uk, cnts.astype(np.int32)


def _next_pow2(x: int) -> int:
    return 1 << max(4, int(np.ceil(np.log2(max(int(x), 1)))))


def _pcap_budget(n_live0: int, merges: int) -> int:
    """Size the pair-count table ONCE so the overflow->recompile
    fallback is rarely taken (a retry recompiles at 2x pcap — a
    per-shape cache miss, cached after).

    Existing pair kinds only shrink (a merge (x,y)->z removes (l,x),
    (x,y), (y,r) occurrences); growth comes from the new kinds (l,z)
    and (z,r).  Measured on Zipf text (PROFILE.md §3, 2 MB / vocab
    5000): ~23 net new kinds per merge over the first ~1k merges,
    ~6.5/merge over 1k-2k, under 1/merge beyond, plateau ~46.2k live
    kinds vs 13k initial.  Budget 36/12/4 per merge across those
    segments — >=1.5x the measured growth at every point.  Every
    pow-of-2 of table size costs ~15% round throughput (the top-k and
    fold sorts scan the whole table), so the budget is deliberately
    snug now that overflow no longer recompiles from scratch each run
    (the persistent compilation cache holds the doubled-shape program
    after its first miss)."""
    m = max(merges, 0)
    grow = 36 * min(m, 1000) + 12 * min(max(m - 1000, 0), 1000) + 4 * max(
        m - 2000, 0
    )
    return _next_pow2(max(2 * n_live0, n_live0 + grow, 1 << 14))


def _fit_table(tk, tc, pcap: int, wide: bool = False):
    """Lay the host (uint64-keyed) table out for the device at exactly
    [pcap]: a 1-component packed-uint32 key tuple when narrow, a
    2-component (x, y) tuple when wide.  Host-side, one-time."""
    kh = np.asarray(tk, np.uint64)
    ch = np.asarray(tc)
    assert kh.shape[0] <= pcap, (
        "count table does not fit pcap; live pairs would be dropped"
    )
    n = kh.shape[0]
    co = np.zeros(pcap, np.int32)
    co[:n] = ch[:n]
    xs = (kh >> np.uint64(32)).astype(np.uint32)
    ys = (kh & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    if wide:
        kox = np.full(pcap, 0xFFFFFFFF, np.uint32)
        koy = np.full(pcap, 0xFFFFFFFF, np.uint32)
        kox[:n] = xs
        koy[:n] = ys
        return (jnp.asarray(kox), jnp.asarray(koy)), jnp.asarray(co)
    assert n == 0 or int(xs.max()) < 65536, (
        "narrow table layout requires token ids < 65536"
    )
    ko = np.full(pcap, 0xFFFFFFFF, np.uint32)
    ko[:n] = (xs.astype(np.uint32) << 16) | ys.astype(np.uint32)
    return (jnp.asarray(ko),), jnp.asarray(co)


def run_training_delta(
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
    """Host driver: mirrors run_training_stream (same progress /
    checkpoint / resume contract; checkpoints are cross-compatible —
    the count table is rebuilt from the stream on resume).

    Compile discipline: on the axon toolchain each distinct program
    shape costs ~1-2 min of remote compilation and the persistent cache
    does not apply, so this driver compiles exactly ONE device program
    per training run: the initial count table is built on the host
    (numpy), pcap is sized so table overflow is rare (overflow doubles
    pcap — one extra compile), and the stream is never re-packed.
    """
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

    import os

    m = int(td.shape[0])
    wide = vocab_size > 65535
    dcap = int(
        os.environ.get("YTTM_TRAIN_DCAP", "0")
    ) or _next_pow2(max(1 << 14, m >> 4))
    uk, uc = host_count_table(t, wid, freq)
    n_live = uk.size
    # pair kinds never exceed stream positions: cap the budget at
    # next_pow2(M) so huge vocab targets on small corpora stay cheap
    pcap = int(
        os.environ.get("YTTM_TRAIN_PCAP", "0")
    ) or min(_pcap_budget(n_live, vocab_size - used_ids0), _next_pow2(m))
    tk, tc = _fit_table(uk, uc, pcap, wide)

    # segments are capped so the host sees the live stream count often
    # enough to re-pack: per-round cost scales with the padded M, and
    # merging shrinks the live stream 2-4x over a training run, so
    # halving the padded shape when occupancy drops below half keeps
    # rounds proportional to the LIVE stream (each new pow-2 shape is
    # one extra compile, persistent-cached across runs; re-packing is a
    # device-side slice of the front-compacted stream — no transfers).
    repack = os.environ.get("YTTM_TRAIN_REPACK", "1") != "0"
    repack_min = int(os.environ.get("YTTM_TRAIN_REPACK_MIN", str(1 << 14)))
    seg = min(
        x
        for x in (
            progress_every,
            checkpoint_every,
            1024 if repack else 0,
            1000 if progress_cb else 0,
            vocab_size,
        )
        if x
    )
    t_start = time.time()
    while used < vocab_size:
        limit = min(vocab_size, used + seg)
        td, wd, tk, tc, rules, used_d, done, overflow, n_stream = (
            train_rounds_delta(
                td, wd, fd, tk, tc, rules,
                jnp.asarray(used, jnp.int32), u0,
                jnp.asarray(limit, jnp.int32), vocab_size, batch_k, pcap,
                dcap,
            )
        )
        used = int(used_d)
        if repack and not bool(overflow):
            md = _next_pow2(max(int(n_stream), repack_min))
            if md < int(td.shape[0]):
                td = td[:md]
                wd = wd[:md]
        if bool(overflow):
            pcap *= 2
            uk, uc = host_count_table(
                np.asarray(td), np.asarray(wd), np.asarray(fd)
            )
            # the rebuilt table must fit in full: _fit_table slices to
            # pcap, which would silently drop live pairs if a round's
            # reduce kept more than the doubled capacity
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
            save_snapshot(checkpoint_path, td, wd, fd, rules, used, used_ids0)
        if bool(done):
            break

    n = used - used_ids0
    if n < vocab_size - used_ids0:
        print(f"WARNING merged only: {used} pairs of tokens", file=sys.stderr)
    out = np.asarray(rules[:n, :3])
    return [tuple(map(int, r)) for r in out]
