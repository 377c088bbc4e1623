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
          tie-ordered top-k (one more sort)  ->  candidate batch
          exact k-deep prefix acceptance     ->  up to k merges/round
          vectorized apply + compaction

One lax.while_loop on device; the host only pauses it (via a dynamic
round limit) for progress lines and checkpoints.
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

from .train_kernel import _argmax_tiebreak

# numpy (host) scalar, NOT jnp: a module-level jnp scalar lives on the
# device and its value is fetched D2H when lowering embeds it as an XLA
# constant -- minutes per fetch on remote-tunnel toolchains (PROFILE.md).
BIG = np.int32(0x7FFFFFFF)
PAD = -1


def sort_compact(keep, arrays, fills):
    """Order-preserving front-pack of each array's kept entries via ONE
    multi-operand sort on the keep-position key.

    TPU note: XLA lowers masked scatters to serialized HBM updates
    (milliseconds per M-sized scatter), while lax.sort is a fast fused
    bitonic network — sort-based compaction is ~3x faster and is the
    only compaction primitive used in the training hot loop."""
    n = keep.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(keep, idx, BIG)
    out = lax.sort((key,) + tuple(arrays), num_keys=1)[1:]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    live = idx < n_keep
    return (
        tuple(
            jnp.where(live, a, jnp.asarray(f, a.dtype)) for a, f in zip(out, fills)
        ),
        n_keep,
    )


def _segment_counts_flat(kx, ky, wf, pack16: bool = False):
    """Sorted reduce-by-key; totals at segment ends, zeros elsewhere.

    With ``pack16`` (valid while all ids < 2**16, i.e. vocab < 65536)
    the pair key packs into one uint32, turning the 3-array 2-key sort
    into a 2-array 1-key sort — the per-round hot spot.
    """
    if pack16:
        key = (kx.astype(jnp.uint32) << 16) | (ky.astype(jnp.uint32) & 0xFFFF)
        key = jnp.where(kx == BIG, np.uint32(0xFFFFFFFF), key)
        key_s, w_s = lax.sort((key, wf), num_keys=1)
        first = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
        invalid_s = key_s == np.uint32(0xFFFFFFFF)
        kx_s = jnp.where(invalid_s, BIG, (key_s >> 16).astype(jnp.int32))
        ky_s = jnp.where(invalid_s, BIG, (key_s & 0xFFFF).astype(jnp.int32))
    else:
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


def pair_keys_and_weights(t, wid, freq):
    """Adjacent pair keys with the run-parity count mask applied to the
    frequency weights (invalid slots keyed BIG with weight 0)."""
    return pair_keys_and_weights_fw(t, wid, freq[jnp.maximum(wid, 0)])


def pair_keys_and_weights_fw(t, wid, fw):
    """Variant taking the per-position word frequency ``fw`` directly
    (carried through compactions so the hot loop never gathers)."""
    m = t.shape[0]
    idx = jnp.arange(m)
    nxt_t = jnp.concatenate([t[1:], jnp.full((1,), PAD, t.dtype)])
    nxt_w = jnp.concatenate([wid[1:], jnp.full((1,), PAD, wid.dtype)])
    valid = (wid >= 0) & (wid == nxt_w)
    eq = valid & (t == nxt_t)
    last_noneq = lax.cummax(jnp.where(eq, -1, idx))
    offset = idx - last_noneq - 1
    counted = valid & (~eq | (offset % 2 == 0))
    w = jnp.where(counted, fw, 0).astype(jnp.int32)
    kx = jnp.where(valid, t, BIG)
    ky = jnp.where(valid, nxt_t, BIG)
    return kx, ky, w


def accept_prefix(cc, cx, cy, used, vocab_size, kb, min_count=None):
    """Longest prefix of tie-ordered candidates with no intersection
    against an earlier accepted candidate (stop, don't skip).

    Because acceptance is a *prefix*, the accepted set before candidate
    j is exactly {0..j-1} (when j is still in the prefix), so the
    sequential scan vectorizes: fail(j) = zero count, intersection with
    ANY earlier candidate, or id budget exhausted; accept everything
    before the first failure.  O(k^2) data-parallel ops instead of k
    sequential steps (which serialize the while-loop round body).

    ``min_count`` (dynamic, default 0) raises the count floor: the v5
    hot tier only guarantees global order for counts strictly above its
    threshold (ops/train_tiered.py).

    Equal-pair guard: merging (x,x)->z CREATES pairs the round never
    saw — (z,x) from odd-length runs and (z,z) from runs >= 4 — with
    counts up to count(x,x), and their bounding witness is the accepted
    rule itself, so the intersection rule cannot stop the prefix for
    them.  A created pair can only TIE a candidate of equal count (and
    loses the tie: z is the largest id, and the tie-break prefers the
    smaller max), so acceptance additionally stops at the first
    candidate whose count is strictly below the LARGEST earlier
    accepted equal-pair candidate's count.  (x != y rules need no
    guard: every pair they create is count-bounded by a pair that
    intersects the rule, which the prefix scan would have hit first.)"""
    remaining = vocab_size - used
    floor = 0 if min_count is None else min_count
    j = jnp.arange(kb)
    earlier = j[None, :] < j[:, None]  # [j, i]: i earlier than j
    inter = earlier & (
        (cy[None, :] == cx[:, None]) | (cx[None, :] == cy[:, None])
    )
    eqpair_count = jnp.where(cx == cy, cc, -1)
    prev_eq_max = jnp.concatenate(
        [jnp.full((1,), -1, cc.dtype), lax.cummax(eqpair_count)[:-1]]
    )
    fail = (
        (cc <= floor)
        | jnp.any(inter, axis=1)
        | (j >= remaining)
        | (cc < prev_eq_max)
    )
    # first failing index (kb if none)
    first_fail = jnp.min(jnp.where(fail, j, kb))
    acc = j < first_fail
    n_acc = jnp.sum(acc.astype(jnp.int32))
    zs = used + jnp.cumsum(acc.astype(jnp.int32)) - 1
    return acc, zs, n_acc


def pair_hits(t, wid, acc, cx, cy):
    """Per-position flag: (t[i], t[i+1]) is an occurrence of an accepted
    candidate (within a word).  Returns (hit, rix) with rix the candidate
    index of the hit."""
    nxt_t = jnp.concatenate([t[1:], jnp.full((1,), PAD, t.dtype)])
    nxt_w = jnp.concatenate([wid[1:], jnp.full((1,), PAD, wid.dtype)])
    valid = (wid >= 0) & (wid == nxt_w)
    hitk = (
        valid[:, None]
        & acc[None, :]
        & (t[:, None] == cx[None, :])
        & (nxt_t[:, None] == cy[None, :])
    )
    return jnp.any(hitk, axis=1), jnp.argmax(hitk, axis=1)


def apply_accepted(t, wid, acc, cx, cy, zs, extra=(), hit=None, rix=None):
    """Merge every accepted rule's occurrences in one vectorized pass
    (accepted rules are non-intersecting, so positions are disjoint).
    ``extra`` arrays (per-position) are carried through the compaction;
    precomputed (hit, rix) from pair_hits may be passed to share work."""
    m = t.shape[0]
    idx = jnp.arange(m)
    if hit is None:
        hit, rix = pair_hits(t, wid, acc, cx, cy)
    ln = lax.cummax(jnp.where(hit, -1, idx))
    sel = hit & ((idx - ln - 1) % 2 == 0)
    new_t = jnp.where(sel, zs[rix], t)
    kill = jnp.concatenate([jnp.zeros((1,), bool), sel[:-1]])
    keep = ~kill & (new_t != PAD)
    outs, _ = sort_compact(
        keep, (new_t, wid) + tuple(extra), (PAD, PAD) + (0,) * len(extra)
    )
    return outs


def store_rules(rules, acc, cx, cy, cc, zs, used_ids0, vocab_size):
    """Record accepted merges as [x, y, z, count] rows.  The count column
    feeds the reference-parity progress line (freq, bpe.cpp:1210) and is
    dropped from the final rule list."""
    slot = jnp.where(acc, zs - used_ids0, vocab_size)
    return rules.at[slot].set(
        jnp.stack([cx, cy, zs, cc], axis=1).astype(jnp.int32), mode="drop"
    )


def _topk_candidates(cnt, xs, ys, k, narrow: bool = False):
    """Top-k candidates in the reference tie-break order via one sort:
    ascending (-count, max, min, -x).

    With ``narrow`` (all ids < 65536) the (max, min) tie-break packs
    into one uint32 key and (x, y) into one payload, turning the
    7-operand 4-key sort into a 5-operand 3-key one — ~20% off the
    per-round candidate-selection cost, bit-identical order (PROFILE.md
    §3: this sort is one of the two per-round hot spots)."""
    key1 = jnp.where(cnt > 0, -cnt, BIG)
    if narrow:
        mx = jnp.maximum(xs, ys).astype(jnp.uint32)
        mn = jnp.minimum(xs, ys).astype(jnp.uint32)
        key2 = (mx << 16) | mn  # (max asc, min asc) lexicographic
        key3 = jnp.where(cnt > 0, -xs, BIG)  # larger left token wins
        xy = (xs.astype(jnp.uint32) << 16) | (ys.astype(jnp.uint32) & 0xFFFF)
        _, _, _, xy_s, cc = lax.sort(
            (key1, key2, key3, xy, cnt), num_keys=3
        )
        cx = (xy_s >> 16).astype(jnp.int32)[:k]
        cy = (xy_s & 0xFFFF).astype(jnp.int32)[:k]
        return cc[:k], cx, cy
    mx = jnp.maximum(xs, ys)
    mn = jnp.minimum(xs, ys)
    key2 = jnp.where(cnt > 0, mx, BIG)
    key3 = jnp.where(cnt > 0, mn, BIG)
    key4 = jnp.where(cnt > 0, -xs, BIG)
    _, _, _, _, cx, cy, cc = lax.sort(
        (key1, key2, key3, key4, xs, ys, cnt), num_keys=4
    )
    return cc[:k], cx[:k], cy[:k]


@functools.partial(jax.jit, static_argnames=("vocab_size", "batch_k"))
def train_rounds_resumable(
    t: jnp.ndarray,      # [M] int32 tokens, PAD-padded
    wid: jnp.ndarray,    # [M] int32 word ids, PAD-padded
    freq: jnp.ndarray,   # [WCAP] int32 word frequencies
    rules: jnp.ndarray,  # [vocab_size, 4] int32 [x,y,z,cnt] rules so far (-1 padded)
    used: jnp.ndarray,   # scalar int32: ids used so far
    used_ids0: jnp.ndarray,
    limit: jnp.ndarray,  # scalar int32: pause once used >= limit
    vocab_size: int,
    batch_k: int = 16,
):
    """Merge rounds with exact k-deep batching (resumable).

    ``limit`` pauses the device loop so the host can emit progress and
    checkpoints between segments without recompiling (it is a dynamic
    scalar; the compiled program is the same for every segment).

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
    kb = batch_k

    def cond(state):
        _, _, used, done = state
        return (~done) & (used < jnp.minimum(vocab_size, limit))

    def body(state):
        (t, wid), rules, used, _ = state[0], state[1], state[2], state[3]
        kx, ky, w = pair_keys_and_weights(t, wid, freq)
        cnt, xs, ys = _segment_counts_flat(kx, ky, w, pack16=vocab_size < 65536)
        cc, cx, cy = _topk_candidates(cnt, xs, ys, kb, narrow=vocab_size < 65536)
        acc, zs, n_acc = accept_prefix(cc, cx, cy, used, vocab_size, kb)
        done = n_acc == 0
        t2, w2 = apply_accepted(t, wid, acc, cx, cy, zs)
        rules = store_rules(rules, acc, cx, cy, cc, zs, used_ids0, vocab_size)
        used = used + n_acc
        return (t2, w2), rules, used, done

    (t2, w2), rules, used, done = lax.while_loop(
        cond,
        body,
        (
            (t.astype(jnp.int32), wid.astype(jnp.int32)),
            rules,
            used.astype(jnp.int32),
            jnp.asarray(False),
        ),
    )
    return t2, w2, rules, used, done


def flatten_word_buckets(buckets) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[(tokens [W, L], freq [W])...] -> (t [M], wid [M], freq [WCAP]).

    M is padded to a power of two to bound compiled-shape count.
    """
    ts = []
    ws = []
    fs = []
    wbase = 0
    # device count reductions accumulate in int32 (no x64 on TPU):
    # the total weighted pair mass must stay below 2^31.  2 GiB-class
    # corpora fit; beyond that the host must shard the corpus first.
    mass = sum(
        int((cnt.astype(np.int64) * np.maximum((mat >= 0).sum(1) - 1, 0)).sum())
        for mat, cnt in buckets
    )
    if mass >= 2**31:
        raise ValueError(
            f"corpus too large for a single device pass: weighted pair "
            f"mass {mass} exceeds int32 range; shard the corpus across "
            f"hosts/devices"
        )
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


def save_snapshot(path, t, wid, freq, rules, used: int, used_ids0: int):
    """Portable mid-training snapshot, shared by all trainer drivers.

    The stream is host-compacted (v3 tombstone streams carry interior
    PAD slots that the v1/v2 pair kernels would misread as real token
    -1), and only the *filled* rule rows are stored, so a snapshot can
    be resumed under any driver and any target ``vocab_size`` >= used.
    """
    t = np.asarray(t)
    wid = np.asarray(wid)
    live = t >= 0
    np.savez(
        path,
        t=t[live],
        wid=wid[live],
        freq=np.asarray(freq),
        rules=np.asarray(rules)[: used - used_ids0],
        used=used,
        used_ids0=used_ids0,
        version=1,
    )


def load_snapshot(path, used_ids0: int, vocab_size: int):
    """Load a save_snapshot file: re-pad the stream to a power of two
    and the rules to the resuming run's [vocab_size, 4]."""
    snap = np.load(path)
    if int(snap["used_ids0"]) != used_ids0:
        raise ValueError(
            f"snapshot was trained with {int(snap['used_ids0'])} base ids, "
            f"this corpus/config produces {used_ids0}"
        )
    used = int(snap["used"])
    if used > vocab_size:
        raise ValueError(
            f"snapshot already contains {used} ids > vocab_size={vocab_size}"
        )
    t, wid, freq = snap["t"], snap["wid"], snap["freq"]
    m = max(16, 1 << int(np.ceil(np.log2(max(t.size, 1)))))
    tp = np.full(m, PAD, np.int32)
    wp = np.full(m, PAD, np.int32)
    tp[: t.size] = t
    wp[: wid.size] = wid
    rules_h = np.full((vocab_size, 4), -1, np.int32)
    stored = np.asarray(snap["rules"], np.int32)
    rules_h[: stored.shape[0], : stored.shape[1]] = stored[: used - used_ids0]
    return tp, wp, freq, jnp.asarray(rules_h), used


def run_training_stream(
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
    """Host driver for the device training fixed point.

    * ``progress_every`` > 0 pauses the device loop every N new ids and
      prints a progress line (the reference logs every 1000 merges,
      bpe.cpp:1198-1219);
    * ``checkpoint_path``/``checkpoint_every`` save a resumable snapshot
      (token stream + rules) every N ids — the reference has no
      mid-training checkpoints, but 100GB-scale corpora want them;
    * ``resume_path`` continues from such a snapshot.

    Pausing uses a dynamic round limit: every segment reuses the same
    compiled program.
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
        td, wd, rules, used_d, done = train_rounds_resumable(
            td, wd, fd, rules, jnp.asarray(used, jnp.int32), u0,
            jnp.asarray(limit, jnp.int32), vocab_size, batch_k,
        )
        used = int(used_d)
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
