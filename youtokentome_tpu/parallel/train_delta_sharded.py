"""Data-parallel incremental-count (v2/delta) BPE training over a mesh.

The sharded variant of the production single-device trainer
(ops/train_delta.py) and the TPU-native analog of the reference's
sharded pair counts with on-demand global folds (per-thread pair2cnt,
check_cnt bpe.cpp:1099-1108; cross-thread count merges
bpe.cpp:1078-1088):

  * the flat token stream is sharded across the ``data`` axis at word
    boundaries (the reference splits the corpus at whitespace,
    bpe.cpp:864-873) — pairs never cross words, so shards count and
    apply merges independently;
  * the exact pair-count table (uint32 key tuple + int32 counts) is
    REPLICATED and identical on every device: candidate selection and
    the k-deep prefix acceptance run redundantly, bit-identically;
  * per round each shard applies the accepted merges with the v2
    sort-compaction (physical adjacency, no tombstone gathers — on
    real TPU sorts are ~10x cheaper than the equivalent gathers,
    PROFILE.md §3b) and extracts its bounded old/new word-granular
    delta buffers; the shards exchange ONLY those [2*dcap] buffers
    with one ``all_gather`` over ICI and every device folds the
    identical concatenation into its table copy;
  * rounds whose local delta volume overflows ``dcap`` on ANY shard
    (the earliest rounds, where the top pair occurs in most words)
    take a recount branch: each shard reduces its full local count to
    [pcap] and the shards exchange those instead.  The decision is
    made global with ``lax.pmax`` so every device takes the same
    branch and the branch-local all_gather shapes agree; cheap late
    rounds therefore never pay the O(n_dev * pcap) recount exchange.

Integer counts + a fixed gather order make the fold order-independent:
rules are bit-identical to the single-device delta trainer at any
device count (tests/test_sharding.py).
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.train_delta import (
    _affected_positions,
    _concat_keys,
    _delta_contributions,
    _fit_table,
    _full_recount,
    _next_pow2,
    _pcap_budget,
    _reduce_by_key,
    _unpack_key,
    host_count_table,
)
from ..ops.train_stream import (
    _topk_candidates,
    accept_prefix,
    apply_accepted,
    flatten_word_buckets,
    load_snapshot,
    pair_hits,
    save_snapshot,
    store_rules,
)
from .mesh import DATA_AXIS, data_mesh
from .train_sharded import _MeshRef
from .train_sparse_sharded import _shard_stream


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "batch_k", "pcap", "dcap", "mesh_ref"),
)
def _train_delta_sharded(
    t, wid, freq, tk, tc, used, rules, used_ids0, limit,
    vocab_size, batch_k, pcap, dcap, mesh_ref,
):
    mesh = mesh_ref.mesh
    kb = batch_k
    wide = vocab_size > 65535

    def run(t, wid, freq, tk, tc, used, rules, used0, limit):
        fw0 = freq[jnp.maximum(wid, 0)] * (wid >= 0)

        def cond(state):
            _, _, _, used, done, overflow, _ = state
            return (
                (~done) & (~overflow) & (used < jnp.minimum(vocab_size, limit))
            )

        def body(state):
            (t, wid, fw), (tk, tc), rules, used, _, _, nrec = state
            # replicated candidate selection (identical on every device)
            xs, ys = _unpack_key(tk)
            cc, cx, cy = _topk_candidates(tc, xs, ys, kb, narrow=not wide)
            acc, zs, n_acc = accept_prefix(cc, cx, cy, used, vocab_size, kb)
            done = n_acc == 0

            # shard-local delta extraction + sort-compacted apply (the
            # v2 round body, ops/train_delta.py)
            hit, rix = pair_hits(t, wid, acc, cx, cy)
            aff = _affected_positions(t, wid, hit)
            dk_old, dv_old, _, of_old = _delta_contributions(
                t, wid, fw, aff, dcap, np.int32(-1), wide
            )
            t2, w2, fw2, aff2 = apply_accepted(
                t, wid, acc, cx, cy, zs,
                extra=(fw, aff.astype(jnp.int32)), hit=hit, rix=rix,
            )
            dk_new, dv_new, _, of_new = _delta_contributions(
                t2, w2, fw2, aff2 != 0, dcap, np.int32(1), wide
            )

            # the delta-vs-recount decision must be GLOBAL: every shard
            # must take the same branch, both because a recount fold
            # discards the old table and because each branch contains
            # its own (differently shaped) all_gather.
            any_recount = (
                lax.pmax((of_old | of_new).astype(jnp.int32), DATA_AXIS) > 0
            )

            def delta_fold(args):
                tk, tc, dk_old, dv_old, dk_new, dv_new, t2, w2, fw2 = args
                dkeys = _concat_keys(dk_old, dk_new)
                dvals = jnp.concatenate([dv_old, dv_new])
                # exchange ONLY the bounded [2*dcap] buffers; every
                # device folds the identical concatenation
                gk = tuple(
                    lax.all_gather(k, DATA_AXIS, tiled=True) for k in dkeys
                )
                gv = lax.all_gather(dvals, DATA_AXIS, tiled=True)
                return _reduce_by_key(
                    _concat_keys(tk, gk), jnp.concatenate([tc, gv]), pcap
                )

            def recount_fold(args):
                tk, tc, dk_old, dv_old, dk_new, dv_new, t2, w2, fw2 = args
                # full local recount reduced to [pcap]: local kinds are
                # a subset of the global table's kinds, so nothing is
                # truncated; local tables sum to the exact global one.
                lk, lc, _ = _full_recount(t2, w2, fw2, pcap, wide)
                gk = tuple(
                    lax.all_gather(k, DATA_AXIS, tiled=True) for k in lk
                )
                gv = lax.all_gather(lc, DATA_AXIS, tiled=True)
                return _reduce_by_key(gk, gv, pcap)

            tk2, tc2, n_live = lax.cond(
                any_recount,
                recount_fold,
                delta_fold,
                (tk, tc, dk_old, dv_old, dk_new, dv_new, t2, w2, fw2),
            )
            table_overflow = n_live > pcap

            rules = store_rules(rules, acc, cx, cy, cc, zs, used0, vocab_size)
            used = used + n_acc
            nrec = nrec + any_recount.astype(jnp.int32)
            return (
                (t2, w2, fw2), (tk2, tc2), rules, used, done,
                table_overflow, nrec,
            )

        (t2, w2, _), (tk2, tc2), rules, used, done, overflow, nrec = (
            lax.while_loop(
                cond,
                body,
                (
                    (
                        t.astype(jnp.int32),
                        wid.astype(jnp.int32),
                        fw0.astype(jnp.int32),
                    ),
                    (tk, tc),
                    rules,
                    used.astype(jnp.int32),
                    jnp.asarray(False),
                    jnp.asarray(False),
                    jnp.asarray(0, jnp.int32),
                ),
            )
        )
        # per-shard live token count (streams are front-compacted every
        # round) so the host can re-pack all shards to a smaller common
        # padded shape when the global max halves
        n_stream = jnp.sum((t2 >= 0).astype(jnp.int32)).reshape(1)
        return t2, w2, tk2, tc2, rules, used, done, overflow, nrec, n_stream

    shmapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(
            P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(), P(), P(),
            P(DATA_AXIS),
        ),
        check_vma=False,
    )
    return shmapped(t, wid, freq, tk, tc, used, rules, used_ids0, limit)


@functools.partial(jax.jit, static_argnames=("md", "mesh_ref"))
def _repack_sharded(t, wid, md, mesh_ref):
    """Slice every shard's front-compacted stream to [md] on device."""

    def f(t, w):
        return t[:md], w[:md]

    return jax.shard_map(
        f,
        mesh=mesh_ref.mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )(t, wid)


def run_training_delta_sharded(
    buckets,
    used_ids0: int,
    vocab_size: int,
    mesh: Mesh | None = None,
    batch_k: int = 16,
    progress_every: int = 0,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    resume_path: str | None = None,
    progress_cb=None,
) -> List[Tuple[int, int, int]]:
    """Bit-identical to run_training_delta at any device count.

    Same driver contract as the single-device trainers (progress lines,
    portable snapshots via save_snapshot/load_snapshot, resume): this is
    the production multi-device path train.py dispatches to.
    """
    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    if resume_path:
        t, wid, freq, rules, used = load_snapshot(
            resume_path, used_ids0, vocab_size
        )
        rules = np.asarray(rules)
    else:
        t, wid, freq = flatten_word_buckets(buckets)
        rules = np.full((vocab_size, 4), -1, dtype=np.int32)
        used = used_ids0
    seg_t, seg_w, per = _shard_stream(np.asarray(t), np.asarray(wid), n_dev)

    wide = vocab_size > 65535
    uk, uc = host_count_table(np.asarray(t), np.asarray(wid), np.asarray(freq))
    n_live = uk.size
    pcap = int(os.environ.get("YTTM_TRAIN_PCAP", "0")) or min(
        _pcap_budget(n_live, vocab_size - used),
        _next_pow2(int((np.asarray(wid) >= 0).sum()) or 1),
    )
    # dcap sizes the per-round delta exchange only (the recount branch
    # has its own [pcap] buffers), so it tracks the typical per-round
    # site count, NOT pcap
    dcap = int(os.environ.get("YTTM_TRAIN_DCAP", "0")) or _next_pow2(
        min(max(1 << 12, per >> 6), 1 << 17)
    )
    tk, tc = _fit_table(uk, uc, pcap, wide)

    td = jax.device_put(
        jnp.asarray(seg_t.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
    )
    wd = jax.device_put(
        jnp.asarray(seg_w.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
    )
    rep = NamedSharding(mesh, P())
    fd = jax.device_put(jnp.asarray(freq), rep)
    tkd = jax.device_put(tk, rep)
    tcd = jax.device_put(tc, rep)
    rules_d = jax.device_put(jnp.asarray(rules, jnp.int32), rep)
    u0 = jax.device_put(jnp.asarray(used_ids0, jnp.int32), rep)

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
        td, wd, tkd, tcd, rules_d, used_d, done, overflow, nrec, n_stream = (
            _train_delta_sharded(
                td, wd, fd, tkd, tcd,
                jax.device_put(jnp.asarray(used, jnp.int32), rep),
                rules_d, u0,
                jax.device_put(jnp.asarray(limit, jnp.int32), rep),
                vocab_size, batch_k, pcap, dcap, _MeshRef(mesh),
            )
        )
        used = int(used_d)
        if repack and not bool(overflow):
            from ..ops.train_delta import _next_pow2 as _np2

            md = _np2(max(int(np.asarray(n_stream).max()), repack_min))
            if md < per:
                td, wd = _repack_sharded(td, wd, md, _MeshRef(mesh))
                per = md
        if bool(overflow):
            # rare: live pair kinds exceeded pcap; rebuild the table
            # from the current compacted stream with doubled capacity
            # and continue from `used` (progress is kept)
            pcap *= 2
            tn = np.asarray(td)
            wn = np.asarray(wd)
            live = tn >= 0
            uk, uc = host_count_table(tn[live], wn[live], np.asarray(fd))
            while pcap < uk.size:
                pcap *= 2
            tk, tc = _fit_table(uk, uc, pcap, wide)
            tkd = jax.device_put(tk, rep)
            tcd = jax.device_put(tc, rep)
            continue
        if progress_cb:
            progress_cb(np.asarray(rules), used)
        if progress_every:
            n_merges = used - used_ids0
            dt = time.time() - t_start
            print(
                f"id: {used}/{vocab_size}  merges: {n_merges}  "
                f"({dt:.1f}s, {n_merges / max(dt, 1e-9):.0f} merges/s; "
                f"{int(nrec)} recount rounds this segment, exchange "
                f"{n_dev}x{2 * dcap} delta / {n_dev}x{pcap} recount keys)",
                file=sys.stderr,
            )
        if checkpoint_path and checkpoint_every and used < vocab_size:
            save_snapshot(
                checkpoint_path, np.asarray(td), np.asarray(wd),
                np.asarray(fd), np.asarray(rules_d), used, used_ids0,
            )
        if bool(done):
            break

    n = used - used_ids0
    if n < vocab_size - used_ids0:
        print(
            f"WARNING merged only: {used} pairs of tokens",
            file=sys.stderr,
        )
    out = np.asarray(rules_d[:n])[:, :3]
    return [tuple(map(int, r)) for r in out]
