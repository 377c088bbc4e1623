"""Data-parallel site-local (v3) BPE training over a device mesh.

The sharded variant of the production trainer (ops/train_sparse.py) and
the TPU-native analog of the reference's sharded pair counts with
on-demand global folds (per-thread pair2cnt, check_cnt
bpe.cpp:1099-1108; cross-thread count merges bpe.cpp:1078-1088):

  * the tombstoned token stream is sharded across the ``data`` axis at
    word boundaries (the reference splits the corpus at whitespace,
    bpe.cpp:864-873) — pairs never cross words, so shards are
    independent for counting and merge application;
  * the exact pair-count table (packed uint32 keys + int32 counts) is
    REPLICATED and identical on every device: candidate selection and
    the k-deep prefix acceptance run redundantly, bit-identically;
  * per round each device extracts its shard's bounded delta buffers
    (old/new contributions of affected sites, O(dcap) each — the v3
    site lists) and the shards exchange ONLY those bounded buffers with
    one ``all_gather`` over ICI before every device folds the identical
    concatenation into its table copy.  The common-case exchange is
    O(n_dev * dcap) with dcap sized to the *delta*, independent of the
    table capacity pcap;
  * rounds whose local delta volume overflows ``dcap`` on ANY shard
    (the earliest rounds, where the top pair occurs in most words) take
    a separate recount branch: each shard reduces its full local
    tombstone-aware count into a [pcap] buffer and the shards exchange
    those instead — the delta-vs-recount decision is made global with
    ``lax.pmax`` so every device takes the same branch and the
    branch-local ``all_gather`` shapes agree.  Because the two branches
    gather different buffer sizes, cheap late rounds never pay the
    O(n_dev * pcap) recount exchange.

Integer counts + a fixed gather order make the fold order-independent:
rules are bit-identical to the single-device trainer at any device
count (tests/test_sharding.py).
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.train_delta import (
    PADKEY,
    _affected_positions,
    _concat_keys,
    _fit_table,
    _next_pow2,
    _pcap_budget,
    _reduce_by_key,
    _unpack_key,
    host_count_table,
)
from ..ops.train_sparse import (
    _apply_tomb,
    _gather_affected,
    _host_table_tomb,
    _pairs_tomb,
)
from ..ops.train_stream import (
    PAD,
    _topk_candidates,
    accept_prefix,
    flatten_word_buckets,
    load_snapshot,
    save_snapshot,
    store_rules,
)
from .mesh import DATA_AXIS, data_mesh
from .train_sharded import _MeshRef


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "batch_k", "pcap", "dcap", "mesh_ref"),
)
def _train_sparse_sharded(
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
            (t, fw), (tk, tc), rules, used, _, _, nrec = state
            # replicated candidate selection (identical on every device)
            xs, ys = _unpack_key(tk)
            cc, cx, cy = _topk_candidates(tc, xs, ys, kb, narrow=not wide)
            acc, zs, n_acc = accept_prefix(cc, cx, cy, used, vocab_size, kb)
            done = n_acc == 0

            # shard-local tombstone apply + bounded delta extraction
            keys, w, live, d = _pairs_tomb(t, wid, fw, wide)
            t2, hit = _apply_tomb(t, keys, live, d, acc, cx, cy, zs, kb)
            aff = _affected_positions(t, wid, hit)
            cs = jnp.cumsum(aff.astype(jnp.int32))
            n_aff = cs[-1]

            # the delta-vs-recount decision must be GLOBAL: every shard
            # must take the same branch, both because a recount fold
            # discards the old table and because each branch contains
            # its own (differently shaped) all_gather.  pmax makes the
            # flag identical on all devices.
            any_recount = (
                lax.pmax((n_aff > dcap).astype(jnp.int32), DATA_AXIS) > 0
            )

            def delta_fold(args):
                t2, fw, keys, w, cs, tk, tc = args
                pos, validj = _gather_affected(cs, dcap)
                posc = jnp.minimum(pos, t2.shape[0] - 1)
                ko = tuple(jnp.where(validj, k[posc], PADKEY) for k in keys)
                wo = jnp.where(validj, w[posc], 0)
                tt = jnp.where(validj, t2[posc], PAD)
                twid = jnp.where(validj, wid[posc], -1)
                tfw = jnp.where(validj, fw[posc], 0)
                kn, wn, _, _ = _pairs_tomb(tt, twid, tfw, wide)
                dkeys = _concat_keys(ko, kn)
                dvals = jnp.concatenate([-wo, wn])
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
                t2, fw, keys, w, cs, tk, tc = args
                # full local tombstone-aware recount reduced to [pcap]:
                # local kinds are a subset of the global table's kinds,
                # so n_local <= n_global <= pcap — nothing is truncated.
                # Local tables sum to the exact global table.
                kf, wf, _, _ = _pairs_tomb(t2, wid, fw, wide)
                lk, lc, _ = _reduce_by_key(kf, wf, pcap)
                gk = tuple(
                    lax.all_gather(k, DATA_AXIS, tiled=True) for k in lk
                )
                gv = lax.all_gather(lc, DATA_AXIS, tiled=True)
                return _reduce_by_key(gk, gv, pcap)

            tk2, tc2, n_live = lax.cond(
                any_recount,
                recount_fold,
                delta_fold,
                (t2, fw, keys, w, cs, tk, tc),
            )
            table_overflow = n_live > pcap

            rules = store_rules(rules, acc, cx, cy, cc, zs, used0, vocab_size)
            used = used + n_acc
            nrec = nrec + any_recount.astype(jnp.int32)
            return (
                (t2, fw), (tk2, tc2), rules, used, done, table_overflow, nrec
            )

        (t2, _), (tk2, tc2), rules, used, done, overflow, nrec = (
            lax.while_loop(
                cond,
                body,
                (
                    (t.astype(jnp.int32), fw0.astype(jnp.int32)),
                    (tk, tc),
                    rules,
                    used.astype(jnp.int32),
                    jnp.asarray(False),
                    jnp.asarray(False),
                    jnp.asarray(0, jnp.int32),
                ),
            )
        )
        return t2, tk2, tc2, rules, used, done, overflow, nrec

    shmapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(DATA_AXIS), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return shmapped(t, wid, freq, tk, tc, used, rules, used_ids0, limit)


def _shard_stream(t, wid, n_dev: int):
    """Split the flat stream into n_dev word-aligned shards, each padded
    to a common power-of-two capacity."""
    n_live = int((wid >= 0).sum())
    starts = np.nonzero(
        (wid >= 0) & np.concatenate([[True], wid[1:] != wid[:-1]])
    )[0]
    bounds = [0]
    for d in range(1, n_dev):
        target = d * n_live // n_dev
        j = int(np.searchsorted(starts, target))
        bounds.append(int(starts[min(j, starts.size - 1)]) if starts.size else 0)
    bounds.append(n_live)
    seg_lens = [bounds[d + 1] - bounds[d] for d in range(n_dev)]
    per = max(16, 1 << int(np.ceil(np.log2(max(max(seg_lens), 1)))))
    seg_t = np.full((n_dev, per), PAD, np.int32)
    seg_w = np.full((n_dev, per), PAD, np.int32)
    for d in range(n_dev):
        seg = slice(bounds[d], bounds[d + 1])
        seg_t[d, : seg_lens[d]] = t[seg]
        seg_w[d, : seg_lens[d]] = wid[seg]
    return seg_t, seg_w, per


def run_training_sparse_sharded(
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
    """Bit-identical to run_training_sparse at any device count.

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
    seg_t, seg_w, per = _shard_stream(t, wid, n_dev)

    wide = vocab_size > 65535
    uk, uc = _host_table_tomb(t, wid, freq)
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

    def shard_put(seg_t, seg_w):
        td = jax.device_put(
            jnp.asarray(seg_t.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
        )
        wd = jax.device_put(
            jnp.asarray(seg_w.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
        )
        return td, wd

    td, wd = shard_put(seg_t, seg_w)
    rep = NamedSharding(mesh, P())
    fd = jax.device_put(jnp.asarray(freq), rep)
    tkd = jax.device_put(tk, rep)
    tcd = jax.device_put(tc, rep)
    rules_d = jax.device_put(jnp.asarray(rules, jnp.int32), rep)
    u0 = jax.device_put(jnp.asarray(used_ids0, jnp.int32), rep)

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
    tot_rec = 0
    tot_rounds = 0
    while used < vocab_size:
        limit = min(vocab_size, used + seg)
        td, wd2 = td, wd
        td, tkd, tcd, rules_d, used_d, done, overflow, nrec = (
            _train_sparse_sharded(
                td, wd, fd, tkd, tcd,
                jax.device_put(jnp.asarray(used, jnp.int32), rep),
                rules_d, u0,
                jax.device_put(jnp.asarray(limit, jnp.int32), rep),
                vocab_size, batch_k, pcap, dcap, _MeshRef(mesh),
            )
        )
        prev_used = used
        used = int(used_d)
        tot_rec += int(nrec)
        tot_rounds += 1
        if bool(overflow):
            # rare: live pair kinds exceeded pcap; rebuild the table
            # from the current tombstoned stream with doubled capacity
            # and continue from `used` (progress is kept)
            pcap *= 2
            uk, uc = _host_table_tomb(
                np.asarray(td), np.asarray(wd), np.asarray(fd)
            )
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
