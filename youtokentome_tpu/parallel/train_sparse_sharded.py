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
    concatenation into its table copy.  Communication is O(n_dev *
    dcap) per round — never O(M) position arrays (the anti-pattern the
    v1 sharded trainer had);
  * rounds whose delta volume overflows ``dcap`` fall back to a local
    recount reduced to O(pcap) per device, exchanged the same bounded
    way (early rounds only — same amortization as the single-device
    tiers).

Integer counts + a fixed gather order make the fold order-independent:
rules are bit-identical to the single-device trainer at any device
count (tests/test_sharding.py).
"""

from __future__ import annotations

import sys
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
    _fit_table,
    _next_pow2,
    _pcap_budget,
    _reduce_by_key,
    _unpack_key,
    host_count_table,
)
from ..ops.train_sparse import _apply_tomb, _gather_affected, _pairs_tomb
from ..ops.train_stream import (
    PAD,
    _topk_candidates,
    accept_prefix,
    flatten_word_buckets,
    store_rules,
)
from .mesh import DATA_AXIS, data_mesh
from .train_sharded import _MeshRef


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "batch_k", "pcap", "dcap", "mesh_ref"),
)
def _train_sparse_sharded(
    t, wid, freq, tk, tc, used_ids0, vocab_size, batch_k, pcap, dcap, mesh_ref
):
    mesh = mesh_ref.mesh
    kb = batch_k

    def run(t, wid, freq, tk, tc, used0):
        rules0 = jnp.full((vocab_size, 3), -1, dtype=jnp.int32)
        fw0 = freq[jnp.maximum(wid, 0)] * (wid >= 0)

        def cond(state):
            _, _, _, used, done, overflow = state
            return (~done) & (~overflow) & (used < vocab_size)

        def body(state):
            (t, fw), (tk, tc), rules, used, _, _ = state
            # replicated candidate selection (identical on every device)
            xs, ys = _unpack_key(tk)
            cc, cx, cy = _topk_candidates(tc, xs, ys, kb)
            acc, zs, n_acc = accept_prefix(cc, cx, cy, used, vocab_size, kb)
            done = n_acc == 0

            # shard-local tombstone apply + bounded delta extraction
            keys, w, live, d = _pairs_tomb(t, wid, fw)
            t2, hit = _apply_tomb(t, keys, live, d, acc, cx, cy, zs, kb)
            aff = _affected_positions(t, wid, hit)
            cs = jnp.cumsum(aff.astype(jnp.int32))
            n_aff = cs[-1]

            def delta(args):
                t2, fw, keys, w, cs = args
                pos, validj = _gather_affected(cs, dcap)
                posc = jnp.minimum(pos, t2.shape[0] - 1)
                ko = jnp.where(validj, keys[posc], PADKEY)
                wo = jnp.where(validj, w[posc], 0)
                tt = jnp.where(validj, t2[posc], PAD)
                twid = jnp.where(validj, wid[posc], -1)
                tfw = jnp.where(validj, fw[posc], 0)
                kn, wn, _, _ = _pairs_tomb(tt, twid, tfw)
                return jnp.concatenate([ko, kn]), jnp.concatenate([-wo, wn])

            def recount(args):
                t2, fw, keys, w, cs = args
                # local tombstone-aware full recount, reduced to the
                # same bounded [2*dcap] buffer shape.  Local kinds are a
                # subset of the global table's kinds, so n_local <=
                # n_global <= pcap <= 2*dcap (the driver floors dcap at
                # pcap/2) — nothing is ever truncated.
                kf, wf, _, _ = _pairs_tomb(t2, wid, fw)
                lk, lc, _ = _reduce_by_key(kf, wf, 2 * dcap)
                return lk, lc

            # the delta-vs-recount decision must be GLOBAL: a recount
            # fold discards the old table, so every shard must
            # contribute a full local recount (not a delta) that round.
            # pmax makes the flag identical on all devices; recounts
            # happen only in the earliest rounds (top pair in most words)
            any_recount = lax.pmax((n_aff > dcap).astype(jnp.int32), DATA_AXIS) > 0
            dkeys, dvals = lax.cond(
                any_recount, recount, delta, (t2, fw, keys, w, cs)
            )

            # exchange ONLY the bounded buffers (O(n_dev * dcap) over
            # ICI); every device folds the identical concatenation
            gk = lax.all_gather(dkeys, DATA_AXIS, tiled=True)
            gv = lax.all_gather(dvals, DATA_AXIS, tiled=True)

            tk2, tc2, n_live = lax.cond(
                any_recount,
                # recount: local tables sum to the exact global table
                lambda _: _reduce_by_key(gk, gv, pcap),
                # delta: adjust the replicated table by every shard's +/-
                lambda _: _reduce_by_key(
                    jnp.concatenate([tk, gk]), jnp.concatenate([tc, gv]), pcap
                ),
                None,
            )
            table_overflow = n_live > pcap

            rules = store_rules(rules, acc, cx, cy, zs, used0, vocab_size)
            used = used + n_acc
            return (t2, fw), (tk2, tc2), rules, used, done, table_overflow

        (t2, _), (tk2, tc2), rules, used, done, overflow = lax.while_loop(
            cond,
            body,
            (
                (t.astype(jnp.int32), fw0.astype(jnp.int32)),
                (tk, tc),
                rules0,
                used0.astype(jnp.int32),
                jnp.asarray(False),
                jnp.asarray(False),
            ),
        )
        return rules, used - used0, overflow

    shmapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return shmapped(t, wid, freq, tk, tc, used_ids0)


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
) -> List[Tuple[int, int, int]]:
    """Bit-identical to run_training_sparse at any device count."""
    import os

    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    t, wid, freq = flatten_word_buckets(buckets)
    seg_t, seg_w, per = _shard_stream(t, wid, n_dev)

    uk, uc = host_count_table(t, wid, freq)
    n_live = uk.size
    pcap = int(os.environ.get("YTTM_TRAIN_PCAP", "0")) or _pcap_budget(
        n_live, vocab_size - used_ids0
    )
    # dcap >= pcap/2 is a correctness floor, not a tuning choice: the
    # recount fold reduces each shard's full table into [2*dcap] and
    # n_local <= n_global <= pcap must always fit
    dcap = max(
        int(os.environ.get("YTTM_TRAIN_DCAP", "0"))
        or _next_pow2(min(max(1 << 12, per >> 6), 1 << 17)),
        pcap // 2,
    )
    tk, tc = _fit_table(uk, uc, pcap)

    td = jax.device_put(
        jnp.asarray(seg_t.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
    )
    wd = jax.device_put(
        jnp.asarray(seg_w.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
    )
    fd = jax.device_put(jnp.asarray(freq), NamedSharding(mesh, P()))
    tkd = jax.device_put(jnp.asarray(tk), NamedSharding(mesh, P()))
    tcd = jax.device_put(jnp.asarray(tc), NamedSharding(mesh, P()))

    while True:
        rules, n_rules, overflow = _train_sparse_sharded(
            td, wd, fd, tkd, tcd,
            jnp.asarray(used_ids0, jnp.int32), vocab_size, batch_k,
            pcap, dcap, _MeshRef(mesh),
        )
        if not bool(overflow):
            break
        # rare: live pair kinds exceeded pcap; retry with doubled table
        # (a fresh run — the table is rebuilt from the initial stream)
        pcap *= 2
        dcap = max(dcap, pcap // 2)
        tk, tc = _fit_table(uk, uc, pcap)
        tkd = jax.device_put(jnp.asarray(tk), NamedSharding(mesh, P()))
        tcd = jax.device_put(jnp.asarray(tc), NamedSharding(mesh, P()))

    n = int(n_rules)
    if used_ids0 + n < vocab_size:
        print(
            f"WARNING merged only: {used_ids0 + n} pairs of tokens",
            file=sys.stderr,
        )
    out = np.asarray(rules[:n])
    return [tuple(map(int, r)) for r in out]
