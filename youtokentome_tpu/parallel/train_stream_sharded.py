"""Data-parallel flat-stream BPE training over a device mesh.

The production multi-chip trainer: the deduplicated-word token stream is
sharded across the ``data`` mesh axis at word boundaries (the reference
shards corpus segments across threads, bpe.cpp:864-873); each round
every device computes its shard's pair keys, the shards are combined
with an ``all_gather`` over ICI (replacing the reference's cross-thread
count folds, bpe.cpp:1078-1088 / check_cnt bpe.cpp:1099-1108), and the
tie-ordered top-k + exact k-deep prefix acceptance (see
ops/train_stream.py) run redundantly on every device — integer counts
make the result bit-identical at any device count.  Accepted merges are
applied shard-locally.
"""

from __future__ import annotations

import functools
import sys
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.train_stream import (
    PAD,
    _segment_counts_flat,
    _topk_candidates,
    accept_prefix,
    apply_accepted,
    flatten_word_buckets,
    pair_keys_and_weights,
    store_rules,
)
from .mesh import DATA_AXIS, data_mesh
from .train_sharded import _MeshRef


@functools.partial(jax.jit, static_argnames=("vocab_size", "batch_k", "mesh_ref"))
def _train_sharded(t, wid, freq, used_ids0, vocab_size, batch_k, mesh_ref):
    mesh = mesh_ref.mesh

    def run(t, wid, freq, used0):
        rules0 = jnp.full((vocab_size, 4), -1, dtype=jnp.int32)

        def cond(state):
            _, _, used, done = state
            return (~done) & (used < vocab_size)

        def body(state):
            (t, wid), rules, used, _ = state
            kx, ky, w = pair_keys_and_weights(t, wid, freq)
            kx_g = lax.all_gather(kx, DATA_AXIS, tiled=True)
            ky_g = lax.all_gather(ky, DATA_AXIS, tiled=True)
            w_g = lax.all_gather(w, DATA_AXIS, tiled=True)
            cnt, xs, ys = _segment_counts_flat(
                kx_g, ky_g, w_g, pack16=vocab_size < 65536
            )
            cc, cx, cy = _topk_candidates(cnt, xs, ys, batch_k)
            acc, zs, n_acc = accept_prefix(cc, cx, cy, used, vocab_size, batch_k)
            done = n_acc == 0
            t2, w2 = apply_accepted(t, wid, acc, cx, cy, zs)
            rules = store_rules(rules, acc, cx, cy, cc, zs, used0, vocab_size)
            return (t2, w2), rules, used + n_acc, done

        (_, _), rules, used, _ = lax.while_loop(
            cond,
            body,
            ((t.astype(jnp.int32), wid.astype(jnp.int32)), rules0,
             used0.astype(jnp.int32), jnp.asarray(False)),
        )
        return rules, used - used0

    shmapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shmapped(t, wid, freq, used_ids0)


def run_training_stream_sharded(
    buckets, used_ids0: int, vocab_size: int, mesh: Mesh | None = None,
    batch_k: int = 16,
) -> List[Tuple[int, int, int]]:
    """Bit-identical to single-device training at any device count."""
    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    t, wid, freq = flatten_word_buckets(buckets)

    # split the stream into n_dev equal segments at word boundaries:
    # move whole words so no word straddles a shard
    n_live = int((wid >= 0).sum())
    # word start indices in the flat stream
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
    # pow2 per-shard capacity bounds the compiled-shape count
    per = max(16, 1 << int(np.ceil(np.log2(max(max(seg_lens), 1)))))
    seg_t = np.full((n_dev, per), PAD, np.int32)
    seg_w = np.full((n_dev, per), PAD, np.int32)
    for d in range(n_dev):
        seg = slice(bounds[d], bounds[d + 1])
        seg_t[d, : seg_lens[d]] = t[seg]
        seg_w[d, : seg_lens[d]] = wid[seg]

    td = jax.device_put(
        jnp.asarray(seg_t.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
    )
    wd = jax.device_put(
        jnp.asarray(seg_w.reshape(-1)), NamedSharding(mesh, P(DATA_AXIS))
    )
    fd = jax.device_put(jnp.asarray(freq), NamedSharding(mesh, P()))
    rules, n_rules = _train_sharded(
        td, wd, fd, jnp.asarray(used_ids0, jnp.int32), vocab_size, batch_k,
        _MeshRef(mesh),
    )
    n = int(n_rules)
    if used_ids0 + n < vocab_size:
        print(f"WARNING merged only: {used_ids0 + n} pairs of tokens", file=sys.stderr)
    out = np.asarray(rules[:n, :3])
    return [tuple(map(int, r)) for r in out]
