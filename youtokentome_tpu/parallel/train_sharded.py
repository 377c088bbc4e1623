"""Data-parallel BPE training over a device mesh.

TPU-native equivalent of the reference's threaded trainer
(bpe.cpp:859-1293): unique words are sharded across the ``data`` mesh
axis (the reference shards corpus segments across threads,
bpe.cpp:864-873); each round every device computes pair statistics for
its shard, the shards are combined with an ``all_gather`` over ICI
(replacing the reference's main-thread hash-map fold, bpe.cpp:1078-1088
and on-demand cross-thread count sums, check_cnt bpe.cpp:1099-1108), and
the tie-broken argmax is computed redundantly on every device — all
counts are integers, so the result is bit-identical at any device count.
The chosen merge is applied to each local shard.

The whole fixed point runs inside one ``shard_map``-ped ``while_loop``:
zero host round-trips, one collective per round.
"""

from __future__ import annotations

import functools
import sys
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.segment import apply_merge_rows
from ..ops.train_kernel import _argmax_tiebreak, _pair_arrays, _segment_counts
from .mesh import DATA_AXIS, data_mesh


@functools.partial(
    jax.jit, static_argnames=("vocab_size", "mesh_ref")
)
def _train_rounds_sharded(buckets, used_ids0, vocab_size, mesh_ref):
    mesh = mesh_ref.mesh

    def run(bks, used0):
        rules0 = jnp.full((vocab_size, 4), -1, dtype=jnp.int32)

        def cond(state):
            _, _, used, done = state
            return (~done) & (used < vocab_size)

        def body(state):
            bks, rules, used, _ = state
            parts = [_pair_arrays(t, f) for t, f in bks]
            kx = jnp.concatenate([p[0] for p in parts])
            ky = jnp.concatenate([p[1] for p in parts])
            wf = jnp.concatenate([p[2] for p in parts])
            # combine shards: identical replicated stats on every device
            kx_g = lax.all_gather(kx, DATA_AXIS, tiled=True)
            ky_g = lax.all_gather(ky, DATA_AXIS, tiled=True)
            wf_g = lax.all_gather(wf, DATA_AXIS, tiled=True)
            cnt, xs, ys = _segment_counts(kx_g, ky_g, wf_g)
            c, xb, yb = _argmax_tiebreak(cnt, xs, ys)
            done = c <= 0
            z = used

            def do_merge(args):
                bks, rules = args
                new_bks = tuple(
                    (apply_merge_rows(t, xb, yb, z), f) for t, f in bks
                )
                new_rules = rules.at[used - used0].set(
                    jnp.stack([xb, yb, z, c]).astype(jnp.int32)
                )
                return new_bks, new_rules

            bks, rules = lax.cond(done, lambda a: a, do_merge, (bks, rules))
            used = jnp.where(done, used, used + 1)
            return bks, rules, used, done

        _, rules, used, _ = lax.while_loop(
            cond, body, (bks, rules0, used0.astype(jnp.int32), jnp.asarray(False))
        )
        return rules, used - used0

    in_specs = (
        tuple((P(DATA_AXIS, None), P(DATA_AXIS)) for _ in buckets),
        P(),
    )
    shmapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shmapped(buckets, used_ids0)


class _MeshRef:
    """Hashable wrapper so a Mesh can be a static jit argument."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash((tuple(self.mesh.devices.flat), self.mesh.axis_names))

    def __eq__(self, other):
        return (
            isinstance(other, _MeshRef)
            and tuple(self.mesh.devices.flat) == tuple(other.mesh.devices.flat)
            and self.mesh.axis_names == other.mesh.axis_names
        )


def run_training_sharded(
    buckets: Sequence[Tuple[np.ndarray, np.ndarray]],
    used_ids0: int,
    vocab_size: int,
    mesh: Mesh | None = None,
) -> List[Tuple[int, int, int]]:
    """Host wrapper: pads word shards to the device count and runs the
    sharded fixed point.  Bit-identical to single-device training."""
    mesh = mesh or data_mesh()
    n_dev = mesh.devices.size
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    padded = []
    for toks, freq in buckets:
        w = toks.shape[0]
        wp = -(-w // n_dev) * n_dev
        if wp != w:
            toks = np.concatenate(
                [toks, np.full((wp - w, toks.shape[1]), -1, dtype=toks.dtype)]
            )
            freq = np.concatenate([freq, np.zeros(wp - w, dtype=freq.dtype)])
        padded.append(
            (
                jax.device_put(
                    jnp.asarray(toks, jnp.int32),
                    NamedSharding(mesh, P(DATA_AXIS, None)),
                ),
                jax.device_put(
                    jnp.asarray(freq, jnp.int32), NamedSharding(mesh, P(DATA_AXIS))
                ),
            )
        )
    rules, n_rules = _train_rounds_sharded(
        tuple(padded),
        jnp.asarray(used_ids0, jnp.int32),
        vocab_size,
        _MeshRef(mesh),
    )
    n = int(n_rules)
    if used_ids0 + n < vocab_size:
        print(f"WARNING merged only: {used_ids0 + n} pairs of tokens", file=sys.stderr)
    out = np.asarray(rules[:n, :3])
    return [tuple(map(int, r)) for r in out]
