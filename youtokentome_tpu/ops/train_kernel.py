"""BPE training rounds on device.

The reference trains with a two-tier priority queue, per-thread sharded
pair counts, and a 1-deep speculative pipeline (bpe.cpp:859-1293).  Its
observable semantics are proven (by the reference's own stress test,
stress_test.cpp:420-434) to equal the naive formulation: *each round,
recount all pairs globally, pick the argmax under the tie-break order,
apply the merge everywhere*.  That naive formulation is exactly the
TPU-friendly one — dense tensors, a sort-based reduce-by-key, four
masked reductions for the tie-broken argmax, and a vectorized merge —
implemented here inside a single ``lax.while_loop`` with no host
round-trips.

Words are length-bucketed: the corpus arrives as a tuple of
``(tokens [Wb, Lb], freq [Wb])`` tensors so ragged word lengths (e.g.
space-less CJK lines) don't explode padding.  Pair statistics from all
buckets are concatenated before the global sort/argmax; the chosen merge
is applied to every bucket.

Tie-break order (bpe.cpp:110-126): max count; then smaller max(x, y);
then smaller min(x, y); then larger x.

Pair-count semantics: adjacent pairs weighted by word frequency; inside
runs of equal tokens only even offsets count (floor(run/2) occurrences,
bpe.cpp:140-143, 465-475) — see ``segment.pair_count_mask``.

This is the v0 kernel: O(corpus sort) per round.  Incremental count
maintenance (delta updates + a lazily revalidated candidate cache,
mirroring the reference's two-tier queue) is the planned v1 upgrade.
"""

from __future__ import annotations

import functools
import sys
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .segment import PAD, apply_merge_rows, pair_count_mask

# numpy (host) scalar: a module-level jnp scalar is a *device* array
# whose value must be fetched D2H when embedded as an XLA constant at
# lowering time -- minutes per fetch on remote-tunnel toolchains.
BIG = np.int32(0x7FFFFFFF)


def _pair_arrays(tokens: jnp.ndarray, freq: jnp.ndarray):
    """Flattened (key_x, key_y, weight) for all adjacent positions."""
    left = tokens[:, :-1]
    right = tokens[:, 1:]
    valid = (left != PAD) & (right != PAD)
    counted = pair_count_mask(left, right, valid)
    w = jnp.where(counted, freq[:, None], 0).astype(jnp.int32)
    kx = jnp.where(valid, left, BIG).ravel()
    ky = jnp.where(valid, right, BIG).ravel()
    return kx, ky, w.ravel()


def _segment_counts(kx, ky, wf):
    """Sorted reduce-by-key; returns (cnt, x, y) with totals at segment
    ends and zeros elsewhere (cnt monotonicity makes a cummax recover the
    previous segment's cumulative sum)."""
    kx_s, ky_s, w_s = lax.sort((kx, ky, wf), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (kx_s[1:] != kx_s[:-1]) | (ky_s[1:] != ky_s[:-1])]
    )
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    cw = jnp.cumsum(w_s)
    end_marks = jnp.where(is_end, cw, 0)
    prev_end = jnp.concatenate(
        [jnp.zeros((1,), end_marks.dtype), lax.associative_scan(jnp.maximum, end_marks)[:-1]]
    )
    cnt = jnp.where(is_end & (kx_s != BIG), cw - prev_end, 0)
    return cnt, kx_s, ky_s


def _argmax_tiebreak(cnt: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Reference candidate ordering as four masked reductions."""
    c = jnp.max(cnt)
    mx = jnp.maximum(x, y)
    mn = jnp.minimum(x, y)
    e1 = cnt == c
    m1 = jnp.min(jnp.where(e1, mx, BIG))
    e2 = e1 & (mx == m1)
    m2 = jnp.min(jnp.where(e2, mn, BIG))
    e3 = e2 & (mn == m2)
    xb = jnp.max(jnp.where(e3, x, -1))
    yb = m1 + m2 - xb
    return c, xb, yb


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def train_rounds(
    buckets,              # tuple of (tokens [Wb, Lb] int32, freq [Wb] int32)
    used_ids0: jnp.ndarray,  # scalar int32: n_specials + alphabet size
    vocab_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run merge rounds until vocab_size ids exist or no pairs remain.

    Returns (rules [vocab_size, 4] int32 [x,y,z,cnt] padded with -1, n_rules scalar).
    """
    rules0 = jnp.full((vocab_size, 4), -1, dtype=jnp.int32)
    buckets = tuple((t.astype(jnp.int32), f.astype(jnp.int32)) for t, f in buckets)

    def cond(state):
        _, _, used, done = state
        return (~done) & (used < vocab_size)

    def body(state):
        bks, rules, used, _ = state
        parts = [_pair_arrays(t, f) for t, f in bks]
        kx = jnp.concatenate([p[0] for p in parts])
        ky = jnp.concatenate([p[1] for p in parts])
        wf = jnp.concatenate([p[2] for p in parts])
        cnt, xs, ys = _segment_counts(kx, ky, wf)
        c, xb, yb = _argmax_tiebreak(cnt, xs, ys)
        done = c <= 0
        z = used

        def do_merge(args):
            bks, rules = args
            new_bks = tuple((apply_merge_rows(t, xb, yb, z), f) for t, f in bks)
            new_rules = rules.at[used - used_ids0].set(
                jnp.stack([xb, yb, z, c]).astype(jnp.int32)
            )
            return new_bks, new_rules

        bks, rules = lax.cond(done, lambda a: a, do_merge, (bks, rules))
        used = jnp.where(done, used, used + 1)
        return bks, rules, used, done

    _, rules, used, _ = lax.while_loop(
        cond, body, (buckets, rules0, used_ids0.astype(jnp.int32), jnp.asarray(False))
    )
    return rules, used - used_ids0


def run_training(
    buckets: Sequence[Tuple[np.ndarray, np.ndarray]],
    used_ids0: int,
    vocab_size: int,
) -> List[Tuple[int, int, int]]:
    """Host wrapper: returns the learned (x, y, z) rule list (pre-rename)."""
    if not buckets:
        print(f"WARNING merged only: {used_ids0} pairs of tokens", file=sys.stderr)
        return []
    jb = tuple(
        (jnp.asarray(t, dtype=jnp.int32), jnp.asarray(f, dtype=jnp.int32))
        for t, f in buckets
    )
    rules, n_rules = train_rounds(jb, jnp.asarray(used_ids0, dtype=jnp.int32), vocab_size)
    n = int(n_rules)
    if used_ids0 + n < vocab_size:
        print(f"WARNING merged only: {used_ids0 + n} pairs of tokens", file=sys.stderr)
    out = np.asarray(rules[:n, :3])
    return [tuple(map(int, r)) for r in out]
