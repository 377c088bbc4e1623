"""Site-local tombstone trainer (ops/train_sparse) vs the full-recount
trainer (ops/train_stream) and the oracle: identical rules always.

v3 never compacts the stream (merged slots become tombstones) and
extracts delta sites with binary search instead of sorts; any error in
the live-subsequence rank bookkeeping shows up as a diverging candidate
order, so differential equality over run-heavy random corpora is the
strongest cheap check (the reference's own strategy,
stress_test.cpp:420-434)."""

import os
import random

import numpy as np
import pytest

from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
from youtokentome_tpu.oracle import train_from_codepoints as oracle_train
from youtokentome_tpu.train import train_from_codepoints as device_train


def _cps(text):
    return np.array([ord(c) for c in text], dtype=np.uint32)


def _run_impl(impl, cps, vocab, cfg, env=()):
    old = {k: os.environ.get(k) for k, _ in (("YTTM_TRAIN_IMPL", 0),) + tuple(env)}
    os.environ["YTTM_TRAIN_IMPL"] = impl
    for k, v in env:
        os.environ[k] = v
    try:
        return device_train(cps, vocab, cfg)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.mark.parametrize("seed", range(4))
def test_sparse_equals_stream_random(seed):
    rng = random.Random(seed)
    # run-heavy text over a tiny alphabet: exercises floor(run/2)
    # counting, x==y merges across tombstones, and tier boundaries
    out = []
    while len(out) < 1200:
        if rng.randrange(2):
            out.append(rng.choice("abc "))
        else:
            out.extend([rng.choice("abc ")] * rng.randint(2, 6))
    text = "".join(out)
    vocab = 10 + rng.randrange(40)
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = _run_impl("stream", _cps(text), vocab, cfg)
    b = _run_impl("sparse", _cps(text), vocab, cfg)
    assert a.rules == b.rules
    assert a.char2id == b.char2id


def test_sparse_matches_oracle_zipf():
    rng = np.random.default_rng(7)
    letters = "abcdefgh"
    words = [
        "".join(rng.choice(list(letters), size=l))
        for l in np.clip(rng.poisson(5, 300), 2, 10)
    ]
    probs = 1.0 / np.arange(1, 301)
    probs /= probs.sum()
    text = " ".join(np.array(words, object)[rng.choice(300, 3000, p=probs)])
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = oracle_train(_cps(text), 120, cfg)
    b = _run_impl("sparse", _cps(text), 120, cfg)
    assert a.rules == b.rules
    assert a.char2id == b.char2id


def test_sparse_tiny_tiers_force_recount():
    """Tiny tier caps force every round through the large tier and the
    tombstone-aware full-recount fallback (semantics must not change)."""
    text = "abab abba baab aabb abab abba " * 20
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    ref = _run_impl("stream", _cps(text), 20, cfg)
    got = _run_impl(
        "sparse", _cps(text), 20, cfg,
        env=(("YTTM_TRAIN_DCAP0", "16"), ("YTTM_TRAIN_DCAP1", "32")),
    )
    assert got.rules == ref.rules


def _checkpoint_fixture():
    """(buckets, used0, reference rules at vocab 24) for resume tests."""
    from youtokentome_tpu.host import preprocess
    from youtokentome_tpu.ops import train_sparse

    text = "abab abba baab aabb caba bcab " * 30
    cps = _cps(text)
    uniq, cnt, data_len = preprocess.char_frequencies(cps)
    alphabet = preprocess.build_alphabet(uniq, cnt, data_len, 1.0, 4)
    used0 = len(alphabet.char2id) + 4
    buckets = preprocess.training_word_buckets(cps, alphabet)
    ref = train_sparse.run_training_sparse(buckets, used0, 24)
    return buckets, used0, ref


RUNNERS = {}


def _runner(impl):
    if not RUNNERS:
        from youtokentome_tpu.ops import train_delta, train_sparse, train_stream

        RUNNERS.update(
            sparse=train_sparse.run_training_sparse,
            delta=train_delta.run_training_delta,
            stream=train_stream.run_training_stream,
        )
    return RUNNERS[impl]


@pytest.mark.parametrize("impl", ["sparse", "delta", "stream"])
def test_checkpoint_resume(impl, tmp_path):
    """Kill-and-resume must reproduce the uninterrupted rules exactly.

    The kill is emulated by running with a *smaller* vocab target and
    resuming toward the full one — snapshots are vocab-size-portable
    (they store only the filled rule rows) and host-compacted."""
    buckets, used0, ref = _checkpoint_fixture()
    run = _runner(impl)

    ckpt = str(tmp_path / "snap.npz")
    run(buckets, used0, used0 + 6, checkpoint_path=ckpt, checkpoint_every=3)
    got = run(buckets, used0, 24, resume_path=ckpt)
    # the snapshot carries the rules learned so far, so the resumed run
    # returns the complete list — it must equal the uninterrupted one
    assert got == ref


@pytest.mark.parametrize(
    "save_impl,resume_impl",
    [("sparse", "stream"), ("sparse", "delta"), ("stream", "sparse")],
)
def test_checkpoint_cross_driver_resume(save_impl, resume_impl, tmp_path):
    """Snapshots are cross-compatible: a v3 tombstone snapshot is
    compacted at save time, so any driver resumes it bit-exactly."""
    buckets, used0, ref = _checkpoint_fixture()

    ckpt = str(tmp_path / "snap.npz")
    _runner(save_impl)(
        buckets, used0, used0 + 6, checkpoint_path=ckpt, checkpoint_every=3
    )
    got = _runner(resume_impl)(buckets, used0, 24, resume_path=ckpt)
    assert got == ref


def test_checkpoint_resume_rejects_mismatched_base(tmp_path):
    from youtokentome_tpu.ops import train_sparse

    buckets, used0, _ = _checkpoint_fixture()
    ckpt = str(tmp_path / "snap.npz")
    train_sparse.run_training_sparse(
        buckets, used0, used0 + 6, checkpoint_path=ckpt, checkpoint_every=3
    )
    with pytest.raises(ValueError, match="base ids"):
        train_sparse.run_training_sparse(
            buckets, used0 + 1, 24, resume_path=ckpt
        )


def test_wide_vocab_matches_stream():
    """vocab_size >= 65536 flips the trainers to two-component pair keys
    (the reference has no vocab limit); rules must stay bit-identical to
    the v1 stream trainer on the same corpus."""
    import random

    from youtokentome_tpu.host import preprocess
    from youtokentome_tpu.ops import train_sparse
    from youtokentome_tpu.ops.train_stream import run_training_stream

    rng = random.Random(5)
    text = "".join(rng.choice("abcde ") for _ in range(600))
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    uniq, cnt, dl = preprocess.char_frequencies(cps)
    alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
    buckets = preprocess.training_word_buckets(cps, alpha)
    used0 = len(alpha.char2id) + 4
    # vocab 70000 is never reached on this corpus (WARNING + truncation,
    # like the reference bpe.cpp:1137-1145) but statically selects the
    # wide key layout in the sparse/delta kernels
    stream = run_training_stream(buckets, used0, 70000)
    sparse = train_sparse.run_training_sparse(buckets, used0, 70000)
    assert sparse == stream

    from youtokentome_tpu.ops.train_delta import run_training_delta

    delta = run_training_delta(buckets, used0, 70000)
    assert delta == stream


def test_wide_vocab_sharded_invariance():
    import random

    from youtokentome_tpu.host import preprocess
    from youtokentome_tpu.ops import train_sparse
    from youtokentome_tpu.parallel.mesh import data_mesh
    from youtokentome_tpu.parallel.train_sparse_sharded import (
        run_training_sparse_sharded,
    )

    rng = random.Random(6)
    text = "".join(rng.choice("abc ") for _ in range(400))
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    uniq, cnt, dl = preprocess.char_frequencies(cps)
    alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
    buckets = preprocess.training_word_buckets(cps, alpha)
    used0 = len(alpha.char2id) + 4
    single = train_sparse.run_training_sparse(buckets, used0, 70000)
    sharded = run_training_sparse_sharded(buckets, used0, 70000, data_mesh(4))
    assert sharded == single


def test_reduce_by_key_wide_large_ids():
    """The two-component reduce must be exact for token ids far above
    65535 (key components use the full uint32 range)."""
    import jax.numpy as jnp

    from youtokentome_tpu.ops.train_delta import PADKEY, _reduce_by_key

    rng = np.random.default_rng(0)
    n = 512
    xs = rng.integers(60000, 200000, n).astype(np.uint32)
    ys = rng.integers(60000, 200000, n).astype(np.uint32)
    vals = rng.integers(-3, 8, n).astype(np.int32)
    pad = rng.random(n) < 0.2
    xs[pad] = 0xFFFFFFFF
    ys[pad] = 0xFFFFFFFF
    vals[pad] = 0
    ko, vo, nk = _reduce_by_key(
        (jnp.asarray(xs), jnp.asarray(ys)), jnp.asarray(vals), 1024
    )
    kox, koy = np.asarray(ko[0]), np.asarray(ko[1])
    vo = np.asarray(vo)
    # numpy reference
    ref = {}
    for x, y, v in zip(xs, ys, vals):
        if x != 0xFFFFFFFF:
            ref[(int(x), int(y))] = ref.get((int(x), int(y)), 0) + int(v)
    ref = {k: v for k, v in ref.items() if v > 0}
    got = {
        (int(kox[i]), int(koy[i])): int(vo[i])
        for i in range(int(nk))
    }
    assert got == ref
    assert np.all(kox[int(nk):] == 0xFFFFFFFF)


def test_wide_vocab_mints_real_wide_ids():
    """End-to-end wide-vocab exactness with ids REALLY above 65536 (the
    reference has no vocab limit; bpe.cpp uses 32-bit ids throughout).

    A ~65k-character alphabet pushes used_ids0 just below 65536, so the
    merges cross it and the two-component lexicographic tie-break runs
    on genuinely wide ids (the narrow path packs (x,y) into one uint32
    and cannot represent them).  v2/v4/v5 trainers must agree, the
    model must round-trip through encode, and merged ids >= 65536 must
    decode back to their surface strings."""
    import random

    from youtokentome_tpu.host import preprocess
    from youtokentome_tpu.models.state import (
        BPEState, BpeConfig, SpecialTokens, check_config,
    )
    from youtokentome_tpu.ops.train_block import run_training_block
    from youtokentome_tpu.ops.train_delta import run_training_delta
    from youtokentome_tpu.ops.train_tiered import run_training_tiered
    from youtokentome_tpu.oracle import rename_tokens

    rng = random.Random(41)
    # ~65k distinct single-char words (inflate used_ids0 to ~65509) plus
    # frequent multi-char words over a 500-char pool whose higher-count
    # pairs drive every learned merge (and their chains) past 65536
    cps_pool = [
        cp
        for r in (
            range(0x2000, 0xD7FF),
            range(0x10000, 0x14000),
            range(0x14000, 0x18000),
        )
        for cp in r
        if cp != 0x2581
    ]
    singles = cps_pool[:65000]
    words = [(chr(cp), rng.randint(1, 9)) for cp in singles]
    pool = [chr(cp) for cp in cps_pool[65000:65500]]
    for _ in range(1500):
        w = "".join(rng.choice(pool) for _ in range(rng.randint(2, 5)))
        words.append((w, rng.randint(1, 50)))
    parts = []
    for w, f in words:
        parts.extend([w] * f)
    rng.shuffle(parts)
    text = " ".join(parts)

    cps = np.fromiter((ord(c) for c in text), np.uint32, len(text))
    uniq, cnt, dl = preprocess.char_frequencies(cps)
    alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
    buckets = preprocess.training_word_buckets(cps, alpha)
    used0 = len(alpha.char2id) + 4
    assert 65000 < used0 < 65536, used0
    vocab = 65900

    delta = run_training_delta(buckets, used0, vocab)
    block = run_training_block(buckets, used0, vocab)
    tiered = run_training_tiered(buckets, used0, vocab)
    assert block == delta
    assert tiered == delta
    wide_zs = [z for _, _, z in delta if z >= 65536]
    assert len(wide_zs) > 300, (len(delta), len(wide_zs))
    wide_xy = [(x, y) for x, y, _ in delta if x >= 65536 or y >= 65536]
    assert wide_xy, "no rule ever consumed a wide id"

    special = SpecialTokens(0, 1, 2, 3)
    char2id, rules = rename_tokens(alpha.char2id, delta, special, vocab)
    state = BPEState(char2id=char2id, rules=rules, special_tokens=special)
    check_config(BpeConfig(1.0, 1, special), vocab)

    from youtokentome_tpu.encoder import Encoder
    from youtokentome_tpu.models.vocab import Vocabulary

    enc = Encoder(state)
    v = Vocabulary(state)
    sample = [w for w, _ in words[-40:]] + [w for w, _ in words[:5]]
    sents = [" ".join(sample[i::7]) for i in range(7)]
    ids = enc.encode(sents, "id")
    assert max(x for s in ids for x in s) >= 65536
    for s, row in zip(sents, ids):
        assert v.decode_ids(row) == s


def test_tiered_row_fold_repack_exact(capsys):
    """The v5 driver's device-side row-fold repack (halving the block
    count as the stream shrinks) must not change the learned rules.
    The fold floor normally keeps small streams un-folded, so this test
    lowers it and uses a merge-heavy corpus whose stream shrinks well
    below half."""
    import os
    import random

    from youtokentome_tpu.host import preprocess
    from youtokentome_tpu.ops.train_delta import run_training_delta
    from youtokentome_tpu.ops.train_tiered import run_training_tiered

    rng = random.Random(77)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(3, 10)))
        for _ in range(1500)
    ]
    text = " ".join(rng.choice(words) for _ in range(6000))
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    uniq, cnt, dl = preprocess.char_frequencies(cps)
    alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
    buckets = preprocess.training_word_buckets(cps, alpha)
    used0 = len(alpha.char2id) + 4
    ref = run_training_delta(buckets, used0, 900)
    os.environ["YTTM_TRAIN_FOLD_MIN"] = "16"
    os.environ["YTTM_TRAIN_B"] = "16"
    try:
        got = run_training_tiered(buckets, used0, 900, progress_every=300)
    finally:
        os.environ.pop("YTTM_TRAIN_FOLD_MIN")
        os.environ.pop("YTTM_TRAIN_B")
    assert got == ref
    # the fold must actually have fired: the per-segment progress lines
    # carry the padded stream size, which halves on a fold
    err = capsys.readouterr().err
    import re

    ms = [int(x) for x in re.findall(r"m=(\d+)", err)]
    assert ms and min(ms) < max(ms), f"row fold never fired: {ms}"
