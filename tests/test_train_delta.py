"""Incremental-count trainer (ops/train_delta) vs the full-recount
trainer (ops/train_stream) and the oracle: identical rules always.

The delta trainer maintains exact pair counts via word-granular delta
recounting (module docstring in ops/train_delta.py); any bookkeeping
error shows up as a diverging candidate order, so differential equality
over run-heavy random corpora is the strongest cheap check (the same
strategy the reference's stress suite uses, stress_test.cpp:420-434).
"""

import os
import random

import numpy as np
import pytest

from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
from youtokentome_tpu.oracle import train_from_codepoints as oracle_train
from youtokentome_tpu.train import train_from_codepoints as device_train


def _cps(text):
    return np.array([ord(c) for c in text], dtype=np.uint32)


def _run_impl(impl, cps, vocab, cfg):
    old = os.environ.get("YTTM_TRAIN_IMPL")
    os.environ["YTTM_TRAIN_IMPL"] = impl
    try:
        return device_train(cps, vocab, cfg)
    finally:
        if old is None:
            os.environ.pop("YTTM_TRAIN_IMPL", None)
        else:
            os.environ["YTTM_TRAIN_IMPL"] = old


@pytest.mark.parametrize("seed", range(4))
def test_delta_equals_stream_random(seed):
    rng = random.Random(seed)
    # run-heavy text over a tiny alphabet: exercises floor(run/2)
    # counting, x==y merges, and delta/recount boundaries
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
    b = _run_impl("delta", _cps(text), vocab, cfg)
    assert a.rules == b.rules
    assert a.char2id == b.char2id


def test_delta_matches_oracle_zipf():
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
    b = _run_impl("delta", _cps(text), 120, cfg)
    assert a.rules == b.rules
    assert a.char2id == b.char2id


def test_delta_tiny_dcap_overflow_fallback():
    """Force the delta buffer to overflow so the full-recount fallback
    path runs (semantics must not change)."""
    from youtokentome_tpu.host import preprocess
    from youtokentome_tpu.models.state import check_config
    from youtokentome_tpu.ops import train_delta, train_stream
    from youtokentome_tpu.oracle import rename_tokens

    text = "abab abba baab aabb abab abba " * 20
    cps = _cps(text)
    cfg = check_config(BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3)), 20)
    uniq, cnt, data_len = preprocess.char_frequencies(cps)
    alphabet = preprocess.build_alphabet(uniq, cnt, data_len, 1.0, 4)
    used0 = len(alphabet.char2id) + 4
    buckets = preprocess.training_word_buckets(cps, alphabet)

    ref = train_stream.run_training_stream(buckets, used0, 20)

    os.environ["YTTM_TRAIN_DCAP"] = "16"  # every round overflows
    try:
        got = train_delta.run_training_delta(buckets, used0, 20)
    finally:
        del os.environ["YTTM_TRAIN_DCAP"]
    assert got == ref


def test_repack_invariance(monkeypatch):
    """Progressive stream re-packing (halving the padded M as merges
    shrink the live stream) must not change the rules: with the repack
    floor forced to the minimum, a run that re-packs several times is
    bit-identical to one that never does."""
    rng = random.Random(11)
    text = " ".join(
        "".join(rng.choice("abcd") for _ in range(rng.randint(2, 9)))
        for _ in range(600)
    )
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    monkeypatch.setenv("YTTM_TRAIN_REPACK", "0")
    base = _run_impl("delta", _cps(text), 120, cfg)
    monkeypatch.setenv("YTTM_TRAIN_REPACK", "1")
    monkeypatch.setenv("YTTM_TRAIN_REPACK_MIN", "16")
    # small segments so the host actually re-packs mid-run (with the
    # default single-segment run the slice never fires)
    monkeypatch.setenv("YTTM_TRAIN_PROGRESS", "8")
    packed = _run_impl("delta", _cps(text), 120, cfg)
    assert base.rules == packed.rules
    assert base.char2id == packed.char2id


@pytest.mark.parametrize("seed", range(3))
def test_block_equals_delta_random(seed):
    """v4 block-sparse trainer: identical rules to the delta trainer on
    run-heavy random corpora (exercises the block/full-path boundary,
    per-row compaction parity, and whole-block contribution
    cancellation)."""
    rng = random.Random(100 + seed)
    out = []
    while len(out) < 1500:
        if rng.randrange(2):
            out.append(rng.choice("abcd "))
        else:
            out.extend([rng.choice("abcd ")] * rng.randint(2, 6))
    text = "".join(out)
    vocab = 15 + rng.randrange(50)
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = _run_impl("delta", _cps(text), vocab, cfg)
    b = _run_impl("block", _cps(text), vocab, cfg)
    assert a.rules == b.rules
    assert a.char2id == b.char2id


def test_block_small_kb_forces_block_path(monkeypatch):
    """With KB forced tiny, late rounds take the gathered-block path
    and early rounds the full path; rules must still match delta."""
    rng = random.Random(5)
    text = " ".join(
        "".join(rng.choice("abc") for _ in range(rng.randint(2, 7)))
        for _ in range(400)
    )
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = _run_impl("delta", _cps(text), 80, cfg)
    monkeypatch.setenv("YTTM_TRAIN_KB", "4")
    b = _run_impl("block", _cps(text), 80, cfg)
    assert a.rules == b.rules


def test_block_matches_oracle_zipf():
    """Block trainer vs the pure-Python oracle on a Zipf corpus large
    enough that both kernel branches (full recount early, gathered
    blocks late) run with the production KB sizing."""
    rng = np.random.default_rng(13)
    letters = "abcdefghij"
    words = [
        "".join(rng.choice(list(letters), size=l))
        for l in np.clip(rng.poisson(5, 500), 2, 12)
    ]
    probs = 1.0 / np.arange(1, 501)
    probs /= probs.sum()
    text = " ".join(np.array(words, object)[rng.choice(500, 6000, p=probs)])
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = oracle_train(_cps(text), 200, cfg)
    b = _run_impl("block", _cps(text), 200, cfg)
    assert a.rules == b.rules
    assert a.char2id == b.char2id
