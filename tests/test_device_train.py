"""Device trainer (ops/train_kernel) vs the pure-Python oracle."""

import random

import numpy as np
import pytest

from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
from youtokentome_tpu.oracle import train_from_codepoints as oracle_train
from youtokentome_tpu.train import train_from_codepoints as device_train


def _text(seed, n=600, alphabet="abc "):
    rng = random.Random(seed)
    out = [alphabet[0]]
    while len(out) < n:
        if rng.randrange(2):
            out.append(rng.choice(alphabet))
        else:
            seg = [rng.choice(alphabet) for _ in range(rng.randint(1, 4))]
            out.extend(seg * rng.randint(2, 5))
    return "".join(out[:n])


def _cps(text):
    return np.array([ord(c) for c in text], dtype=np.uint32)


@pytest.mark.parametrize("seed", range(3))
def test_matches_oracle(seed):
    rng = random.Random(seed + 1000)
    text = _text(seed)
    vocab = len(set(text)) + 4 + rng.randrange(30)
    coverage = 1.0 if rng.randrange(2) else 1 - rng.random() * 0.4
    cfg = BpeConfig(coverage, 1, SpecialTokens(0, 1, 2, 3))
    a = oracle_train(_cps(text), vocab, cfg)
    b = device_train(_cps(text), vocab, cfg)
    assert a.char2id == b.char2id
    assert a.rules == b.rules


def test_custom_special_ids():
    text = _text(42)
    cfg = BpeConfig(1.0, 1, SpecialTokens(pad_id=0, unk_id=7, bos_id=5, eos_id=11))
    a = oracle_train(_cps(text), 30, cfg)
    b = device_train(_cps(text), 30, cfg)
    assert a.char2id == b.char2id
    assert a.rules == b.rules


def test_early_stop_warning():
    # tiny corpus, huge vocab -> fewer merges than requested
    text = "ab ab ab"
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = oracle_train(_cps(text), 500, cfg)
    b = device_train(_cps(text), 500, cfg)
    assert a.rules == b.rules
    assert len(b.rules) < 500


def test_vocab_too_small_raises():
    text = "abcdefgh abcdefgh"
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    with pytest.raises(ValueError, match="vocab_size"):
        device_train(_cps(text), 5, cfg)


def test_run_heavy_equal_pairs():
    # exercises the floor(run/2) counting and x==y merge cases
    text = "aaaa aaaaaa aa aaa bbbb abab aabb"
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = oracle_train(_cps(text), 12, cfg)
    b = device_train(_cps(text), 12, cfg)
    assert a.rules == b.rules
