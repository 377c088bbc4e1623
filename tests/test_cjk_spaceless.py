"""Spaceless (CJK-style) corpora: whole lines become single words, which
stresses long-word bucketing, the host-merge fallback, and multi-byte
UTF-8 throughout training and all encode backends."""

import random

import numpy as np
import pytest

from youtokentome_tpu.encoder import Encoder
from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
from youtokentome_tpu.oracle import OracleEncoder, train_from_codepoints


def _cjk_text(rng, n_lines=30, line_len=(20, 120)):
    # a small CJK-ish alphabet (and no spaces within lines)
    alphabet = [chr(c) for c in range(0x65E5, 0x65E5 + 12)] + [
        chr(c) for c in range(0x30A2, 0x30A2 + 6)
    ]
    lines = []
    for _ in range(n_lines):
        ln = rng.randint(*line_len)
        lines.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return lines


@pytest.fixture(scope="module")
def model_and_lines():
    rng = random.Random(0)
    lines = _cjk_text(rng)
    corpus = "\n".join(lines) + "\n"
    cps = np.array([ord(c) for c in corpus], dtype=np.uint32)
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    state = train_from_codepoints(cps, 120, cfg)
    return state, lines


def test_device_train_matches_oracle_spaceless():
    from youtokentome_tpu.train import train_from_codepoints as device_train

    rng = random.Random(7)
    corpus = "\n".join(_cjk_text(rng, n_lines=20, line_len=(10, 60))) + "\n"
    cps = np.array([ord(c) for c in corpus], dtype=np.uint32)
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    a = train_from_codepoints(cps, 80, cfg)
    b = device_train(cps, 80, cfg)
    assert a.char2id == b.char2id
    assert a.rules == b.rules


def test_encode_matches_oracle_spaceless(model_and_lines):
    state, lines = model_and_lines
    rng = random.Random(1)
    test_lines = _cjk_text(rng, n_lines=15, line_len=(5, 200))
    enc = Encoder(state)
    oracle = OracleEncoder(state)
    assert enc.encode(test_lines, "id") == oracle.encode(test_lines, "id")
    assert enc.encode(test_lines, "subword") == oracle.encode(test_lines, "subword")


def test_monster_line_spaceless(model_and_lines):
    state, _ = model_and_lines
    rng = random.Random(2)
    monster = "".join(rng.choice("日月火水") for _ in range(3000))
    enc = Encoder(state)
    oracle = OracleEncoder(state)
    assert enc.encode([monster], "id") == oracle.encode([monster], "id")


def test_coverage_on_spaceless():
    from youtokentome_tpu.train import train_from_codepoints as device_train

    rng = random.Random(3)
    corpus = "\n".join(_cjk_text(rng, n_lines=25, line_len=(10, 50))) + "\n"
    cps = np.array([ord(c) for c in corpus], dtype=np.uint32)
    cfg = BpeConfig(0.95, 1, SpecialTokens(0, 1, 2, 3))
    a = train_from_codepoints(cps, 60, cfg)
    b = device_train(cps, 60, cfg)
    assert a.char2id == b.char2id
    assert a.rules == b.rules
    enc = Encoder(b)
    oracle = OracleEncoder(a)
    lines = _cjk_text(rng, n_lines=10, line_len=(5, 80))
    assert enc.encode(lines, "id") == oracle.encode(lines, "id")
