"""Device encode kernel vs the pure-Python oracle (and transitively the
reference, via test_oracle_vs_reference)."""

import random

import numpy as np
import pytest

from youtokentome_tpu.encoder import Encoder
from youtokentome_tpu.models.state import BPEState, BpeConfig, SpecialTokens
from youtokentome_tpu.oracle import OracleEncoder, train_from_codepoints


def _train_model(seed=0, vocab_extra=35, text_len=700, coverage=1.0):
    rng = random.Random(seed)
    text = "".join(
        rng.choice("aabbc  ") if rng.randrange(3) else rng.choice("abc") * rng.randint(2, 6)
        for _ in range(text_len // 2)
    )
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    vocab = len(set(text)) + 4 + vocab_extra
    cfg = BpeConfig(coverage, 1, SpecialTokens(0, 1, 2, 3))
    return train_from_codepoints(cps, vocab, cfg)


@pytest.fixture(scope="module")
def model():
    return _train_model()


@pytest.fixture(scope="module")
def encoders(model):
    return Encoder(model), OracleEncoder(model)


def _sentences(seed, n=25, ln=60, alphabet="abcd "):
    rng = random.Random(seed)
    out = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, ln)))
        for _ in range(n)
    ]
    out += ["", " ", "ddd d dd", "a", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"]
    return out


@pytest.mark.parametrize("seed", range(4))
def test_ids_match_oracle(encoders, seed):
    device, oracle = encoders
    s = _sentences(seed)
    assert device.encode(s, "id") == oracle.encode(s, "id")


def test_subwords_match_oracle(encoders):
    device, oracle = encoders
    s = _sentences(99)
    assert device.encode(s, "subword") == oracle.encode(s, "subword")


def test_flags_match_oracle(encoders):
    device, oracle = encoders
    s = _sentences(7, n=6)
    for bos in (False, True):
        for eos in (False, True):
            for rev in (False, True):
                assert device.encode(s, "id", bos, eos, rev) == oracle.encode(
                    s, "id", bos, eos, rev
                )


def test_long_words_host_fallback(encoders):
    device, oracle = encoders
    s = ["a" * 2000 + " " + "ab" * 700, "b" * 513]
    assert device.encode(s, "id") == oracle.encode(s, "id")


def test_cache_consistency(model):
    enc = Encoder(model)
    s = _sentences(3)
    first = enc.encode(s, "id")
    second = enc.encode(s, "id")  # cache-hit path
    assert first == second


def test_dropout_one_splits_to_chars(encoders, model):
    device, _ = encoders
    s = ["abc ab a"]
    out = device.encode(s, "id", dropout_prob=1.0)
    # dropout=1: every candidate always skipped -> pure character split
    # (DropoutQueue returns false immediately, bpe.cpp:1428-1452)
    space = model.char2id[9601]
    expected_len = sum(len(w) + 1 for w in s[0].split())
    assert len(out[0]) == expected_len
    assert out[0][0] == space


def test_dropout_roundtrip_decodes(model):
    from youtokentome_tpu.models.vocab import Vocabulary

    enc = Encoder(model)
    vocab = Vocabulary(model)
    s = ["abc ab cab baca", "aaa bbb ccc"]
    import jax

    for p in (0.3, 0.7):
        out = enc.encode(s, "id", dropout_prob=p, key=jax.random.PRNGKey(0))
        assert [vocab.decode_ids(ids) for ids in out] == s


def test_unknown_runs_collapse(model):
    enc = Encoder(model)
    oracle = OracleEncoder(model)
    s = ["aXYZb cQc", "XYZ", "aXbXc"]
    assert enc.encode(s, "id") == oracle.encode(s, "id")
    assert enc.encode(s, "subword") == oracle.encode(s, "subword")


def test_coverage_model_encode(seed=11):
    model = _train_model(seed=seed, coverage=0.85)
    device = Encoder(model)
    oracle = OracleEncoder(model)
    s = _sentences(seed)
    assert device.encode(s, "id") == oracle.encode(s, "id")
    assert device.encode(s, "subword") == oracle.encode(s, "subword")


def test_u16_wire_kernel_matches_int32():
    """The uint16 wire-format kernel (pack -> merge -> pack) must agree
    with the int32 kernel up to the documented mapping (PAD -> 0xFFFF,
    placeholders -> unk).  The packed path is TPU-only in production
    (transfer optimization); this pins its semantics on CPU."""
    import numpy as np

    from youtokentome_tpu.models.state import BPEState, SpecialTokens
    from youtokentome_tpu.ops.encode_kernel import (
        PLACEHOLDER_START,
        U16_PAD,
        EncoderTables,
        _encode_greedy,
        _encode_greedy_u16,
        pack_tokens_u16,
    )

    st = BPEState(
        char2id={97: 4, 98: 5, 99: 6},
        rules=[(4, 5, 7), (7, 6, 8), (5, 5, 9)],
        special_tokens=SpecialTokens(0, 1, 2, 3),
    )
    tab = EncoderTables(st)
    rng = np.random.default_rng(3)
    mat = np.full((64, 16), -1, np.int32)
    for i in range(64):
        ln = int(rng.integers(1, 15))
        row = rng.choice([4, 5, 6], size=ln)
        # sprinkle placeholder runs
        if i % 5 == 0 and ln > 2:
            row[1] = PLACEHOLDER_START
        mat[i, :ln] = row
    ref = np.asarray(_encode_greedy(tab, mat))
    unk = 1
    got = np.asarray(_encode_greedy_u16(tab, pack_tokens_u16(mat), np.int32(unk)))
    exp = np.where(ref < 0, U16_PAD, np.where(ref >= PLACEHOLDER_START, unk, ref))
    np.testing.assert_array_equal(got.astype(np.int64), exp.astype(np.int64))
