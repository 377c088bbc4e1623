"""Differential stress tests: our pure-Python oracle vs the *reference*
C++ implementation (compiled on demand from /root/reference).

Mirrors the reference's own stress strategy (stress_test.cpp:391-493):
seeded run-heavy random text over a tiny alphabet, random vocab size and
coverage, assert identical trained models and identical encodings.
"""

import os
import random

import pytest

from reference_oracle import build_refcli, ref_decode, ref_encode, ref_train
from youtokentome_tpu.models.state import BPEState, BpeConfig, SpecialTokens
from youtokentome_tpu.oracle import OracleEncoder, train as oracle_train

pytestmark = pytest.mark.skipif(
    build_refcli() is None, reason="reference toolchain unavailable"
)


def generate_text(rng: random.Random, n: int, alphabet: str) -> str:
    """Run-heavy random text like the reference's generate_text
    (stress_test.cpp:272-311): random chars mixed with repeated segments."""
    out = [alphabet[0]]
    while len(out) < n:
        if rng.randrange(2):
            out.append(rng.choice(alphabet))
        else:
            seg = [rng.choice(alphabet) for _ in range(rng.randint(1, 4))]
            out.extend(seg * rng.randint(2, 6))
    text = "".join(out[:n]).rstrip()
    return text if text else alphabet[0]


@pytest.mark.parametrize("seed", range(12))
def test_train_and_encode_match_reference(tmp_path, seed):
    rng = random.Random(seed)
    train_text = generate_text(rng, 800, "abc ")
    vocab_size = len(set(train_text) | {" "}) + 4 + rng.randrange(40)
    coverage = 1.0 if rng.randrange(3) == 0 else 1 - rng.random() * 0.4

    data = tmp_path / "train.txt"
    data.write_text(train_text)
    ref_model = tmp_path / "ref.yttm"
    ref_train(data, ref_model, vocab_size, coverage=coverage)

    cfg = BpeConfig(coverage, 1, SpecialTokens(0, 1, 2, 3))
    mine = oracle_train(str(data), None, vocab_size, cfg)
    ref = BPEState.load(str(ref_model))

    assert mine.char2id == ref.char2id
    assert [tuple(r) for r in mine.rules] == [tuple(r) for r in ref.rules]

    # encoding (alphabet includes 'd' unseen in training -> unknown runs)
    sentences = [generate_text(rng, 60, "abcd ") for _ in range(20)]
    sentences += ["", "   ", "ddd", "a d a"]
    enc = OracleEncoder(mine)
    assert enc.encode(sentences, "id") == ref_encode(ref_model, sentences, "id")
    assert enc.encode(sentences, "subword") == ref_encode(
        ref_model, sentences, "subword"
    )


def test_bos_eos_reverse_match_reference(tmp_path):
    rng = random.Random(123)
    train_text = generate_text(rng, 600, "abc ")
    data = tmp_path / "train.txt"
    data.write_text(train_text)
    ref_model = tmp_path / "ref.yttm"
    ref_train(data, ref_model, 40)
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    mine = oracle_train(str(data), None, 40, cfg)
    enc = OracleEncoder(mine)
    sentences = [generate_text(rng, 50, "abcd ") for _ in range(8)]
    for bos in (False, True):
        for eos in (False, True):
            for rev in (False, True):
                assert enc.encode(sentences, "id", bos, eos, rev) == ref_encode(
                    ref_model, sentences, "id", bos, eos, rev
                )


def test_decode_matches_reference(tmp_path):
    rng = random.Random(5)
    train_text = generate_text(rng, 600, "abc ")
    data = tmp_path / "train.txt"
    data.write_text(train_text)
    ref_model = tmp_path / "ref.yttm"
    ref_train(data, ref_model, 40)
    from youtokentome_tpu.models.vocab import Vocabulary

    state = BPEState.load(str(ref_model))
    vocab = Vocabulary(state)
    enc = OracleEncoder(state)
    sentences = [generate_text(rng, 50, "abc ") for _ in range(10)]
    id_lines = enc.encode(sentences, "id")
    ref_out = ref_decode(ref_model, id_lines)
    mine_out = [vocab.decode_ids(ids) for ids in id_lines]
    assert mine_out == ref_out


def test_vocab_matches_reference(tmp_path):
    rng = random.Random(9)
    train_text = generate_text(rng, 600, "abc ")
    data = tmp_path / "train.txt"
    data.write_text(train_text)
    ref_model = tmp_path / "ref.yttm"
    ref_train(data, ref_model, 30)
    import subprocess

    from reference_oracle import BINARY

    res = subprocess.run(
        [str(BINARY), "vocab", str(ref_model)], capture_output=True, check=True
    )
    ref_vocab = [
        line.split("\t")[1]
        for line in res.stdout.decode().strip("\n").split("\n")
    ]
    from youtokentome_tpu.models.vocab import Vocabulary

    vocab = Vocabulary(BPEState.load(str(ref_model)))
    assert vocab.vocabulary() == ref_vocab


def test_zero_id_head_emission_quirk(tmp_path):
    """When custom special ids leave id 0 unclaimed, ▁ gets id 0 and the
    reference's emission scan (find_if token_id != 0, bpe.cpp:1591-1593)
    silently drops an unmerged word-leading ▁ — e.g. before an
    unknown-char run.  Both the oracle and the production Encoder must
    reproduce this."""
    rng = random.Random(1000)
    train_text = generate_text(rng, 700, "abc ")
    data = tmp_path / "train.txt"
    data.write_text(train_text)
    ref_model = tmp_path / "ref.yttm"
    # pad=15 unk=5 bos=1 eos=13: no special claims id 0 -> ▁ gets 0
    ref_train(data, ref_model, 52, pad=15, unk=5, bos=1, eos=13)
    cfg = BpeConfig(1.0, 1, SpecialTokens(15, 5, 1, 13))
    mine = oracle_train(str(data), None, 52, cfg)
    ref = BPEState.load(str(ref_model))
    assert mine.char2id == ref.char2id
    assert [tuple(r) for r in mine.rules] == [tuple(r) for r in ref.rules]
    assert mine.char2id[ord("▁")] == 0  # the quirk precondition

    sentences = ["zca zc z c a", "ac cc", "zzz", "", "a z za az"]
    want = ref_encode(ref_model, sentences, "id")
    enc = OracleEncoder(mine)
    assert enc.encode(sentences, "id") == want
    assert enc.encode(sentences, "subword") == ref_encode(
        ref_model, sentences, "subword"
    )

    from youtokentome_tpu.encoder import Encoder

    for backend in ("native", "stream", "matrix"):
        os.environ["YTTM_ENCODE_BACKEND"] = backend
        try:
            assert Encoder(mine).encode(sentences, "id") == want, backend
        finally:
            os.environ.pop("YTTM_ENCODE_BACKEND", None)
