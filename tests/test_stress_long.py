"""Long-mode differential stress: the production DEVICE pipeline vs the
compiled reference, at volume.

The CI default runs a handful of seeds (test_oracle_vs_reference.py,
test_device_train.py); this file is the analog of the reference's
``./stress base 1000`` (test_stress.py:36-38, stress_test.cpp:391-493)
— hundreds of seeded iterations over randomized alphabets (run-heavy
ASCII, Cyrillic UTF-8, spaceless CJK), coverage, vocab sizes and
custom special-token ids, asserting the trained model AND the encoded
ids are identical to the reference every time.

Gated off by default (it takes minutes):

    YTTM_STRESS=1 python -m pytest tests/test_stress_long.py -q
    YTTM_STRESS_ITERS=500 ...   # default 200

Vocab sizes are quantized to multiples of 16 so the device trainer's
statically-shaped programs compile once per size, not per iteration.
"""

import os
import random

import numpy as np
import pytest

from reference_oracle import build_refcli, ref_encode, ref_train
from youtokentome_tpu.models.state import BPEState, BpeConfig, SpecialTokens
from youtokentome_tpu.train import train_from_codepoints

pytestmark = [
    pytest.mark.skipif(
        os.environ.get("YTTM_STRESS", "0") != "1",
        reason="long stress mode: set YTTM_STRESS=1",
    ),
    pytest.mark.skipif(
        build_refcli() is None, reason="reference toolchain unavailable"
    ),
]

ALPHABETS = [
    "abc ",                     # the reference's own stress alphabet
    "ab ",                      # heavier runs / deeper merges
    "абвг ",                    # Cyrillic (2-byte UTF-8)
    "你好世界 ",                 # CJK with spaces
    "日本語テスト",              # spaceless CJK (single giant word per line)
    "abc▁ ",               # text containing the space-marker char
]


def generate_text(rng: random.Random, n: int, alphabet: str) -> str:
    out = [alphabet[0]]
    while len(out) < n:
        if rng.randrange(2):
            out.append(rng.choice(alphabet))
        else:
            seg = [rng.choice(alphabet) for _ in range(rng.randint(1, 4))]
            out.extend(seg * rng.randint(2, 6))
    text = "".join(out[:n]).rstrip()
    return text if text else alphabet[0]


def _iterations():
    return int(os.environ.get("YTTM_STRESS_ITERS", "200"))


def test_stress_device_vs_reference(tmp_path):
    n_iter = _iterations()
    failures = []
    for it in range(n_iter):
        if it and it % 25 == 0:
            # this jax build's XLA:CPU compiler segfaults intermittently
            # after many compilations accumulate in one process (seen at
            # compile sites of unrelated, individually-fine programs);
            # dropping the in-process executable caches periodically
            # bounds that state at the cost of recompiling the small
            # shared programs
            import jax

            jax.clear_caches()
        rng = random.Random(1000 + it)
        alphabet = ALPHABETS[it % len(ALPHABETS)]
        text = generate_text(rng, rng.randint(200, 900), alphabet)
        n_chars = len(set(text) | {" "})
        # vocab_size is a static jit argument: draw from a SMALL fixed
        # set so programs are shared across iterations (XLA's CPU
        # compiler has crashed under hundreds of distinct compilations
        # in one process; fewer shapes is also simply faster)
        vocab = 16 * rng.randint(3, 7)
        coverage = 1.0 if rng.randrange(3) == 0 else 1 - rng.random() * 0.4
        # random special-id arrangement (the reference renames ids,
        # bpe.cpp:814-837); keep them distinct and inside the vocab
        ids = rng.sample(range(min(vocab, 20)), 4)
        pad, unk, bos, eos = ids

        data = tmp_path / f"t{it}.txt"
        data.write_text(text)
        ref_model = tmp_path / f"r{it}.yttm"
        try:
            ref_train(data, ref_model, vocab, coverage=coverage,
                      pad=pad, unk=unk, bos=bos, eos=eos)
        except AssertionError:
            raise
        except Exception:
            # reference rejected the config (e.g. vocab too small for
            # the alphabet at this coverage) — mirror-check ours rejects
            # too, then move on
            with pytest.raises(ValueError):
                cfg = BpeConfig(coverage, 1, SpecialTokens(pad, unk, bos, eos))
                cps = np.array([ord(c) for c in text], dtype=np.uint32)
                train_from_codepoints(cps, vocab, cfg)
            continue

        cfg = BpeConfig(coverage, 1, SpecialTokens(pad, unk, bos, eos))
        cps = np.array([ord(c) for c in text], dtype=np.uint32)
        mine = train_from_codepoints(cps, vocab, cfg)
        ref = BPEState.load(str(ref_model))
        if mine.char2id != ref.char2id or (
            [tuple(r) for r in mine.rules] != [tuple(r) for r in ref.rules]
        ):
            failures.append((it, "model"))
            continue

        # encode through the production Encoder (alphabet extended by a
        # char unseen in training -> unknown-run collapse)
        from youtokentome_tpu.encoder import Encoder

        sentences = [
            generate_text(rng, rng.randint(10, 80), alphabet + "z")
            for _ in range(12)
        ] + ["", "   ", "zzz"]
        enc = Encoder(mine)
        got = enc.encode(sentences, "id")
        want = ref_encode(ref_model, sentences, "id")
        if got != want:
            failures.append((it, "encode"))
    assert not failures, f"{len(failures)}/{n_iter} iterations diverged: {failures[:10]}"
