"""Device-count invariance: the TPU analog of the reference's
thread-count invariance test (stress_test.cpp:351-389).  Training and
encoding must be bit-identical at 1, 2 and 8 devices."""

import random

import numpy as np
import pytest

from youtokentome_tpu.host import preprocess
from youtokentome_tpu.models.state import BPEState, SpecialTokens
from youtokentome_tpu.oracle import rename_tokens
from youtokentome_tpu.ops.train_kernel import run_training
from youtokentome_tpu.parallel.encode_sharded import encode_batch_sharded
from youtokentome_tpu.parallel.mesh import data_mesh
from youtokentome_tpu.parallel.train_sharded import run_training_sharded


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(0)
    text = "".join(
        rng.choice("abc ") if rng.randrange(2) else rng.choice("abc") * rng.randint(2, 5)
        for _ in range(400)
    )
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    uniq, cnt, dl = preprocess.char_frequencies(cps)
    alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
    buckets = preprocess.training_word_buckets(cps, alpha)
    used0 = len(alpha.char2id) + 4
    return cps, alpha, buckets, used0


def test_train_device_count_invariance(corpus):
    _, _, buckets, used0 = corpus
    single = run_training(buckets, used0, 30)
    for n in (1, 2, 8):
        sharded = run_training_sharded(buckets, used0, 30, data_mesh(n))
        assert sharded == single, f"mismatch at n_devices={n}"


def test_stream_train_device_count_invariance(corpus):
    from youtokentome_tpu.ops.train_stream import run_training_stream
    from youtokentome_tpu.parallel.train_stream_sharded import (
        run_training_stream_sharded,
    )

    _, _, buckets, used0 = corpus
    single = run_training_stream(buckets, used0, 30)
    for n in (1, 2, 8):
        sharded = run_training_stream_sharded(buckets, used0, 30, data_mesh(n))
        assert sharded == single, f"mismatch at n_devices={n}"


def test_encode_device_count_invariance(corpus):
    from youtokentome_tpu.encoder import Encoder
    from youtokentome_tpu.ops.encode_kernel import encode_batch

    _, alpha, buckets, used0 = corpus
    rules = run_training(buckets, used0, 30)
    char2id, renamed = rename_tokens(alpha.char2id, rules, SpecialTokens(0, 1, 2, 3), 30)
    state = BPEState(char2id=char2id, rules=renamed,
                     special_tokens=SpecialTokens(0, 1, 2, 3))
    enc = Encoder(state)
    rng = np.random.default_rng(1)
    ids = np.asarray(enc._sorted_ids)
    tokens = np.full((64, 12), -1, dtype=np.int32)
    for i in range(64):
        ln = int(rng.integers(1, 11))
        tokens[i, 0] = enc.space_id
        tokens[i, 1 : 1 + ln] = rng.choice(ids, size=ln)
    base = encode_batch(enc.tables, tokens)
    for n in (1, 2, 8):
        out = encode_batch_sharded(enc.tables, tokens, data_mesh(n))
        np.testing.assert_array_equal(out, base)


def test_sparse_train_device_count_invariance(corpus):
    """The v3 sparse sharded trainer (YTTM_TRAIN_IMPL=sparse) must be
    bit-identical at 1/2/8 devices."""
    from youtokentome_tpu.ops.train_sparse import run_training_sparse
    from youtokentome_tpu.parallel.train_sparse_sharded import (
        run_training_sparse_sharded,
    )

    _, _, buckets, used0 = corpus
    single = run_training_sparse(buckets, used0, 30)
    for n in (1, 2, 8):
        sharded = run_training_sparse_sharded(buckets, used0, 30, data_mesh(n))
        assert sharded == single, f"mismatch at n_devices={n}"


def test_delta_train_device_count_invariance(corpus):
    """The PRODUCTION trainer (v2 delta, the auto multi-device impl)
    must be bit-identical at 1/2/8 devices — this is the path
    dryrun_multichip certifies."""
    from youtokentome_tpu.ops.train_delta import run_training_delta
    from youtokentome_tpu.parallel.train_delta_sharded import (
        run_training_delta_sharded,
    )

    _, _, buckets, used0 = corpus
    single = run_training_delta(buckets, used0, 30)
    for n in (1, 2, 8):
        sharded = run_training_delta_sharded(buckets, used0, 30, data_mesh(n))
        assert sharded == single, f"mismatch at n_devices={n}"


def test_production_train_dispatch_sharded(corpus, monkeypatch):
    """BPE.train's pipeline (train_from_codepoints) must route through
    the sharded trainer on a multi-device host and produce rules
    bit-identical to the single-device path (the reference parallelizes
    by default, bpe.cpp:864-873)."""
    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.train import train_from_codepoints

    cps, _, _, _ = corpus
    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
    # force the dispatch threshold below the tiny corpus size
    monkeypatch.setenv("YTTM_SHARD_MIN_TOKENS", "1")
    import youtokentome_tpu.train as train_mod

    called = {}
    orig = train_mod.run_training_delta_sharded

    def spy(buckets, used0, vs, mesh, **kw):
        called["n_dev"] = mesh.devices.size
        return orig(buckets, used0, vs, mesh, **kw)

    monkeypatch.setattr(train_mod, "run_training_delta_sharded", spy)
    sharded_state = train_from_codepoints(cps, 30, cfg)
    assert called.get("n_dev") == 8  # all virtual devices used by default

    monkeypatch.setenv("YTTM_DEVICES", "1")
    single_state = train_from_codepoints(cps, 30, cfg)
    assert sharded_state.rules == single_state.rules
    assert sharded_state.char2id == single_state.char2id


def test_production_encode_dispatch_sharded(corpus, monkeypatch):
    """Encoder.encode must route device merges through the data mesh on
    a multi-device host (encode threads default to hardware_concurrency
    in the reference, bpe.cpp:1638-1640) with bit-identical ids."""
    from youtokentome_tpu.encoder import Encoder

    _, alpha, buckets, used0 = corpus
    rules = run_training(buckets, used0, 30)
    char2id, renamed = rename_tokens(
        alpha.char2id, rules, SpecialTokens(0, 1, 2, 3), 30
    )
    state = BPEState(char2id=char2id, rules=renamed,
                     special_tokens=SpecialTokens(0, 1, 2, 3))
    rng = random.Random(7)
    sents = [
        "".join(rng.choice("abc ") for _ in range(40)) for _ in range(50)
    ]
    for backend in ("native", "stream"):
        monkeypatch.setenv("YTTM_ENCODE_BACKEND", backend)
        enc = Encoder(state)
        assert enc._get_mesh() is not None  # 8 virtual devices -> mesh on
        sharded = enc.encode(sents, "id")
        monkeypatch.setenv("YTTM_DEVICES", "1")
        enc1 = Encoder(state)
        assert enc1._get_mesh() is None
        single = enc1.encode(sents, "id")
        monkeypatch.delenv("YTTM_DEVICES")
        assert sharded == single, f"backend={backend}"


def test_sparse_sharded_tiny_dcap_forces_recount(corpus):
    """A tiny dcap drives every round through the global-recount fold;
    results must not change (delta and recount paths are equivalent)."""
    import os

    from youtokentome_tpu.ops.train_sparse import run_training_sparse
    from youtokentome_tpu.parallel.train_sparse_sharded import (
        run_training_sparse_sharded,
    )

    _, _, buckets, used0 = corpus
    single = run_training_sparse(buckets, used0, 26)
    # dcap is floored at pcap/2 (recount-fold correctness), so forcing
    # recounts needs a small pcap too; overflow retries re-grow it
    old = {k: os.environ.get(k) for k in ("YTTM_TRAIN_DCAP", "YTTM_TRAIN_PCAP")}
    os.environ["YTTM_TRAIN_DCAP"] = "128"
    os.environ["YTTM_TRAIN_PCAP"] = "256"
    try:
        sharded = run_training_sparse_sharded(buckets, used0, 26, data_mesh(2))
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert sharded == single
