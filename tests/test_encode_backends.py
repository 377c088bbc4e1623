"""Every id-mode encode backend must agree with the oracle bit-exactly.

The Encoder routes ids through one of three backends (encoder.py:
_encode_backend): "native" (C++ tokenizer + device merge), "stream"
(fully device-resident flat pipeline, ops/stream_kernel.py), and
"matrix" (generic array pipeline).  The reference certifies its
parallel paths by equality against a slow oracle (stress_test.cpp:
420-434); this file does the same per backend, plus the pure-Python
fallbacks used when the native helpers are unavailable.
"""

import random

import numpy as np
import pytest

from youtokentome_tpu.encoder import Encoder
from youtokentome_tpu.host import fastio, fasttok
from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
from youtokentome_tpu.oracle import OracleEncoder, train_from_codepoints

BACKENDS = ["native", "stream", "matrix"]


@pytest.fixture(scope="module")
def model():
    rng = random.Random(5)
    text = "".join(
        rng.choice("aabbcd  ")
        if rng.randrange(3)
        else rng.choice("abcd") * rng.randint(2, 6)
        for _ in range(500)
    )
    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    cfg = BpeConfig(1.0, 1, SpecialTokens(0, 1, 2, 3))
    return train_from_codepoints(cps, len(set(text)) + 4 + 40, cfg)


def _sentences(seed, n=30):
    rng = random.Random(seed)
    out = [
        "".join(rng.choice("abcd XYZ") for _ in range(rng.randint(0, 50)))
        for _ in range(n)
    ]
    # edge rows: empties, single chars, unknown-only, long runs
    out += ["", " ", "a", "XYZ", "Q", "a" * 40, "dd d  ddd", "aXbXc QQc"]
    return out


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("seed", [0, 1])
def test_backend_matches_oracle(model, backend, seed, monkeypatch):
    monkeypatch.setenv("YTTM_ENCODE_BACKEND", backend)
    enc = Encoder(model)
    oracle = OracleEncoder(model)
    s = _sentences(seed)
    assert enc.encode(s, "id") == oracle.encode(s, "id")


@pytest.mark.parametrize("backend", BACKENDS)
def test_backend_flags(model, backend, monkeypatch):
    monkeypatch.setenv("YTTM_ENCODE_BACKEND", backend)
    enc = Encoder(model)
    oracle = OracleEncoder(model)
    s = _sentences(3, n=6)
    for bos, eos, rev in [(1, 0, 0), (0, 1, 0), (1, 1, 1)]:
        assert enc.encode(s, "id", bool(bos), bool(eos), bool(rev)) == oracle.encode(
            s, "id", bool(bos), bool(eos), bool(rev)
        )


def test_native_unavailable_falls_back(model, monkeypatch):
    """With the C++ tokenizer gone, the native backend must silently use
    the stream pipeline and stay bit-exact."""
    monkeypatch.setenv("YTTM_ENCODE_BACKEND", "native")
    monkeypatch.setattr(fasttok, "available", lambda: False)
    enc = Encoder(model)
    oracle = OracleEncoder(model)
    s = _sentences(11)
    assert enc.encode(s, "id") == oracle.encode(s, "id")


def test_fastio_python_fallback():
    """format_ids / parse_ids must roundtrip identically with and
    without the native _fastio.so."""
    flat = np.array([5, 7, 9, -7777, 12, -7777], np.int32)
    native = fastio.format_ids(flat, -7777)
    assert native == b"5 7 9 \n12 \n"
    # force the pure-Python branch
    import youtokentome_tpu.host.fastio as fio

    old_lib, old_tried = fio._lib, fio._tried
    fio._lib, fio._tried = None, True
    try:
        assert fio.format_ids(flat, -7777) == native
        assert np.array_equal(
            fio.parse_ids(b"5 7 9 \n12 \n", -7777),
            fastio.parse_ids(b"5 7 9 \n12 \n", -7777),
        )
    finally:
        fio._lib, fio._tried = old_lib, old_tried


def test_backend_newline_embedded_sentences(model, monkeypatch):
    """A sentence containing '\\n' must not take the joined fast path
    (it would split wrongly); all backends agree with the oracle."""
    oracle = OracleEncoder(model)
    s = ["ab\ncd", "a b"]
    want = oracle.encode(["ab\ncd".replace("\n", "\n"), "a b"], "id")
    for backend in BACKENDS:
        monkeypatch.setenv("YTTM_ENCODE_BACKEND", backend)
        enc = Encoder(model)
        assert enc.encode(s, "id") == want


def test_encode_stream_cli_pipelined_matches_sequential(model):
    """The pipelined chunked CLI path (tokenize k+1 overlapping merge k)
    must produce exactly the concatenation of per-chunk
    encode_text_cli outputs."""
    from youtokentome_tpu.encoder import Encoder

    state = model
    sentences = _sentences(9, 40)
    blob = ("\n".join(sentences) + "\n").encode()
    # small chunks to force several pipeline stages
    chunks = []
    start = 0
    while start < len(blob):
        end = min(start + 97, len(blob))
        nl = blob.rfind(b"\n", start, end)
        end = nl + 1 if nl >= start and end < len(blob) else end
        chunks.append(blob[start:end])
        start = end

    seq = b"".join(Encoder(state).encode_text_cli(c) for c in chunks)
    piped = b"".join(Encoder(state).encode_stream_cli(iter(chunks)))
    assert piped == seq

    # tiny word-cache cap: eviction mid-stream must stay correct
    enc3 = Encoder(state)
    enc3._wcache = None
    import os

    os.environ["YTTM_WORD_CACHE"] = "8"
    try:
        evicted = b"".join(enc3.encode_stream_cli(iter(chunks)))
    finally:
        os.environ.pop("YTTM_WORD_CACHE", None)
    assert evicted == seq


@pytest.mark.parametrize("arm", ["host", "device"])
def test_merge_dispatch_arms_match_oracle(model, arm, monkeypatch):
    """The encode dispatch crossover (encoder._merge_policy) must be
    invisible: the C++ host greedy merge (latency arm) and the batched
    device kernel (throughput arm) produce identical ids, both equal to
    the oracle (bpe.cpp:1560-1589 semantics)."""
    if not fasttok.available():
        pytest.skip("native helper unavailable")
    monkeypatch.setenv("YTTM_ENCODE_BACKEND", "native")
    monkeypatch.setenv("YTTM_ENCODE_MERGE", arm)
    enc = Encoder(model)
    oracle = OracleEncoder(model)
    s = _sentences(11)
    assert enc.encode(s, "id") == oracle.encode(s, "id")


def test_host_merge_words_matches_device(model, monkeypatch):
    """Direct differential of the two merge arms over one CLI chunk."""
    if not fasttok.available():
        pytest.skip("native helper unavailable")
    data = ("\n".join(_sentences(12)) + "\n").encode()
    monkeypatch.setenv("YTTM_ENCODE_BACKEND", "native")
    monkeypatch.setenv("YTTM_ENCODE_MERGE", "device")
    a = Encoder(model).encode_text_cli(data)
    monkeypatch.setenv("YTTM_ENCODE_MERGE", "host")
    b = Encoder(model).encode_text_cli(data)
    assert a == b


def test_dropout_native_path(model, monkeypatch):
    """BPE-dropout via the C++ per-occurrence merge: p=1 must equal the
    matrix path's p=1 (no merges at all), p=0 must equal greedy, and the
    same key must reproduce the same sample (the reference's unseeded
    shared-RNG race is fixed by explicit seeding)."""
    if not fasttok.available():
        pytest.skip("native helper unavailable")
    import jax

    monkeypatch.setenv("YTTM_ENCODE_BACKEND", "native")
    enc = Encoder(model)
    s = _sentences(21)
    p1 = enc.encode(s, "id", dropout_prob=1.0)
    monkeypatch.setenv("YTTM_DROPOUT_NATIVE", "0")
    assert p1 == enc.encode(s, "id", dropout_prob=1.0)
    monkeypatch.delenv("YTTM_DROPOUT_NATIVE")
    joined = ("\n".join(s) + "\n").encode()
    assert enc._encode_ids_dropout_native(
        joined, len(s), False, False, False, 0.0, None
    ) == enc.encode(s, "id")
    k = jax.random.PRNGKey(3)
    a = enc.encode(s, "id", dropout_prob=0.4, key=k)
    assert a == enc.encode(s, "id", dropout_prob=0.4, key=k)
    # every sampled id must decode back to the input (merge-or-not never
    # changes the surface string)
    from youtokentome_tpu.models.vocab import Vocabulary
    from youtokentome_tpu.oracle import OracleEncoder

    oracle = OracleEncoder(model)
    v = Vocabulary(model)
    ref = oracle.encode(s, "id")
    for row, rrow, sent in zip(a, ref, s):
        assert v.decode_ids(row) == v.decode_ids(rrow), sent


def test_native_training_buckets_match_numpy():
    """The C++ split+dedup training preprocessing must produce the same
    word multiset (and the same learned rules) as the numpy path, across
    charsets, run-heavy text, the meta-space char, and whitespace kinds;
    rare-char removal must fall back to the numpy path (word halves
    rejoin, bpe.cpp:357-380)."""
    if not fasttok.available():
        pytest.skip("native helper unavailable")
    import random as _random

    from youtokentome_tpu.host import preprocess

    def mk(text, native):
        cps = np.array([ord(c) for c in text], dtype=np.uint32)
        uniq, cnt, dl = preprocess.char_frequencies(cps)
        alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
        if native:
            return preprocess.training_word_buckets(cps, alpha), alpha
        orig = preprocess._native_word_buckets
        preprocess._native_word_buckets = lambda *a: None
        try:
            return preprocess.training_word_buckets(cps, alpha), alpha
        finally:
            preprocess._native_word_buckets = orig

    def multiset(buckets):
        out = {}
        for mat, cnt in buckets:
            for row, c in zip(mat, cnt):
                if c:
                    key = tuple(int(x) for x in row[row >= 0])
                    out[key] = out.get(key, 0) + int(c)
        return out

    rng = _random.Random(5)
    cases = [
        " ".join(
            "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 9)))
            for _ in range(1500)
        ),
        "".join(rng.choice("ab  ") for _ in range(2000)),
        " ".join(rng.choice(["мир", "日本", "abc", "ß", "x"]) for _ in range(400)),
        "a▁b c▁ ▁d",
        "a\tb\nc  d\r\ne",
    ]
    for text in cases:
        bn, _ = mk(text, True)
        bp, _ = mk(text, False)
        assert multiset(bn) == multiset(bp), text[:40]

    from youtokentome_tpu.ops.train_delta import run_training_delta

    cps = np.array([ord(c) for c in cases[0]], dtype=np.uint32)
    uniq, cnt, dl = preprocess.char_frequencies(cps)
    alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
    u = len(alpha.char2id) + 4
    bn, _ = mk(cases[0], True)
    bp, _ = mk(cases[0], False)
    assert run_training_delta(bn, u, 200) == run_training_delta(bp, u, 200)
