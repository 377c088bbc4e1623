"""Multi-host training: 2 jax.distributed processes (2 CPU devices
each, 4 global) must produce rules bit-identical to single-process
training on the concatenated corpus — the cross-host analog of the
thread-count invariance test (stress_test.cpp:351-389) and SURVEY §2
row 4's ICI/DCN count-reduction requirement."""

import json
import os
import random
import socket
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from youtokentome_tpu.parallel import distributed as dist
pcap = %(pcap)d
if pcap:
    os.environ["YTTM_TRAIN_PCAP"] = str(pcap)
dist.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
text = %(text)r
# split at a word boundary near the middle (the caller's contract)
half = text.find(" ", len(text) // 2) + 1
local = text[:half] if pid == 0 else text[half:]
cps = np.array([ord(c) for c in local], dtype=np.uint32)
from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
state = dist.train_from_codepoints_distributed(cps, %(vocab)d, cfg)
with open(out_path, "w") as f:
    json.dump({"rules": state.rules,
               "char2id": sorted(state.char2id.items())}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_training_matches_single(tmp_path):
    rng = random.Random(3)
    text = "".join(
        rng.choice("abc ") if rng.randrange(2) else rng.choice("abc") * rng.randint(2, 4)
        for _ in range(500)
    )
    vocab = 30

    # single-process ground truth (in-process, the production trainer)
    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.train import train_from_codepoints

    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
    single = train_from_codepoints(cps, vocab, cfg)

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"repo": REPO, "text": text, "vocab": vocab, "pcap": 0})
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"out{p}.json") for p in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(p), str(port), outs[p]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for p in range(2)
    ]
    for p, proc in enumerate(procs):
        try:
            _, err = proc.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert proc.returncode == 0, f"worker {p} failed:\n{err.decode()[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    assert results[0] == results[1], "hosts disagree on the model"
    got_rules = [tuple(r) for r in results[0]["rules"]]
    assert got_rules == single.rules
    assert dict((int(k), int(v)) for k, v in results[0]["char2id"]) == {
        int(k): int(v) for k, v in single.char2id.items()
    }


def test_two_process_overflow_retry(tmp_path):
    """A pair-table overflow mid-run must double-and-retry, not burn the
    job (the single-host drivers' contract, train_delta.py): pcap is
    pinned to the INITIAL pair-kind count so the early growth overflows,
    and the retried run must still match single-process training."""
    rng = random.Random(7)
    text = "".join(
        rng.choice("abcde ") if rng.randrange(2) else rng.choice("abcde") * rng.randint(2, 4)
        for _ in range(800)
    )
    vocab = 60

    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.train import train_from_codepoints

    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
    single = train_from_codepoints(cps, vocab, cfg)

    # pin pcap to next_pow2(initial pair kinds): any kind growth overflows
    from youtokentome_tpu.host import preprocess
    from youtokentome_tpu.ops.train_delta import _next_pow2, host_count_table
    from youtokentome_tpu.ops.train_stream import flatten_word_buckets

    uniq, cnt, dl = preprocess.char_frequencies(cps)
    alpha = preprocess.build_alphabet(uniq, cnt, dl, 1.0, 4)
    t, wid, freq = flatten_word_buckets(
        preprocess.training_word_buckets(cps, alpha)
    )
    uk, _ = host_count_table(t, wid, freq)
    pcap = _next_pow2(uk.size)

    worker = tmp_path / "worker.py"
    worker.write_text(
        WORKER % {"repo": REPO, "text": text, "vocab": vocab, "pcap": pcap}
    )
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"out{p}.json") for p in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(p), str(port), outs[p]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for p in range(2)
    ]
    errs = []
    for p, proc in enumerate(procs):
        try:
            _, err = proc.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err.decode())
        assert proc.returncode == 0, f"worker {p} failed:\n{errs[-1][-3000:]}"

    assert "pair-count table overflow: retrying" in errs[0], (
        "overflow retry never triggered; shrink pcap in this test:\n"
        + errs[0][-2000:]
    )
    results = [json.load(open(o)) for o in outs]
    assert results[0] == results[1]
    assert [tuple(r) for r in results[0]["rules"]] == single.rules
