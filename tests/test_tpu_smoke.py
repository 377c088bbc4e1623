"""Opt-in real-TPU smoke test (YTTM_TEST_TPU=1).

The CI suite deliberately pins the CPU backend with 8 virtual devices
(tests/conftest.py) for determinism and sharding coverage — which means
a TPU-specific numeric or layout bug would only surface in the bench.
This test closes that hole: it spawns a subprocess WITHOUT the CPU pin,
trains on the real device platform and asserts bit-identical rules and
encodings vs the in-process CPU run.

    YTTM_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import json
import os
import random
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("YTTM_TEST_TPU", "0") != "1",
    reason="real-TPU smoke: set YTTM_TEST_TPU=1",
)

WORKER = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
# no JAX_PLATFORMS pin: the ambient platform (TPU when present) is used
os.environ.pop("JAX_PLATFORMS", None)
import numpy as np
import jax
from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
from youtokentome_tpu.train import train_from_codepoints
from youtokentome_tpu.encoder import Encoder
text = %(text)r
cps = np.array([ord(c) for c in text], dtype=np.uint32)
cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
state = train_from_codepoints(cps, %(vocab)d, cfg)
enc = Encoder(state)
ids = enc.encode(%(sents)r, "id")
print(json.dumps({
    "platform": jax.devices()[0].platform,
    "rules": state.rules,
    "ids": ids,
}))
"""


def test_tpu_matches_cpu(tmp_path):
    rng = random.Random(11)
    text = "".join(
        rng.choice("abcd ") if rng.randrange(2) else rng.choice("abcd") * rng.randint(2, 4)
        for _ in range(600)
    )
    sents = ["".join(rng.choice("abcde ") for _ in range(40)) for _ in range(10)]
    vocab = 48

    # CPU ground truth (this process is already pinned to CPU)
    from youtokentome_tpu.encoder import Encoder
    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.train import train_from_codepoints

    cps = np.array([ord(c) for c in text], dtype=np.uint32)
    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
    state = train_from_codepoints(cps, vocab, cfg)
    want_ids = Encoder(state).encode(sents, "id")

    worker = tmp_path / "tpu_worker.py"
    worker.write_text(WORKER % {
        "repo": REPO, "text": text, "vocab": vocab, "sents": sents,
    })
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yttm")
    res = subprocess.run(
        [sys.executable, str(worker)], env=env,
        capture_output=True, timeout=1200,
    )
    assert res.returncode == 0, res.stderr.decode()[-3000:]
    out = json.loads(res.stdout.decode().strip().split("\n")[-1])
    print(f"device platform: {out['platform']}", file=sys.stderr)
    assert [tuple(r) for r in out["rules"]] == state.rules
    assert out["ids"] == want_ids
