"""Reproduce + profile the 100MB/30k training run (PROFILE.md 3c).

Builds (and caches to /tmp) a 100MB Zipf corpus with Heaps-law unique
growth, then trains with the selected trainer and a dense progress
trajectory so per-segment merges/s decomposes the wall clock.

  python tools/profile_train_scale.py [mb] [vocab] [impl]
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yttm")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 30000
impl = sys.argv[3] if len(sys.argv) > 3 else "block"

path = f"/tmp/bench_corpus_{mb}mb.txt"
if not os.path.exists(path):
    t0 = time.time()
    from bench import build_corpus
    corpus = build_corpus(mb, n_unique_words=15000 * mb, seed=3)[: mb * 1_000_000]
    with open(path, "w") as f:
        f.write(corpus)
    print(f"corpus built in {time.time()-t0:.1f}s -> {path}", file=sys.stderr)

os.environ["YTTM_TRAIN_IMPL"] = impl
os.environ.setdefault("YTTM_TRAIN_PROGRESS", "1000")

import jax
t0 = time.time()
print(f"devices: {jax.devices()}", file=sys.stderr)
print(f"device probe: start", file=sys.stderr)
import jax.numpy as jnp
_ = int(jnp.arange(8).sum())
print(f"device probe: {time.time()-t0:.1f}s", file=sys.stderr)

from youtokentome_tpu.train import train
t0 = time.time()
from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
state = train(path, f"/tmp/prof_{mb}mb_{vocab}_{impl}.yttm", vocab,
              BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3)))
dt = time.time() - t0
print(f"TOTAL train({mb}MB, vocab {vocab}, impl={impl}): {dt:.1f}s "
      f"({len(state.rules)} merges, {len(state.rules)/dt:.0f} merges/s)",
      file=sys.stderr)
