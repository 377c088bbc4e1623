"""Benchmark harness: prints ONE JSON line for the driver.

Measures end-to-end encode throughput (MB/s) on a synthetic Zipf-worded
corpus — the reference's headline metric is tokenization speed
(benchmark.md: 100MB English in 4.4 s with 4 threads ≈ 22.7 MB/s on a
36-core Xeon).  vs_baseline is our MB/s divided by that reference rate.

Env knobs: YTTM_BENCH_MB (default 100), YTTM_BENCH_VOCAB (default 5000).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_MBPS = 100.0 / 4.4  # benchmark.md:31, 100MB En / 4.4 s, 4 threads


def build_corpus(target_mb: int, n_unique_words: int = 30000, seed: int = 0):
    """Zipf-distributed synthetic words over ascii letters: realistic
    dedup ratios for natural-language encode benchmarks."""
    rng = np.random.default_rng(seed)
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    lens = np.clip(rng.poisson(6, n_unique_words), 2, 14)
    words = ["".join(chr(c) for c in rng.choice(letters, size=l)) for l in lens]
    ranks = np.arange(1, n_unique_words + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()
    target_bytes = target_mb * 1_000_000
    avg_word = float(lens.mean()) + 1.0
    n_words = int(target_bytes / avg_word)
    idx = rng.choice(n_unique_words, size=n_words, p=probs)
    warr = np.array(words, dtype=object)
    # ~12 words per line
    lines = []
    per_line = 12
    for i in range(0, n_words, per_line * 4096):
        chunk = warr[idx[i : i + per_line * 4096]]
        joined = " ".join(chunk.tolist())
        lines.append(joined)
    corpus = "\n".join(lines)
    return corpus


def main():
    target_mb = int(os.environ.get("YTTM_BENCH_MB", "100"))
    vocab_size = int(os.environ.get("YTTM_BENCH_VOCAB", "5000"))

    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.train import train_from_codepoints
    from youtokentome_tpu.encoder import Encoder
    from youtokentome_tpu.ops.utf8 import str_to_codepoints

    print("building corpus...", file=sys.stderr)
    corpus = build_corpus(target_mb)
    nbytes = len(corpus.encode())
    train_slice = corpus[: 2_000_000]

    print("training...", file=sys.stderr)
    t0 = time.time()
    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
    state = train_from_codepoints(str_to_codepoints(train_slice), vocab_size, cfg)
    train_s = time.time() - t0
    print(f"train({vocab_size} vocab, 2MB): {train_s:.1f}s", file=sys.stderr)

    enc = Encoder(state)
    sentences = corpus.split("\n")
    # warmup (compiles kernels, fills nothing - cache cleared after)
    enc.encode(sentences[:2000], "id")
    enc._cache.clear()

    t0 = time.time()
    out = enc.encode(sentences, "id")
    dt = time.time() - t0
    n_tokens = sum(len(s) for s in out)
    mbps = nbytes / 1e6 / dt

    print(
        f"encoded {nbytes/1e6:.1f}MB in {dt:.2f}s -> {mbps:.1f} MB/s "
        f"({n_tokens} tokens)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "encode_throughput_synthetic_zipf",
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / REFERENCE_MBPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
