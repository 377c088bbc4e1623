"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric: end-to-end tokenize throughput (MB/s) through the CLI
path (bytes in, reference-format id text out) on a synthetic Zipf-worded
corpus — the reference's headline is tokenization speed (benchmark.md:
100 MB English in 4.4 s with 4 threads on a 36-core Xeon ~= 22.7 MB/s).
vs_baseline = our MB/s / 22.7.

Also reports (stderr): Python-API throughput and training time.

Env knobs: YTTM_BENCH_MB (default 40), YTTM_BENCH_VOCAB (default 5000),
YTTM_BENCH_TRAIN_MB (default 2).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yttm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_MBPS = 100.0 / 4.4  # benchmark.md:31, 100MB En / 4.4s, 4 threads


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
    per_line = 12
    lines = []
    for i in range(0, n_words, per_line * 4096):
        chunk = warr[idx[i : i + per_line * 4096]]
        lines.append(" ".join(chunk.tolist()))
    return "\n".join(lines)


def main():
    target_mb = int(os.environ.get("YTTM_BENCH_MB", "40"))
    vocab_size = int(os.environ.get("YTTM_BENCH_VOCAB", "5000"))
    train_mb = int(os.environ.get("YTTM_BENCH_TRAIN_MB", "2"))

    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.train import train_from_codepoints
    from youtokentome_tpu.encoder import Encoder
    from youtokentome_tpu.ops.utf8 import str_to_codepoints

    print("building corpus...", file=sys.stderr)
    corpus = build_corpus(target_mb)
    data = (corpus + "\n").encode()
    nbytes = len(data)

    print("training...", file=sys.stderr)
    t0 = time.time()
    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
    state = train_from_codepoints(
        str_to_codepoints(corpus[: train_mb * 1_000_000]), vocab_size, cfg
    )
    train_s = time.time() - t0
    print(f"train({vocab_size} vocab, {train_mb}MB): {train_s:.1f}s", file=sys.stderr)

    enc = Encoder(state)
    # warmup: compile all kernels
    enc.encode_text_cli(data[: 1 << 20])

    def cli_chunks(blob):
        """Yield 10 MiB newline-aligned chunks (mirrors the CLI batch
        loop, bpe.cpp:1976-1983)."""
        lim = 10 * 1024 * 1024
        start = 0
        while start < len(blob):
            end = min(start + lim, len(blob))
            if end < len(blob):
                nl = blob.rfind(b"\n", start, end)
                if nl > start:
                    end = nl + 1
            yield blob[start:end]
            start = end

    best = 0.0
    for _ in range(3):
        # fresh Encoder per rep: cold word cache (cross-batch caching
        # within one file is the real CLI scenario; rep-to-rep reuse of
        # the same corpus is not)
        enc_rep = Encoder(state)
        t0 = time.time()
        for chunk in cli_chunks(data):
            enc_rep.encode_text_cli(chunk)
        dt = time.time() - t0
        best = max(best, nbytes / 1e6 / dt)
        print(
            f"cli-path: {nbytes/1e6:.1f}MB in {dt:.2f}s -> {nbytes/1e6/dt:.1f} MB/s",
            file=sys.stderr,
        )

    sentences = corpus.split("\n")
    t0 = time.time()
    ids = enc.encode(sentences, "id")
    dt = time.time() - t0
    print(
        f"api-path: {nbytes/1e6/dt:.1f} MB/s ({sum(len(s) for s in ids)} tokens)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "tokenize_throughput_zipf40MB",
                "value": round(best, 2),
                "unit": "MB/s",
                "vs_baseline": round(best / REFERENCE_MBPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
