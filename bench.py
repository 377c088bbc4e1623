"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric: end-to-end tokenize throughput (MB/s) through the CLI
path (bytes in, reference-format id text out) on a synthetic Zipf-worded
corpus — the reference's headline is tokenization speed (benchmark.md:
100 MB English in 4.4 s with 4 threads on a 36-core Xeon ~= 22.7 MB/s).
vs_baseline = our MB/s / 22.7.

The JSON line also carries (all with per-rep values so outliers are
visible, medians as the reported number):

  train            2 reps of the default train config; ``compile_s`` =
                   rep0 - rep1 (first call pays compile/cache-load; the
                   second reuses the in-process compiled program),
                   ``steady_s`` = rep1, ``merges_per_s`` over rep1
  train_scale      1 rep of a 10x larger corpus with Heaps-law unique
                   word growth (scaling proof; YTTM_BENCH_TRAIN_SCALE=0
                   disables)
  tokenize/api     cli-path (3 reps) and api-path (2 reps) MB/s
  nonascii         cli-path over a Cyrillic corpus (the reference slows
                   ~3x on non-Latin text, benchmark.md:23)
  anomaly          true when any metric's reps spread by more than 3x
                   or the device probe is slow — a recorded number with
                   anomaly=true must not be read as a regression (or an
                   improvement; see BENCH_r03's 10x train outlier)

Env knobs: YTTM_BENCH_MB (default 40), YTTM_BENCH_VOCAB (default 5000),
YTTM_BENCH_TRAIN_MB (default 2), YTTM_BENCH_TRAIN_SCALE (default 1),
YTTM_BENCH_TRAIN_REPS (default 2).
"""

import json
import os
import sys
import time

# the persistent compile cache dir defaults to a per-user path inside
# youtokentome_tpu/__init__ (JAX_COMPILATION_CACHE_DIR overrides)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_MBPS = 100.0 / 4.4  # benchmark.md:31, 100MB En / 4.4s, 4 threads


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_corpus(
    target_mb: float,
    n_unique_words: int = 30000,
    seed: int = 0,
    alphabet: bytes = b"abcdefghijklmnopqrstuvwxyz",
):
    """Zipf-distributed synthetic words: realistic dedup ratios for
    natural-language benchmarks.  ``alphabet`` may be any charset (the
    non-ASCII corpus uses Cyrillic)."""
    rng = np.random.default_rng(seed)
    chars = alphabet.decode("utf-8")
    lens = np.clip(rng.poisson(6, n_unique_words), 2, 14)
    words = [
        "".join(chars[c] for c in rng.integers(0, len(chars), l))
        for l in lens
    ]
    ranks = np.arange(1, n_unique_words + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()
    target_bytes = int(target_mb * 1_000_000)
    bytes_per_char = len(chars[0].encode("utf-8"))
    avg_word = float(lens.mean()) * bytes_per_char + 1.0
    n_words = int(target_bytes / avg_word)
    idx = rng.choice(n_unique_words, size=n_words, p=probs)
    warr = np.array(words, dtype=object)
    per_line = 12
    lines = []
    for i in range(0, n_words, per_line * 4096):
        chunk = warr[idx[i : i + per_line * 4096]]
        lines.append(" ".join(chunk.tolist()))
    return "\n".join(lines)


def cli_chunks(blob):
    """Yield 10 MiB newline-aligned chunks (mirrors the CLI batch loop,
    bpe.cpp:1976-1983)."""
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


def probe_device() -> float:
    """One tiny device op, timed (a wedged tunnel takes minutes)."""
    import jax.numpy as jnp

    t0 = time.time()
    _ = int(jnp.arange(8).sum())
    return time.time() - t0


def wait_device_ready(budget_s: float = 1800.0, fast_s: float = 5.0) -> dict:
    """Probe until the device answers fast, within a bounded budget.

    The axon tunnel wedge (PROFILE.md) makes device ops take minutes,
    then self-heal — a benchmark that measures through the wedge records
    environment noise as a regression.  Returns {ready, last_probe_s,
    waited_s, attempts}; sections re-probe so a mid-run wedge delays
    rather than poisons the artifact."""
    import jax

    t_start = time.time()
    attempts = 0
    while True:
        dt = probe_device()
        attempts += 1
        waited = time.time() - t_start
        log(
            f"device probe ({jax.devices()[0].platform}) "
            f"#{attempts}: {dt:.1f}s"
        )
        if dt <= fast_s:
            return {
                "ready": True,
                "last_probe_s": round(dt, 2),
                "waited_s": round(waited, 1),
                "attempts": attempts,
            }
        if waited > budget_s:
            return {
                "ready": False,
                "last_probe_s": round(dt, 2),
                "waited_s": round(waited, 1),
                "attempts": attempts,
            }
        time.sleep(10)


def median(xs):
    return float(np.median(np.asarray(xs, dtype=np.float64)))


def spread(xs):
    lo = min(xs)
    return (max(xs) / lo) if lo > 0 else float("inf")


def time_train(corpus_text, vocab_size, cfg):
    from youtokentome_tpu.ops.utf8 import str_to_codepoints
    from youtokentome_tpu.train import train_from_codepoints

    cps = str_to_codepoints(corpus_text)
    t0 = time.time()
    state = train_from_codepoints(cps, vocab_size, cfg)
    return time.time() - t0, state


def measure_cli(enc_factory, data, reps):
    nbytes = len(data)
    vals = []
    for _ in range(reps):
        # fresh Encoder per rep: cold word cache (cross-batch caching
        # within one file is the real CLI scenario; rep-to-rep reuse of
        # the same corpus is not).  encode_stream_cli is the pipelined
        # path the CLI batch loop drives.
        enc_rep = enc_factory()
        t0 = time.time()
        for out in enc_rep.encode_stream_cli(cli_chunks(data)):
            pass
        dt = time.time() - t0
        vals.append(nbytes / 1e6 / dt)
        log(f"  cli-path: {nbytes/1e6:.1f}MB in {dt:.2f}s -> {vals[-1]:.1f} MB/s")
    return vals


def main():
    target_mb = int(os.environ.get("YTTM_BENCH_MB", "40"))
    vocab_size = int(os.environ.get("YTTM_BENCH_VOCAB", "5000"))
    train_mb = int(os.environ.get("YTTM_BENCH_TRAIN_MB", "2"))
    train_reps = int(os.environ.get("YTTM_BENCH_TRAIN_REPS", "2"))
    train_scale = os.environ.get("YTTM_BENCH_TRAIN_SCALE", "1") != "0"

    from youtokentome_tpu.encoder import Encoder
    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens

    anomalies = []

    # device health probe: a wedged TPU tunnel (documented failure mode)
    # makes every number garbage.  The wedge self-heals in minutes, so a
    # slow probe is retried inside a bounded budget and the artifact
    # records the recovery wait instead of publishing poisoned numbers;
    # only a tunnel that never recovers yields an anomaly-flagged
    # refusal.
    import jax

    probe_info = wait_device_ready(
        budget_s=float(os.environ.get("YTTM_BENCH_PROBE_BUDGET", "1800"))
    )
    probe_s = probe_info["last_probe_s"]
    if not probe_info["ready"]:
        anomalies.append(f"device_wedged_refusal_{probe_s:.0f}s")

    log("building corpora...")
    corpus = build_corpus(target_mb)
    data = (corpus + "\n").encode()
    nbytes = len(data)
    # Cyrillic corpus (2 bytes/char): the reference slows ~3x on
    # non-Latin text (benchmark.md:23)
    ru_corpus = build_corpus(
        10,
        seed=7,
        alphabet="абвгдежзийклмнопрстуфхцчшщыэюя".encode("utf-8"),
    )
    ru_data = (ru_corpus + "\n").encode()

    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))

    # -- training: >=2 reps, first-call compile split ----------------------
    train_text = corpus[: train_mb * 1_000_000]
    train_times = []
    state = None
    for r in range(max(train_reps, 2)):
        log(f"training rep {r} ({train_mb}MB, vocab {vocab_size})...")
        dt, state = time_train(train_text, vocab_size, cfg)
        train_times.append(round(dt, 2))
        log(f"  train rep {r}: {dt:.1f}s")
    steady_s = median(train_times[1:])
    compile_s = max(train_times[0] - steady_s, 0.0)
    n_merges = len(state.rules)
    train_info = {
        "size_mb": train_mb,
        "vocab": vocab_size,
        "reps_s": train_times,
        "total_s": train_times[0],
        "steady_s": round(steady_s, 2),
        "compile_s": round(compile_s, 2),
        "merges": n_merges,
        "merges_per_s": round(n_merges / max(steady_s, 1e-9), 1),
    }
    if spread(train_times[1:]) > 3:
        anomalies.append("train_rep_spread")

    # -- training at scale: 10x corpus, Heaps-law unique growth ------------
    scale_info = None
    if train_scale:
        smb = train_mb * 10
        log(f"training scale rep ({smb}MB)...")
        scorpus = build_corpus(smb, n_unique_words=15000 * smb, seed=3)
        dt, sstate = time_train(scorpus[: smb * 1_000_000], vocab_size, cfg)
        scale_info = {
            "size_mb": smb,
            "vocab": vocab_size,
            "total_s": round(dt, 2),
            "merges": len(sstate.rules),
            "merges_per_s": round(len(sstate.rules) / max(dt, 1e-9), 1),
        }
        log(f"  train {smb}MB: {dt:.1f}s")

    # -- training at 100 MB / vocab 30k (BASELINE configs 2-3 scale point;
    # the reference's headline train number is 4.2 s, benchmark.md:23) --
    big_info = None
    big_default = "1" if jax.default_backend() != "cpu" else "0"
    if os.environ.get("YTTM_BENCH_TRAIN_100MB", big_default) != "0":
        path = "/tmp/bench_corpus_100mb.txt"
        if not os.path.exists(path):
            log("building 100MB corpus (cached to /tmp)...")
            big = build_corpus(100, n_unique_words=1500000, seed=3)
            with open(path, "w") as f:
                f.write(big[: 100 * 1_000_000])
            del big
        rp = wait_device_ready(budget_s=900)
        if not rp["ready"]:
            anomalies.append("train100_probe_wedged")
        log("training 100MB / vocab 30000...")
        with open(path) as f:
            big_text = f.read()
        dt, bstate = time_train(big_text, 30000, cfg)
        del big_text
        big_info = {
            "size_mb": 100,
            "vocab": 30000,
            "total_s": round(dt, 2),
            "merges": len(bstate.rules),
            "merges_per_s": round(len(bstate.rules) / max(dt, 1e-9), 1),
            "reference_s": 4.2,
            "probe_wait_s": rp["waited_s"],
        }
        del bstate
        log(f"  train 100MB: {dt:.1f}s")

    # -- encode: cli path (3 reps), api path (2 reps), non-ASCII -----------
    rp = wait_device_ready(budget_s=900)
    if not rp["ready"]:
        anomalies.append("encode_probe_wedged")
    enc = Encoder(state)
    enc.encode_text_cli(data[: 1 << 20])  # warmup: compile all kernels

    cli_vals = measure_cli(lambda: Encoder(state), data, 3)
    if spread(cli_vals) > 3:
        anomalies.append("cli_rep_spread")

    sentences = corpus.split("\n")
    api_vals = []
    ids = None
    for _ in range(2):
        # free the previous rep's ~10M-int result BEFORE timing: holding
        # it across the next call pushes the rep into GC/memory pressure
        # and was measured to halve rep-2 throughput
        ids = None
        t0 = time.time()
        ids = enc.encode(sentences, "id")
        dt = time.time() - t0
        api_vals.append(nbytes / 1e6 / dt)
        n_tokens = sum(len(s) for s in ids)
        log(f"  api-path: {api_vals[-1]:.1f} MB/s ({n_tokens} tokens)")
    ids = None
    if spread(api_vals) > 3:
        anomalies.append("api_rep_spread")

    log("non-ascii cli-path...")
    ru_vals = measure_cli(lambda: Encoder(state), ru_data, 2)

    # -- BPE-dropout encode (BASELINE config 4; occurrences are sampled
    # independently, so dedup/caching is off — measured, not assumed) --
    drop_mb = float(os.environ.get("YTTM_BENCH_DROPOUT_MB", "4"))
    drop_sents = []
    acc = 0
    for s in sentences:
        drop_sents.append(s)
        acc += len(s) + 1
        if acc >= drop_mb * 1_000_000:
            break
    t0 = time.time()
    _ = enc.encode(drop_sents, "id", dropout_prob=0.1)
    drop_dt = time.time() - t0
    dropout_mbps = acc / 1e6 / drop_dt
    log(f"  dropout(p=0.1): {acc/1e6:.1f}MB in {drop_dt:.2f}s "
        f"-> {dropout_mbps:.1f} MB/s")

    headline = median(cli_vals)
    out = {
        "metric": "tokenize_throughput_zipf40MB",
        "value": round(headline, 2),
        "unit": "MB/s",
        "vs_baseline": round(headline / REFERENCE_MBPS, 3),
        "platform": jax.devices()[0].platform,
        "device_probe_s": round(probe_s, 2),
        "probe": probe_info,
        "tokenize_mbps": {"reps": [round(v, 2) for v in cli_vals],
                          "median": round(headline, 2)},
        "api_mbps": {"reps": [round(v, 2) for v in api_vals],
                     "median": round(median(api_vals), 2)},
        "nonascii_mbps": {"reps": [round(v, 2) for v in ru_vals],
                          "median": round(median(ru_vals), 2)},
        "train": train_info,
        "train_scale": scale_info,
        "train_100mb": big_info,
        "dropout_mbps": round(dropout_mbps, 2),
        "anomaly": bool(anomalies),
        "anomaly_detail": anomalies,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
