"""Comparative speed + conformance shootout vs the reference C++ build.

Counterpart of the reference's tests/speed_test/speed_test.py: trains
both implementations on the same corpus, encodes the same text, times
both, and asserts the outputs are IDENTICAL.  Run manually:

    python tests/speed_test.py [MB] [vocab] [train_MB]

``train_MB`` (default 2) sizes the training corpus — the BASELINE
scale-ladder configs train on the full corpus (e.g. 100 and 500).

Not part of CI (timings only mean something on real hardware).
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yttm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    train_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import subprocess

    from bench import build_corpus
    from reference_oracle import BINARY, build_refcli

    assert build_refcli() is not None, "reference toolchain unavailable"

    corpus = build_corpus(mb, n_unique_words=max(30000, 15000 * train_mb))
    data = (corpus + "\n").encode()
    train_path = "/tmp/speedtest_train.txt"
    with open(train_path, "wb") as f:
        f.write(data[: train_mb * 1_000_000])
    full_path = "/tmp/speedtest_full.txt"
    with open(full_path, "wb") as f:
        f.write(data)

    # --- reference ---
    t0 = time.time()
    subprocess.run(
        [str(BINARY), "train", train_path, "/tmp/speedtest_ref.yttm",
         str(vocab), "1.0", "0", "1", "2", "3"],
        check=True, capture_output=True,
    )
    ref_train_s = time.time() - t0

    t0 = time.time()
    with open(full_path, "rb") as f:
        res = subprocess.run(
            [str(BINARY), "encode", "/tmp/speedtest_ref.yttm", "id",
             "0", "0", "0", "0.0"],
            stdin=f, capture_output=True, check=True,
        )
    ref_enc_s = time.time() - t0
    ref_out = res.stdout

    # --- ours ---
    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.train import train
    from youtokentome_tpu.encoder import Encoder

    t0 = time.time()
    state = train(train_path, "/tmp/speedtest_tpu.yttm", vocab,
                  BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3)))
    our_train_s = time.time() - t0

    enc = Encoder(state)
    enc.encode_text_cli(data[: 1 << 20])  # warm up compiles
    t0 = time.time()
    our_out = enc.encode_text_cli(data)
    our_enc_s = time.time() - t0

    # --- conformance: identical models and identical id streams ---
    from youtokentome_tpu.models.state import BPEState

    a = BPEState.load("/tmp/speedtest_ref.yttm")
    b = BPEState.load("/tmp/speedtest_tpu.yttm")
    assert a.char2id == b.char2id, "alphabet mismatch"
    assert a.rules == b.rules, "rule mismatch"
    norm_ref = b"\n".join(line.rstrip() for line in ref_out.split(b"\n"))
    norm_our = b"\n".join(line.rstrip() for line in our_out.split(b"\n"))
    assert norm_ref == norm_our, "encoded ids differ"

    mbf = len(data) / 1e6
    print(f"corpus: {mbf:.1f} MB, vocab {vocab}")
    print(f"train {train_mb}MB:  reference {ref_train_s:6.2f}s   tpu {our_train_s:6.2f}s")
    print(
        f"encode:     reference {ref_enc_s:6.2f}s ({mbf/ref_enc_s:5.1f} MB/s)"
        f"   tpu {our_enc_s:6.2f}s ({mbf/our_enc_s:5.1f} MB/s)"
    )
    print("outputs identical: YES")


if __name__ == "__main__":
    main()
