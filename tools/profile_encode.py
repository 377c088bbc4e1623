"""Stage-decomposed encode profiler — the source of PROFILE.md numbers.

Replays the native CLI path (Encoder.encode_text_cli) and the api path
(Encoder.encode -> _encode_ids_native) stage by stage over a Zipf corpus
and prints a per-stage time table:

  tokenize    C++ split + dedup + char->id mapping (host)
  merge       device greedy-merge of novel unique words (incl. the
              numpy gather/pack around the device calls)
  register    placeholder->unk mapping + C++ result registration
  format      C++ expand of cached per-word text (CLI output bytes)
  expand      C++ expand of cached per-word ids (api path)
  tolist      np.ndarray -> Python list conversion (api path)
  slice       per-sentence Python list slicing (api path)

Usage: python tools/profile_encode.py [MB] [VOCAB]
(defaults 40 and 5000; runs on whatever platform jax picks — set
JAX_PLATFORMS=cpu to force CPU).  Set YTTM_TRACE_DIR=/path to also
capture a jax.profiler trace of the measured CLI pass (open with
tensorboard / xprof).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yttm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import build_corpus, cli_chunks


def profile(target_mb: int, vocab_size: int):
    from youtokentome_tpu.encoder import PLACEHOLDER_START, Encoder
    from youtokentome_tpu.models.state import BpeConfig, SpecialTokens
    from youtokentome_tpu.ops.utf8 import str_to_codepoints
    from youtokentome_tpu.train import train_from_codepoints

    import jax

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    corpus = build_corpus(target_mb)
    data = (corpus + "\n").encode()
    nbytes = len(data)

    cfg = BpeConfig(1.0, -1, SpecialTokens(0, 1, 2, 3))
    t0 = time.time()
    state = train_from_codepoints(
        str_to_codepoints(corpus[:2_000_000]), vocab_size, cfg
    )
    print(f"train 2MB: {time.time()-t0:.1f}s", file=sys.stderr)

    # ---------------- CLI path, stage-decomposed ----------------
    enc = Encoder(state)
    enc.encode_text_cli(data[: 1 << 20])  # warmup / compile
    enc = Encoder(state)  # cold cache for the measured pass

    stages = {"tokenize": 0.0, "merge": 0.0, "register": 0.0, "format": 0.0}
    unk = state.special_tokens.unk_id
    trace_dir = os.environ.get("YTTM_TRACE_DIR")
    trace_ctx = (
        jax.profiler.trace(trace_dir) if trace_dir else None
    )
    if trace_ctx:
        trace_ctx.__enter__()
    t_all = time.time()
    out_bytes = 0
    for chunk in cli_chunks(data):
        wc = enc._word_cache()
        t0 = time.time()
        words_flat, word_off, occ, base = wc.tokenize(
            chunk, enc._sorted_cps, enc._sorted_ids, enc.space_id
        )
        stages["tokenize"] += time.time() - t0
        if word_off.size > 1:
            t0 = time.time()
            rf, ro = enc._merge_unique_words(words_flat, word_off)
            stages["merge"] += time.time() - t0
            t0 = time.time()
            rf = np.where(rf >= PLACEHOLDER_START, unk, rf)
            wc.add_results(rf, ro, base)
            stages["register"] += time.time() - t0
        t0 = time.time()
        out_bytes += len(wc.format(occ))
        stages["format"] += time.time() - t0
    cli_total = time.time() - t_all
    if trace_ctx:
        trace_ctx.__exit__(None, None, None)
        print(f"jax.profiler trace written to {trace_dir}", file=sys.stderr)

    print(f"\n== cli path: {nbytes/1e6:.1f} MB in {cli_total:.2f}s "
          f"({nbytes/1e6/cli_total:.1f} MB/s), {out_bytes/1e6:.1f} MB out ==")
    other = cli_total - sum(stages.values())
    for k, v in {**stages, "other": other}.items():
        print(f"  {k:<10} {v:7.3f}s  {100*v/cli_total:5.1f}%")

    # ---------------- api path, stage-decomposed ----------------
    sentences = corpus.split("\n")
    for rep in range(2):
        st = {"tokenize": 0.0, "merge": 0.0, "register": 0.0,
              "expand": 0.0, "tolist": 0.0, "slice": 0.0}
        t_all = time.time()
        joined = "\n".join(sentences) + "\n"
        blob = joined.encode("utf-8")
        st["join_encode"] = time.time() - t_all
        wc = enc._word_cache()
        t0 = time.time()
        words_flat, word_off, occ, base = wc.tokenize(
            blob, enc._sorted_cps, enc._sorted_ids, enc.space_id
        )
        st["tokenize"] = time.time() - t0
        if word_off.size > 1:
            t0 = time.time()
            rf, ro = enc._merge_unique_words(words_flat, word_off)
            st["merge"] = time.time() - t0
            t0 = time.time()
            rf = np.where(rf >= PLACEHOLDER_START, unk, rf)
            wc.add_results(rf, ro, base)
            st["register"] = time.time() - t0
        t0 = time.time()
        flat = wc.expand_ids(occ)
        st["expand"] = time.time() - t0
        t0 = time.time()
        marks = np.nonzero(flat == -1)[0]
        big = flat.tolist()
        st["tolist"] = time.time() - t0
        t0 = time.time()
        bounds = [0] + (marks + 1).tolist()
        result = [big[bounds[i]: bounds[i + 1] - 1] for i in range(len(sentences))]
        st["slice"] = time.time() - t0
        api_total = time.time() - t_all
        print(f"\n== api path rep {rep}: {nbytes/1e6/api_total:.1f} MB/s "
              f"({api_total:.2f}s, {len(result)} sentences, "
              f"{sum(len(r) for r in result)} tokens) ==")
        other = api_total - sum(st.values())
        for k, v in {**st, "other": other}.items():
            print(f"  {k:<12} {v:7.3f}s  {100*v/api_total:5.1f}%")


if __name__ == "__main__":
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    vs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    profile(mb, vs)
