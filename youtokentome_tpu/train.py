"""End-to-end BPE training: host preprocessing + device merge rounds.

Pipeline (mirrors train_bpe / learn_bpe_from_string, bpe.cpp:859-1388):

  read file -> UTF-8 decode (vectorized)            host   ops/utf8.py
  char frequencies + coverage alphabet              host   host/preprocess.py
  word split + exact dedup + id mapping             host   host/preprocess.py
  merge rounds (count/argmax/apply fixed point)     device ops/train_kernel.py
  special-id renaming + model dump                  host   oracle.rename_tokens
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import numpy as np

from . import progress
from .host import preprocess
from .models.state import BPEState, BpeConfig, check_config
from .ops.train_block import run_training_block
from .ops.train_delta import run_training_delta
from .ops.train_sparse import run_training_sparse
from .ops.train_stream import run_training_stream
from .ops.train_tiered import run_training_tiered
from .ops.utf8 import decode_utf8_bytes
from .oracle import rename_tokens
from .parallel.train_delta_sharded import run_training_delta_sharded
from .parallel.train_sparse_sharded import run_training_sparse_sharded


def _training_mesh(buckets):
    """Production multi-device dispatch (the analog of the reference's
    auto-sharding across threads by default, bpe.cpp:864-873): train on
    a data mesh over every visible device when there is more than one
    and the deduped stream is large enough to amortize the per-round
    collective.  YTTM_DEVICES caps the device count (1 disables);
    YTTM_SHARD_MIN_TOKENS (default 2**17) is the serial cutoff, the
    analog of the reference's small-input serial path
    (bpe.cpp:1710-1717)."""
    import jax

    nd = len(jax.devices())
    cap = int(os.environ.get("YTTM_DEVICES", "0"))
    if cap:
        nd = min(nd, cap)
    if nd <= 1:
        return None
    min_tokens = int(os.environ.get("YTTM_SHARD_MIN_TOKENS", str(1 << 17)))
    stream_tokens = sum(int((mat >= 0).sum()) for mat, _ in buckets)
    if stream_tokens < min_tokens:
        return None
    from .parallel.mesh import data_mesh

    return data_mesh(nd)


def train_from_codepoints(
    cps: np.ndarray,
    vocab_size: int,
    config: BpeConfig,
) -> BPEState:
    config = check_config(config, vocab_size)
    special = config.special_tokens
    n_specials = special.n_special_tokens()

    uniq, cnt, data_len = preprocess.char_frequencies(cps)
    print(
        f"number of unique characters in the training data: {uniq.size}",
        file=sys.stderr,
    )
    alphabet = preprocess.build_alphabet(
        uniq, cnt, data_len, config.character_coverage, n_specials
    )
    print(f"number of deleted characters: {alphabet.removed.size}", file=sys.stderr)
    print(
        f"number of unique characters left: {uniq.size - alphabet.removed.size}",
        file=sys.stderr,
    )

    used_ids0 = len(alphabet.char2id) + n_specials
    if used_ids0 > vocab_size:
        raise ValueError(
            "Incorrect arguments. Vocabulary size too small. Set vocab_size>="
            + str(used_ids0)
            + ".  Current value for vocab_size="
            + str(vocab_size)
        )

    buckets = preprocess.training_word_buckets(cps, alphabet)
    # impl selection: "auto" (default) = the sharded trainer on a
    # multi-device data mesh, else the delta trainer; "delta" =
    # incremental count table with sort-compacted apply (v2 — the
    # fastest single-device kernel on real TPU: sorts are fast,
    # gathers are slow, see PROFILE.md §3b), "sparse" = site-local
    # tombstone trainer (v3 — gather-bound on TPU, kept for the
    # sharded kernel and as a differential check), "stream" = full
    # recount per round (v1).  All serve any vocab size: pair keys
    # are packed uint32 below vocab 65536 and two-component
    # (lexicographic-sorted) above (train_delta key layout), matching
    # the reference's unlimited vocab.
    impl = os.environ.get("YTTM_TRAIN_IMPL", "auto")
    kwargs = dict(
        batch_k=int(os.environ.get("YTTM_TRAIN_BATCH_K", "16")),
        progress_every=int(os.environ.get("YTTM_TRAIN_PROGRESS", "0")),
        checkpoint_path=os.environ.get("YTTM_TRAIN_CHECKPOINT") or None,
        checkpoint_every=int(os.environ.get("YTTM_TRAIN_CHECKPOINT_EVERY", "0")),
        resume_path=os.environ.get("YTTM_TRAIN_RESUME") or None,
        # the reference logs a merge line every 1000 ids BY DEFAULT
        # (bpe.cpp:1198-1219); YTTM_TRAIN_LOG=0 silences it
        progress_cb=(
            progress.MergeLog(alphabet.char2id)
            if progress.log_enabled()
            else None
        ),
    )
    mesh = _training_mesh(buckets) if impl in ("auto", "sparse") else None
    if mesh is not None and impl == "sparse":
        rules = run_training_sparse_sharded(
            buckets, used_ids0, vocab_size, mesh, **kwargs
        )
    elif mesh is not None:
        rules = run_training_delta_sharded(
            buckets, used_ids0, vocab_size, mesh, **kwargs
        )
    elif impl == "sparse":
        rules = run_training_sparse(buckets, used_ids0, vocab_size, **kwargs)
    elif impl == "stream":
        rules = run_training_stream(buckets, used_ids0, vocab_size, **kwargs)
    elif impl == "block":
        rules = run_training_block(buckets, used_ids0, vocab_size, **kwargs)
    elif impl == "tiered":
        rules = run_training_tiered(buckets, used_ids0, vocab_size, **kwargs)
    elif impl == "auto" and sum(
        int((mat >= 0).sum()) for mat, _ in buckets
    ) >= (1 << 22):
        # measured at 100 MB / vocab 30k on the chip (PROFILE.md §3):
        # the v5 tiered trainer's hot/cold count table and
        # signature-gated block tiers remove the per-round table-sized
        # sorts that dominate v2/v4 at scale.  run_training_tiered
        # falls back to delta itself when a word exceeds the block cap.
        rules = run_training_tiered(buckets, used_ids0, vocab_size, **kwargs)
    else:  # auto (small/medium single device) and delta
        rules = run_training_delta(buckets, used_ids0, vocab_size, **kwargs)

    char2id, rules = rename_tokens(alphabet.char2id, rules, special, vocab_size)
    return BPEState(char2id=char2id, rules=rules, special_tokens=special)


def train(
    data_path: str,
    model_path: Optional[str],
    vocab_size: int,
    config: Optional[BpeConfig] = None,
) -> BPEState:
    """File-based training (train_bpe, bpe.cpp:1368-1388)."""
    config = config or BpeConfig()
    config = check_config(config, vocab_size)
    # the reference prints the full config before reading the corpus
    # (print_config, bpe.cpp:1374)
    progress.print_config(data_path, model_path or "", vocab_size, config)
    print("reading file...", file=sys.stderr)
    try:
        with open(data_path, "rb") as f:
            raw = f.read()
    except OSError:
        raise ValueError("Failed to open file: " + data_path) from None
    cps = decode_utf8_bytes(raw, keep_invalid=True)
    print("learning bpe...", file=sys.stderr)
    state = train_from_codepoints(cps, vocab_size, config)
    if model_path:
        state.dump(model_path)
        print(f"model saved to: {model_path}", file=sys.stderr)
    return state
