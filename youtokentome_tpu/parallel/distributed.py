"""Multi-host distributed BPE training (jax.distributed + DCN/ICI).

The reference is single-process: its "distribution" is corpus segments
across <=8 threads with per-thread pair-count shards summed on demand
(bpe.cpp:864-873, check_cnt bpe.cpp:1099-1108).  The TPU-native scale-up
spans hosts: every process holds a shard of the corpus, the device mesh
spans all processes, and the same sharded training kernel
(parallel/train_delta_sharded._train_delta_sharded, the production
multi-device path) runs unchanged — its per-round bounded all_gather
rides ICI between devices of one host and DCN between hosts, and
integer count folds in a fixed gather order make the result
bit-identical to a single process at any (process, device) layout.

SPMD contract: every process calls the same functions with its LOCAL
corpus shard; all cross-host agreement (alphabet, word-id bases, the
initial count table) happens via ``process_allgather`` folds that are
deterministic on every host.  The returned model is identical on every
process.

Usage (same program on every host):

    from youtokentome_tpu.parallel import distributed as dist
    dist.initialize()                       # env-driven, or pass args
    state = dist.train_from_codepoints_distributed(local_cps, 30000)
    if jax.process_index() == 0:
        state.dump("model.yttm")

Verified by tests/test_distributed.py: 2 processes x 2 CPU devices
produce rules bit-identical to the single-process trainer.
"""

from __future__ import annotations

import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..host import preprocess
from ..models.state import BPEState, BpeConfig, check_config
from ..oracle import rename_tokens
from .mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Wire up jax.distributed (idempotent).

    With no arguments the standard env vars drive it (JAX_COORDINATOR_
    ADDRESS etc., or the TPU metadata server on real pods); explicit
    args support manual launches like the CPU-backend tests."""
    from jax._src import distributed as _dist

    # do NOT probe via jax.process_count(): that would initialise the
    # XLA backend, after which jax.distributed.initialize refuses to run
    if getattr(_dist.global_state, "client", None) is not None:
        return
    jax.distributed.initialize(
        coordinator_address, num_processes, process_id, **kwargs
    )


def global_mesh() -> Mesh:
    """1-D data mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


# -- host-side cross-process folds (all deterministic, order = pid) --------

def _allgather_i64(arr: np.ndarray) -> np.ndarray:
    """process_allgather for int64/uint64 payloads: split into uint32
    halves so the x64-disabled device transfer cannot silently narrow.
    Returns [n_proc, n] of the original dtype."""
    from jax.experimental import multihost_utils

    arr = np.asarray(arr)
    u = arr.astype(np.uint64)
    hi = (u >> np.uint64(32)).astype(np.uint32)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    ghi = np.asarray(multihost_utils.process_allgather(hi))
    glo = np.asarray(multihost_utils.process_allgather(lo))
    out = (ghi.astype(np.uint64) << np.uint64(32)) | glo.astype(np.uint64)
    return out.astype(arr.dtype)


def _allgather_var(arr: np.ndarray, i64: bool = False) -> List[np.ndarray]:
    """Gather variable-length per-process arrays: every process gets the
    list of all processes' arrays in pid order."""
    from jax.experimental import multihost_utils

    n = np.asarray([arr.size], np.int32)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    cap = max(int(sizes.max()), 1)
    pad = np.zeros(cap, arr.dtype)
    pad[: arr.size] = arr
    g = _allgather_i64(pad) if i64 else np.asarray(
        multihost_utils.process_allgather(pad)
    )
    return [g[p, : sizes[p]] for p in range(g.shape[0])]


def _global_alphabet(cps: np.ndarray, coverage: float, n_specials: int):
    """Alphabet/coverage from GLOBAL char frequencies (identical on all
    hosts): local char counts are allgathered and folded exactly like
    the reference's per-thread char count merge (bpe.cpp:1013-1021)."""
    uniq, cnt, data_len = preprocess.char_frequencies(cps)
    parts_u = _allgather_var(uniq.astype(np.uint32))
    parts_c = _allgather_var(cnt.astype(np.int64), i64=True)
    dl = int(_allgather_i64(np.asarray([data_len], np.int64)).sum())
    all_u = np.concatenate(parts_u)
    all_c = np.concatenate(parts_c)
    gu, inv = np.unique(all_u, return_inverse=True)
    gc = np.zeros(gu.size, np.int64)
    np.add.at(gc, inv, all_c)
    return gu, gc, dl


def train_from_codepoints_distributed(
    local_cps: np.ndarray,
    vocab_size: int,
    config: Optional[BpeConfig] = None,
    batch_k: int = 16,
    progress_every: int = 0,
) -> BPEState:
    """Train over the corpus formed by every process's ``local_cps``
    shard (split at word boundaries by the caller); returns the same
    BPEState on every process, bit-identical to single-process training
    on the concatenated corpus."""
    from ..ops.train_delta import _fit_table, _next_pow2, _pcap_budget
    from ..ops.train_stream import PAD, flatten_word_buckets
    from .train_delta_sharded import _train_delta_sharded
    from .train_sharded import _MeshRef

    import os
    import time

    config = check_config(config or BpeConfig(), vocab_size)
    special = config.special_tokens
    n_specials = special.n_special_tokens()
    pid = jax.process_index()
    mesh = global_mesh()
    n_local_dev = jax.local_device_count()

    gu, gc, data_len = _global_alphabet(
        local_cps, config.character_coverage, n_specials
    )
    if pid == 0:
        print(
            f"number of unique characters in the training data: {gu.size}",
            file=sys.stderr,
        )
    alphabet = preprocess.build_alphabet(
        gu, gc, data_len, config.character_coverage, n_specials
    )
    used_ids0 = len(alphabet.char2id) + n_specials
    if used_ids0 > vocab_size:
        raise ValueError(
            "Incorrect arguments. Vocabulary size too small. Set vocab_size>="
            + str(used_ids0)
            + ".  Current value for vocab_size="
            + str(vocab_size)
        )

    # local words against the GLOBAL alphabet; word ids offset by the
    # processes before us so freq indexing stays global
    buckets = preprocess.training_word_buckets(local_cps, alphabet)
    t, wid, freq = flatten_word_buckets(buckets)
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([freq.size], np.int32)
        )
    ).reshape(-1)
    wbase = int(counts[:pid].sum())
    wid = np.where(wid >= 0, wid + wbase, wid).astype(np.int32)
    freq_parts = _allgather_var(freq.astype(np.int32))
    gfreq = np.concatenate(freq_parts).astype(np.int32)

    # global initial count table: local exact tables folded on the host
    from ..ops.train_sparse import _host_table_tomb

    def _fold_global_table(t_loc: np.ndarray, w_loc: np.ndarray):
        """Exact global pair-count table from every process's local
        stream shard (the distributed mirror of host_count_table)."""
        lk, lc = _host_table_tomb(t_loc, w_loc, gfreq)
        k_parts = _allgather_var(lk.astype(np.uint64), i64=True)
        c_parts = _allgather_var(lc.astype(np.int64), i64=True)
        ak = np.concatenate(k_parts)
        ac = np.concatenate(c_parts)
        gk, inv = np.unique(ak, return_inverse=True)
        gcnt = np.zeros(gk.size, np.int64)
        np.add.at(gcnt, inv, ac)
        return gk, gcnt.astype(np.int32)

    uk, uc = _fold_global_table(t, wid)

    # shard the local stream across LOCAL devices at word boundaries,
    # padded to a globally agreed power-of-two capacity
    from .train_sparse_sharded import _shard_stream

    seg_t, seg_w, per = _shard_stream(t, wid, n_local_dev)
    gper = int(
        np.asarray(
            multihost_utils.process_allgather(np.asarray([per], np.int32))
        ).max()
    )
    if gper > per:
        pad_t = np.full((n_local_dev, gper), PAD, np.int32)
        pad_w = np.full((n_local_dev, gper), PAD, np.int32)
        pad_t[:, :per] = seg_t
        pad_w[:, :per] = seg_w
        seg_t, seg_w = pad_t, pad_w

    wide = vocab_size > 65535
    n_live = uk.size
    m_live = int(
        _allgather_i64(
            np.asarray([int((wid >= 0).sum())], np.int64)
        ).sum()
    )
    pcap = int(os.environ.get("YTTM_TRAIN_PCAP", "0")) or min(
        _pcap_budget(n_live, vocab_size - used_ids0), _next_pow2(m_live)
    )
    dcap = int(os.environ.get("YTTM_TRAIN_DCAP", "0")) or _next_pow2(
        min(max(1 << 12, gper >> 6), 1 << 17)
    )
    tk, tc = _fit_table(uk, uc, pcap, wide)

    # build the global arrays: local shard rows -> global data axis
    def to_global(local, spec):
        return multihost_utils.host_local_array_to_global_array(
            local, mesh, spec
        )

    td = to_global(seg_t.reshape(-1), P(DATA_AXIS))
    wd = to_global(seg_w.reshape(-1), P(DATA_AXIS))
    fd = to_global(gfreq, P())
    tkd = to_global(tuple(np.asarray(k) for k in tk), P())
    tcd = to_global(np.asarray(tc), P())
    rules_d = to_global(
        np.full((vocab_size, 4), -1, np.int32), P()
    )
    u0 = to_global(np.asarray(used_ids0, np.int32), P())

    used = used_ids0
    seg = min(x for x in (progress_every, vocab_size) if x)
    t_start = time.time()
    while used < vocab_size:
        limit = min(vocab_size, used + seg)
        td, wd, tkd, tcd, rules_d, used_d, done, overflow, nrec, _ns = (
            _train_delta_sharded(
                td, wd, fd, tkd, tcd,
                to_global(np.asarray(used, np.int32), P()),
                rules_d, u0,
                to_global(np.asarray(limit, np.int32), P()),
                vocab_size, batch_k, pcap, dcap, _MeshRef(mesh),
            )
        )
        used = int(np.asarray(used_d.addressable_data(0)))
        if bool(np.asarray(overflow.addressable_data(0))):
            # double-and-retry, same contract as the single-host driver
            # (train_delta.py): rebuild the exact global table from the
            # live stream shards and continue — a long multi-host run
            # must survive a table overflow.  The doubled-pcap program
            # is one extra compile (persistent-cached across runs);
            # every process takes this branch together because
            # ``overflow`` is replicated.
            pcap *= 2
            if pid == 0:
                print(
                    f"pair-count table overflow: retrying with pcap={pcap}",
                    file=sys.stderr,
                )
            lt = np.concatenate(
                [np.asarray(s.data) for s in td.addressable_shards]
            )
            lw = np.concatenate(
                [np.asarray(s.data) for s in wd.addressable_shards]
            )
            gk, gcv = _fold_global_table(lt, lw)
            while pcap < gk.size:
                pcap *= 2
            tk, tc = _fit_table(gk, gcv, pcap, wide)
            tkd = to_global(tuple(np.asarray(k) for k in tk), P())
            tcd = to_global(np.asarray(tc), P())
            continue
        if progress_every and pid == 0:
            n_merges = used - used_ids0
            dt = time.time() - t_start
            print(
                f"id: {used}/{vocab_size}  merges: {n_merges}  "
                f"({dt:.1f}s, {n_merges / max(dt, 1e-9):.0f} merges/s)",
                file=sys.stderr,
            )
        if bool(np.asarray(done.addressable_data(0))):
            break

    n = used - used_ids0
    if n < vocab_size - used_ids0 and pid == 0:
        print(f"WARNING merged only: {used} pairs of tokens", file=sys.stderr)
    rules_h = np.asarray(rules_d.addressable_data(0))[:n, :3]
    rules = [tuple(map(int, r)) for r in rules_h]

    char2id, rules = rename_tokens(alphabet.char2id, rules, special, vocab_size)
    return BPEState(char2id=char2id, rules=rules, special_tokens=special)
