"""Batched sentence encoding: host pipeline + device merge kernel.

The reference fans sentences out over threads and encodes word-by-word
with a priority queue (encode_parallel bpe.cpp:1697-1738).  The TPU
pipeline instead:

  1. splits all sentences into words with flat array ops,
  2. deduplicates words exactly (BPE is deterministic per word at
     dropout 0, so each unique word is encoded once),
  3. maps chars to ids, collapsing unknown-char runs into placeholder
     tokens >= 10**9 (bpe.cpp:1503-1527),
  4. encodes unique words as padded [batch, length] tensors on device
     (ops/encode_kernel.py), bucketed by length,
  5. scatters results back to occurrences and assembles per-sentence
     outputs with gather/repeat ops.

A host-side word -> ids cache short-circuits step 4 for words seen in
earlier batches.  Dropout > 0 disables dedup and caching (every
occurrence must be sampled independently, bpe.cpp:1415-1453).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import os

from .host import fasttok, preprocess
from .models.state import BOS_TOKEN, EOS_TOKEN, SPACE_TOKEN, BPEState, is_space
from .models.vocab import Vocabulary
from .ops.encode_kernel import (
    PLACEHOLDER_START,
    U16_PAD,
    U16_PH_FLOOR,
    EncoderTables,
    encode_batch,
    pack_tokens_u16,
)
from .ops.stream_kernel import NEWLINE, StreamEncoder

# id-mode fast-path backend: "native" = C++ tokenizer + device merge of
# unique words; "stream" = fully device-resident flat pipeline;
# "matrix" = numpy host pipeline (always used for subwords/dropout).
# Read per call so tests can parameterize over backends.
def _encode_backend() -> str:
    return os.environ.get("YTTM_ENCODE_BACKEND", "native")

ENCODE_BUCKETS = (8, 16, 32, 64, 128, 256, 512)
MAX_DEVICE_LEN = ENCODE_BUCKETS[-1]
# Fixed device batch size per bucket: every (DEVICE_BATCH, cap) shape
# compiles exactly once ever (and hits the persistent compile cache
# across processes).  Oversized row sets are chunked.
DEVICE_BATCH = 8192


def _pad_rows(mats: List[np.ndarray], cap: int) -> np.ndarray:
    k = sum(m.shape[0] for m in mats)
    kp = max(DEVICE_BATCH, -(-k // DEVICE_BATCH) * DEVICE_BATCH)
    out = np.full((kp, cap), -1, dtype=np.int32)
    r = 0
    for m in mats:
        out[r : r + m.shape[0], : m.shape[1]] = m
        r += m.shape[0]
    return out


class Encoder:
    """Stateful encoder bound to a trained model."""

    def __init__(self, state: BPEState, cache_size: int = 1 << 20):
        self.state = state
        self.vocab = Vocabulary(state)
        self.tables = EncoderTables(state)
        sorted_cps = np.sort(
            np.fromiter(state.char2id.keys(), dtype=np.uint32, count=len(state.char2id))
        )
        self._sorted_cps = sorted_cps
        self._sorted_ids = np.fromiter(
            (state.char2id[int(c)] for c in sorted_cps),
            dtype=np.int32,
            count=sorted_cps.size,
        )
        self.space_id = state.char2id[SPACE_TOKEN]
        # reference emission quirk (bpe.cpp:1591-1593): per-word output
        # starts at the first token with id != 0, so when id 0 belongs
        # to a REAL token (custom special ids all >= 1 leave id 0 to ▁),
        # an unmerged word-leading ▁ is dropped.  We reproduce it for
        # bit-exactness; the flag gates the strip and disables the
        # stream fast path (which has no per-word emission step).
        st0 = state.special_tokens
        self._zero_is_real = 0 not in (
            st0.pad_id, st0.unk_id, st0.bos_id, st0.eos_id
        )
        self._cache: Dict[bytes, np.ndarray] = {}
        self._cache_size = cache_size
        # uint16 wire format for the id-mode device round trips (halves
        # the tunnel transfer bytes; ops/encode_kernel.py layout note)
        self._u16_ok = (
            state.vocab_size() < U16_PH_FLOOR
            and state.special_tokens.unk_id >= 0
        )
        self._stream = StreamEncoder(
            self.tables, self._sorted_cps, self._sorted_ids, self.space_id
        )
        # persistent cross-batch word cache for the native path (stable
        # uids + cached results; only novel words hit the device)
        self._wcache: Optional[fasttok.WordCache] = None
        # host-side rule table for the merge dispatch crossover
        self._rtab: Optional[fasttok.RuleTable] = None
        # data mesh over all visible devices (None on single-device
        # hosts); resolved lazily so Encoder construction never forces
        # backend init
        self._mesh = None
        self._mesh_resolved = False

    def _get_mesh(self):
        """Data-parallel device mesh for batch encodes, or None.

        The reference fans encoding out over every hardware thread by
        default (n_threads = hardware_concurrency, bpe.cpp:1638-1640);
        the TPU equivalent is all visible chips.  YTTM_DEVICES caps the
        device count (YTTM_DEVICES=1 disables sharding)."""
        if not self._mesh_resolved:
            self._mesh_resolved = True
            import jax

            from .parallel.mesh import data_mesh

            nd = len(jax.devices())
            cap = int(os.environ.get("YTTM_DEVICES", "0"))
            if cap:
                nd = min(nd, cap)
            self._mesh = data_mesh(nd) if nd > 1 else None
        return self._mesh

    def _dispatch_greedy(self, mat: np.ndarray):
        """Async-dispatch one padded [B, cap] chunk to the device(s):
        sharded over the data mesh when one exists (the production
        multi-chip path), single-device otherwise."""
        mesh = self._get_mesh()
        if mesh is not None and mat.shape[0] % mesh.devices.size == 0:
            from .parallel.encode_sharded import encode_greedy_sharded

            return encode_greedy_sharded(self.tables, mat, mesh)
        import jax.numpy as jnp

        from .ops.encode_kernel import _encode_greedy

        return _encode_greedy(self.tables, jnp.asarray(mat))

    def _use_u16(self) -> bool:
        """uint16 wire format is a *transfer* optimization (remote TPU
        tunnels move ~10-30 MB/s); on the CPU backend it buys nothing
        and this jax build's XLA:CPU intermittently segfaults compiling
        the sharded uint16 program after many compiles in one process
        (observed thrice in the long stress suite) — so the packed path
        is gated to non-CPU backends."""
        if not self._u16_ok:
            return False
        import jax

        return jax.default_backend() != "cpu"

    def _dispatch_greedy_u16(self, mat: np.ndarray):
        """uint16-wire variant of _dispatch_greedy (id-mode only: the
        result has placeholders already mapped to unk).  ``mat`` is the
        int32 token matrix; packing happens here."""
        unk = self.state.special_tokens.unk_id
        m16 = pack_tokens_u16(mat)
        mesh = self._get_mesh()
        if mesh is not None and m16.shape[0] % mesh.devices.size == 0:
            from .parallel.encode_sharded import encode_greedy_sharded_u16

            return encode_greedy_sharded_u16(self.tables, m16, unk, mesh)
        import jax.numpy as jnp

        from .ops.encode_kernel import _encode_greedy_u16

        return _encode_greedy_u16(
            self.tables, jnp.asarray(m16), np.int32(unk)
        )

    def _ruletab(self) -> fasttok.RuleTable:
        if self._rtab is None:
            self._rtab = fasttok.RuleTable(self.state.rules)
        return self._rtab

    def _merge_policy(self, n_tokens: int) -> str:
        """Dispatch crossover for novel-word merging: "host" (C++ greedy
        merge, the latency arm) vs "device" (batched kernel, the
        throughput arm).

        Measured on the TPU-v5e-via-tunnel rig (PROFILE.md §1): a device
        dispatch costs a tunnel round trip regardless of size, so small
        novel-word batches — every warm-cache CLI chunk, and most cold
        ones after dedup — are round-trip-bound while the host merges
        them in microseconds-to-milliseconds.  The device arm pays off
        only for very large cold batches (or multi-chip meshes), hence a
        high default crossover.  YTTM_ENCODE_MERGE=host|device forces an
        arm; YTTM_HOST_MERGE_TOKENS moves the auto threshold."""
        mode = os.environ.get("YTTM_ENCODE_MERGE", "auto")
        if mode in ("host", "device"):
            return mode
        thr = int(os.environ.get("YTTM_HOST_MERGE_TOKENS", str(1 << 22)))
        return "host" if n_tokens <= thr else "device"

    def _word_cache(self) -> fasttok.WordCache:
        if self._wcache is None:
            self._wcache = fasttok.WordCache(
                max_words=int(os.environ.get("YTTM_WORD_CACHE", str(1 << 22)))
            )
        return self._wcache

    # -- char -> id mapping with unknown-run collapse ----------------------

    def _idify_rows(self, rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[k, L] codepoints -> ([k, L+1] ids with space prefix, lengths).

        Unknown-char runs collapse to placeholder ids >= PLACEHOLDER_START,
        numbered per word in order of appearance (bpe.cpp:1503-1527).
        """
        k, length = rows.shape
        pos = np.searchsorted(self._sorted_cps, rows)
        pos_c = np.minimum(pos, self._sorted_cps.size - 1)
        known = (self._sorted_cps[pos_c] == rows) if self._sorted_cps.size else np.zeros(
            rows.shape, bool
        )
        ids = np.where(known, self._sorted_ids[pos_c], -1).astype(np.int64)
        unk = ~known
        run_start = unk & ~np.concatenate([np.zeros((k, 1), bool), unk[:, :-1]], axis=1)
        ph = np.cumsum(run_start, axis=1) - 1
        vals = np.where(known, ids, PLACEHOLDER_START + ph)
        keepm = known | run_start
        newlen = keepm.sum(axis=1).astype(np.int64)
        dest = np.cumsum(keepm, axis=1) - 1
        out = np.full((k, length + 1), -1, dtype=np.int64)
        out[:, 0] = self.space_id
        rr = np.nonzero(keepm)
        out[rr[0], dest[rr] + 1] = vals[rr]
        return out.astype(np.int32), newlen + 1

    # -- unique-word encoding ---------------------------------------------

    def _encode_unique(
        self,
        dd: preprocess.DedupWords,
        dropout_prob: float,
        key=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode all unique words; returns ragged results as
        (flat_ids, offsets) with offsets of length n_unique+1."""
        results: List[Optional[np.ndarray]] = [None] * dd.n_unique
        use_cache = dropout_prob == 0.0

        # bucket -> list of (uids, id-matrix)
        buckets: Dict[int, List[Tuple[np.ndarray, np.ndarray]]] = {}
        base = 0
        for length, rows in zip(dd.group_lens, dd.group_rows):
            k = rows.shape[0]
            uids = np.arange(base, base + k)
            base += k
            todo = np.ones(k, dtype=bool)
            if use_cache and self._cache:
                for i in range(k):
                    hit = self._cache.get(rows[i].tobytes())
                    if hit is not None:
                        results[uids[i]] = hit
                        todo[i] = False
            if not todo.any():
                continue
            rows_t = rows[todo]
            uids_t = uids[todo]
            mat, _ = self._idify_rows(rows_t)
            padded_len = mat.shape[1]
            if padded_len > MAX_DEVICE_LEN:
                # host fallback for monster words (rare)
                for i in range(mat.shape[0]):
                    w = mat[i][mat[i] >= 0]
                    res = self._host_merge(w.tolist())
                    results[uids_t[i]] = np.asarray(res, dtype=np.int64)
                    if use_cache:
                        self._maybe_cache(rows_t[i], results[uids_t[i]])
                continue
            cap = next(c for c in ENCODE_BUCKETS if c >= padded_len)
            buckets.setdefault(cap, []).append((uids_t, rows_t, mat))

        for cap, entries in buckets.items():
            uids_all = np.concatenate([e[0] for e in entries])
            raw_all = [e[1] for e in entries]
            mat = _pad_rows([e[2] for e in entries], cap)
            outs = []
            for c0 in range(0, mat.shape[0], DEVICE_BATCH):
                chunk = mat[c0 : c0 + DEVICE_BATCH]
                if dropout_prob == 0.0:
                    outs.append(np.asarray(self._dispatch_greedy(chunk)))
                else:
                    outs.append(
                        encode_batch(self.tables, chunk, dropout_prob, key)
                    )
            k = uids_all.size
            out = np.concatenate(outs, axis=0)[:k]
            # vectorized ragged extraction: one boolean mask for the whole
            # bucket, then cheap per-row views into the flat result
            mask = out >= 0
            lens_b = mask.sum(axis=1)
            flat_b = out[mask].astype(np.int64)
            offs_b = np.zeros(k + 1, dtype=np.int64)
            np.cumsum(lens_b, out=offs_b[1:])
            if use_cache:
                flat_raws = [row for r in raw_all for row in r]
                cache = self._cache
                if len(cache) >= self._cache_size:
                    cache.clear()
                for i in range(k):
                    v = flat_b[offs_b[i] : offs_b[i + 1]]
                    results[uids_all[i]] = v
                    cache[flat_raws[i].tobytes()] = v
            else:
                for i in range(k):
                    results[uids_all[i]] = flat_b[offs_b[i] : offs_b[i + 1]]

        lens = np.fromiter(
            (r.size for r in results), dtype=np.int64, count=dd.n_unique
        )
        offsets = np.zeros(dd.n_unique + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = (
            np.concatenate(results) if dd.n_unique else np.zeros(0, dtype=np.int64)
        )
        if self._zero_is_real:
            flat, offsets = self._strip_zero_heads(flat, offsets)
        return flat, offsets

    @staticmethod
    def _strip_zero_heads(flat: np.ndarray, offsets: np.ndarray):
        """Drop each word's leading token when its id is 0 (the
        reference's find_if emission skip, bpe.cpp:1591-1593).  Two
        distinct real tokens can't both have id 0, so at most one
        leading token goes per word."""
        lens = np.diff(offsets)
        heads = offsets[:-1]
        ne = lens > 0
        dropw = np.zeros(lens.shape, bool)
        dropw[ne] = flat[heads[ne]] == 0
        if not dropw.any():
            return flat, offsets
        keep = np.ones(flat.size, bool)
        keep[heads[dropw]] = False
        new_off = np.zeros_like(offsets)
        np.cumsum(lens - dropw, out=new_off[1:])
        return flat[keep], new_off

    def _maybe_cache(self, raw_row: np.ndarray, ids: np.ndarray) -> None:
        if len(self._cache) >= self._cache_size:
            self._cache.clear()  # simple epoch eviction
        self._cache[raw_row.tobytes()] = ids

    def _host_merge(self, word: List[int]) -> List[int]:
        """Oracle-style greedy merge for words too long for the device."""
        rule2id = self.vocab.rule2id
        rules = self.state.rules
        cur = word
        while True:
            best = None
            for i in range(len(cur) - 1):
                r = rule2id.get((cur[i], cur[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                return cur
            x, y, z = rules[best]
            out, i, n = [], 0, len(cur)
            while i < n:
                if i + 1 < n and cur[i] == x and cur[i + 1] == y:
                    out.append(z)
                    i += 2
                else:
                    out.append(cur[i])
                    i += 1
            cur = out

    # -- public API --------------------------------------------------------

    def encode(
        self,
        sentences: Sequence[str],
        output_type: str = "id",
        bos: bool = False,
        eos: bool = False,
        reverse: bool = False,
        dropout_prob: float = 0.0,
        key=None,
    ):
        st = self.state.special_tokens
        if bos and st.bos_id == -1:
            raise ValueError("Can't add <BOS> token. Model was trained without it.")
        if eos and st.eos_id == -1:
            raise ValueError("Can't add <EOS> token. Model was trained without it.")
        if dropout_prob < 0 or dropout_prob > 1:
            raise ValueError(
                "dropout_prob value must be in the range [0, 1]. Current value of "
                f"dropout_prob = {dropout_prob}"
            )

        n_sent = len(sentences)
        if n_sent == 0:
            return []

        if (
            output_type == "id"
            and dropout_prob > 0.0
            and _encode_backend() == "native"
            and fasttok.available()
            and not self._zero_is_real
            and os.environ.get("YTTM_DROPOUT_NATIVE", "1") != "0"
        ):
            # dropout disables dedup/caching (every occurrence samples
            # independently, bpe.cpp:1415-1453) — the matrix path pays a
            # padded device row per OCCURRENCE, so dropout encodes run
            # through the C++ tokenizer + per-occurrence host merge
            joined = "\n".join(sentences) + "\n"
            if joined.count("\n") == n_sent:
                return self._encode_ids_dropout_native(
                    joined.encode("utf-8"), n_sent, bos, eos, reverse,
                    dropout_prob, key,
                )

        if output_type == "id" and dropout_prob == 0.0:
            # fast paths operate on a newline-joined byte stream; need no
            # sentence to embed a newline (it would break the marking)
            joined = "\n".join(sentences) + "\n"
            if joined.count("\n") == n_sent:
                backend = _encode_backend()
                if backend == "native" and fasttok.available():
                    return self._encode_ids_native(
                        joined.encode("utf-8"), n_sent, bos, eos, reverse
                    )
                if backend in ("native", "stream") and not self._zero_is_real:
                    # the flat stream pipeline has no per-word emission
                    # step to apply the id-0 head quirk; such (exotic)
                    # models take the matrix path below
                    return self._encode_ids_stream(joined, n_sent, bos, eos, reverse)

        arrs = [
            np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in sentences
        ]
        sep = np.asarray([32], dtype=np.uint32)
        parts: List[np.ndarray] = []
        sent_starts = np.zeros(n_sent, dtype=np.int64)
        off = 0
        for i, a in enumerate(arrs):
            sent_starts[i] = off
            parts.append(a)
            parts.append(sep)
            off += a.size + 1
        stream = np.concatenate(parts) if parts else np.zeros(0, np.uint32)

        starts, lengths = preprocess.word_spans(stream)
        sid = np.searchsorted(sent_starts, starts, side="right") - 1

        if dropout_prob > 0.0:
            # every occurrence independent: skip dedup by unique-ifying
            # with occurrence position appended (cheap trick: treat each
            # occurrence as its own group row)
            dd = self._no_dedup(stream, starts, lengths)
        else:
            dd = preprocess.dedup_words(stream, starts, lengths)

        flat, offsets = self._encode_unique(dd, dropout_prob, key)

        occ = dd.occurrence_uid
        occ_lens = offsets[occ + 1] - offsets[occ]
        occ_starts_flat = offsets[occ]
        total = int(occ_lens.sum())
        if total:
            occ_off = np.cumsum(occ_lens) - occ_lens
            pos_in_occ = np.arange(total, dtype=np.int64) - np.repeat(occ_off, occ_lens)
            out_ids = flat[np.repeat(occ_starts_flat, occ_lens) + pos_in_occ]
            out_sid = np.repeat(sid, occ_lens)
        else:
            out_ids = np.zeros(0, dtype=np.int64)
            out_sid = np.zeros(0, dtype=np.int64)

        # split at sentence boundaries
        bounds = np.searchsorted(out_sid, np.arange(n_sent + 1))

        if output_type == "id":
            unk = st.unk_id
            out_ids = np.where(out_ids >= PLACEHOLDER_START, unk, out_ids)
            big = out_ids.tolist()  # one C-level conversion
            b = bounds.tolist()
            result = []
            if not bos and not eos and not reverse:
                for i in range(n_sent):
                    result.append(big[b[i] : b[i + 1]])
            else:
                pre = [st.bos_id] if bos else []
                post = [st.eos_id] if eos else []
                for i in range(n_sent):
                    ids = pre + big[b[i] : b[i + 1]] + post
                    if reverse:
                        ids.reverse()
                    result.append(ids)
            return result
        elif output_type == "subword":
            piece = self.vocab.piece
            # raw text for placeholders, resolved per unique word
            ph_text = self._placeholder_texts(dd)
            result = []
            occ_bounds = np.searchsorted(sid, np.arange(n_sent + 1))
            for i in range(n_sent):
                pieces: List[str] = []
                if bos:
                    pieces.append(BOS_TOKEN)
                for j in range(occ_bounds[i], occ_bounds[i + 1]):
                    u = occ[j]
                    ids = flat[offsets[u] : offsets[u + 1]]
                    for t in ids:
                        t = int(t)
                        if t >= PLACEHOLDER_START:
                            pieces.append(ph_text[(u, t - PLACEHOLDER_START)])
                        else:
                            pieces.append(piece[t])
                if eos:
                    pieces.append(EOS_TOKEN)
                if reverse:
                    pieces.reverse()
                result.append(pieces)
            return result
        else:
            raise ValueError('output_type must be equal to "id" or "subword"')

    # -- native (C++ host tokenizer + device merge) fast path --------------

    def _merge_dispatch(self, words_flat: np.ndarray, word_off: np.ndarray):
        """Stage 1 of unique-word merging: pack length buckets and
        async-dispatch every device chunk.  Returns opaque state for
        ``_merge_collect`` — between the two calls the device works
        while the host is free (the CLI stream loop tokenizes the next
        chunk there, PROFILE.md §1)."""
        n_uniq = word_off.size - 1
        if (
            n_uniq
            and fasttok.available()
            and self._merge_policy(int(words_flat.size)) == "host"
        ):
            rf, ro = self._ruletab().merge_words(words_flat, word_off)
            return ("host", rf, ro)
        lengths = np.diff(word_off).astype(np.int64)
        res_lens = np.zeros(n_uniq, np.int64)
        pending = []
        prev_cap = 1
        for cap in ENCODE_BUCKETS:
            sel = np.nonzero((lengths > prev_cap) & (lengths <= cap))[0]
            prev_cap = cap
            if sel.size == 0:
                continue
            idx2d = word_off[sel][:, None].astype(np.int64) + np.arange(cap)[None, :]
            in_row = np.arange(cap)[None, :] < lengths[sel][:, None]
            mat = np.where(
                in_row, words_flat[np.minimum(idx2d, words_flat.size - 1)], -1
            ).astype(np.int32)
            # snap the row count to a small tier first: steady-state CLI
            # chunks have few novel words, and shipping a full 8192-row
            # padded batch through the ~10-30 MB/s tunnel for a handful
            # of rows was the dominant per-chunk cost (PROFILE.md §1)
            k = mat.shape[0]
            kp = next(
                (r for r in (512, 2048) if k <= r),
                -(-k // DEVICE_BATCH) * DEVICE_BATCH,
            )
            if kp != k:
                mat = np.concatenate(
                    [mat, np.full((kp - k, cap), -1, np.int32)]
                )
            dispatch = (
                self._dispatch_greedy_u16
                if self._use_u16()
                else self._dispatch_greedy
            )
            futs = [
                dispatch(mat[c0 : c0 + DEVICE_BATCH])
                for c0 in range(0, kp, DEVICE_BATCH)
            ]
            pending.append((sel, futs))
        # monster words (beyond the largest bucket) merge on the host —
        # rare, and it overlaps the in-flight device work
        monsters = np.nonzero(lengths > ENCODE_BUCKETS[-1])[0]
        monster_res = {}
        for u in monsters:
            w = words_flat[word_off[u] : word_off[u + 1]].tolist()
            r = self._host_merge(w)
            monster_res[int(u)] = np.asarray(r, np.int32)
            res_lens[u] = len(r)
        return pending, monster_res, res_lens, n_uniq

    def _merge_collect(self, st):
        """Stage 2: block on the device results and assemble the ragged
        (results_flat, res_off) in uid order."""
        if st[0] == "host":
            _, rf, ro = st
            if self._zero_is_real:
                rf, ro = self._strip_zero_heads(rf, ro)
            return rf, ro.astype(np.int32)
        pending, monster_res, res_lens, n_uniq = st
        parts = []
        for sel, futs in pending:
            out = np.concatenate([np.asarray(f) for f in futs], axis=0)[: sel.size]
            if out.dtype == np.uint16:
                mask = out != U16_PAD
                out = out.astype(np.int32)
            else:
                mask = out >= 0
            res_lens[sel] = mask.sum(axis=1)
            parts.append((sel, out, mask))

        res_off = np.zeros(n_uniq + 1, np.int64)
        np.cumsum(res_lens, out=res_off[1:])
        results_flat = np.empty(int(res_off[-1]), np.int32)
        for sel, out, mask in parts:
            row_lens = mask.sum(axis=1).astype(np.int64)
            total = int(row_lens.sum())
            if not total:
                continue
            row_off = np.cumsum(row_lens) - row_lens
            pos = np.arange(total, dtype=np.int64) - np.repeat(row_off, row_lens)
            dst = np.repeat(res_off[sel], row_lens) + pos
            results_flat[dst] = out[mask]
        for u, r in monster_res.items():
            results_flat[res_off[u] : res_off[u + 1]] = r
        if self._zero_is_real:
            results_flat, res_off = self._strip_zero_heads(
                results_flat, res_off
            )
        return results_flat, res_off.astype(np.int32)

    def _merge_unique_words(self, words_flat: np.ndarray, word_off: np.ndarray):
        """Device-encode each unique word; returns (results_flat,
        res_off [U+1]) in uid order."""
        return self._merge_collect(self._merge_dispatch(words_flat, word_off))

    def _tokenize_native(self, data: bytes):
        return fasttok.tokenize(
            data, self._sorted_cps, self._sorted_ids, self.space_id
        )

    def _tokenize_cached(self, data: bytes):
        """Tokenize against the persistent word cache: device-encode only
        words never seen before, register their results, return the
        occurrence stream (global uids)."""
        wc = self._word_cache()
        words_flat, word_off, occ, base = wc.tokenize(
            data, self._sorted_cps, self._sorted_ids, self.space_id
        )
        if word_off.size > 1:
            rf, ro = self._merge_unique_words(words_flat, word_off)
            unk = self.state.special_tokens.unk_id
            rf = np.where(rf >= PLACEHOLDER_START, unk, rf)
            wc.add_results(rf, ro, base)
        return wc, occ

    def encode_text_cli(self, data: bytes) -> bytes:
        """CLI zero-copy path: newline-separated bytes in, reference-format
        id text out.  C++ split/dedup -> device merge of novel words ->
        C++ expand from the persistent result cache."""
        wc, occ = self._tokenize_cached(data)
        return wc.format(occ)

    def encode_stream_cli(self, chunks):
        """Pipelined CLI path over an iterable of newline-terminated byte
        chunks: the host tokenize of chunk k+1 runs while the device
        merges chunk k's novel words (the dispatch/collect split —
        PROFILE.md §1; the reference overlaps nothing, its workers are
        the host).  Yields one formatted output bytes per input chunk,
        in order."""
        unk = self.state.special_tokens.unk_id
        wc = self._word_cache()
        pending = None  # (dispatch_state, occ, base) of the previous chunk

        def finish(p):
            st, occ, base = p
            if st is not None:
                rf, ro = self._merge_collect(st)
                rf = np.where(rf >= PLACEHOLDER_START, unk, rf)
                wc.add_results(rf, ro, base)
            return wc.format(occ)

        for chunk in chunks:
            # an eviction would invalidate the pending chunk's uids:
            # flush it first, then let tokenize's own check fire
            if pending is not None and wc.n_words > wc.max_words:
                yield finish(pending)
                pending = None
            words_flat, word_off, occ, base = wc.tokenize(
                chunk, self._sorted_cps, self._sorted_ids, self.space_id
            )
            # queue chunk k+1's device work before blocking on chunk k's
            # results: the device stream never drains
            st = (
                self._merge_dispatch(words_flat, word_off)
                if word_off.size > 1
                else None
            )
            out = finish(pending) if pending is not None else None
            pending = (st, occ, base)
            if out is not None:
                yield out
        if pending is not None:
            yield finish(pending)

    def _encode_ids_native(
        self, data: bytes, n_sent: int, bos: bool, eos: bool, reverse: bool
    ) -> List[List[int]]:
        wc, occ = self._tokenize_cached(data)
        flat = wc.expand_ids(occ)
        st = self.state.special_tokens
        marks = np.nonzero(flat == -1)[0]
        assert marks.size == n_sent, (marks.size, n_sent)
        big = flat.tolist()
        bounds = [0] + (marks + 1).tolist()
        pre = [st.bos_id] if bos else []
        post = [st.eos_id] if eos else []
        result = []
        for i in range(n_sent):
            ids = big[bounds[i] : bounds[i + 1] - 1]
            if bos or eos:
                ids = pre + ids + post
            if reverse:
                ids.reverse()
            result.append(ids)
        return result

    def _encode_ids_dropout_native(
        self, data: bytes, n_sent: int, bos: bool, eos: bool,
        reverse: bool, p: float, key,
    ) -> List[List[int]]:
        """ID-mode BPE-dropout via the C++ tokenizer + per-occurrence
        host merge (DropoutQueue semantics, bpe.cpp:1415-1453; explicit
        seed instead of the reference's shared unseeded mt19937)."""
        words_flat, word_off, occ, _ = fasttok.tokenize(
            data, self._sorted_cps, self._sorted_ids, self.space_id
        )
        if key is None:
            seed = int.from_bytes(os.urandom(8), "little")
        else:
            import hashlib

            import jax

            kd = np.asarray(jax.random.key_data(key)).tobytes()
            seed = int.from_bytes(
                hashlib.blake2b(kd, digest_size=8).digest(), "little"
            )
        flat = self._ruletab().merge_occurrences_dropout(
            words_flat, word_off, occ, p, seed
        )
        st = self.state.special_tokens
        sent_mark = flat == -1
        flat = np.where(
            (flat >= PLACEHOLDER_START) & ~sent_mark, st.unk_id, flat
        )
        marks = np.nonzero(sent_mark)[0]
        assert marks.size == n_sent, (marks.size, n_sent)
        big = flat.tolist()
        bounds = [0] + (marks + 1).tolist()
        pre = [st.bos_id] if bos else []
        post = [st.eos_id] if eos else []
        result = []
        for i in range(n_sent):
            ids = big[bounds[i] : bounds[i + 1] - 1]
            if bos or eos:
                ids = pre + ids + post
            if reverse:
                ids.reverse()
            result.append(ids)
        return result

    def encode_bytes_flat(self, data: bytes):
        """Newline-separated text bytes -> (flat id array, sentinel).

        The zero-copy CLI path: ids come back as a flat array with a
        sentinel entry per '\n'; placeholders are already mapped to
        unk_id.  Array dtype is uint16 (sentinel 0xFFFF) when the vocab
        fits, else int32 (sentinel NEWLINE)."""
        st = self.state.special_tokens
        use_u16 = self.state.vocab_size() < 0xFFFE and st.unk_id >= 0
        if use_u16:
            flat = self._stream.encode_bytes(
                data, pack_u16=True, unk_id=st.unk_id
            )
            return flat, 0xFFFF
        flat = self._stream.encode_bytes(data)
        flat = np.where(flat >= PLACEHOLDER_START, st.unk_id, flat)
        return flat, NEWLINE

    def _encode_ids_stream(
        self, joined: str, n_sent: int, bos: bool, eos: bool, reverse: bool
    ) -> List[List[int]]:
        """ID-mode fast path via the flat device pipeline."""
        st = self.state.special_tokens
        use_u16 = self.state.vocab_size() < 0xFFFE and st.unk_id >= 0
        if use_u16:
            flat16 = self._stream.encode_bytes(
                joined.encode("utf-8"), pack_u16=True, unk_id=st.unk_id
            )
            flat = flat16.astype(np.int32)
            flat[flat16 == 0xFFFF] = NEWLINE
        else:
            flat = self._stream.encode_bytes(joined.encode("utf-8"))
            flat = np.where(flat >= PLACEHOLDER_START, st.unk_id, flat)
        marks = np.nonzero(flat == NEWLINE)[0]
        assert marks.size == n_sent, (marks.size, n_sent)
        big = flat.tolist()
        bounds = [0] + (marks + 1).tolist()
        result = []
        pre = [st.bos_id] if bos else []
        post = [st.eos_id] if eos else []
        for i in range(n_sent):
            ids = big[bounds[i] : bounds[i + 1] - 1]  # drop the sentinel
            if bos or eos:
                ids = pre + ids + post
            if reverse:
                ids.reverse()
            result.append(ids)
        return result

    def _no_dedup(self, stream, starts, lengths) -> preprocess.DedupWords:
        """Occurrence-preserving variant of dedup (for dropout)."""
        n = starts.size
        group_lens: List[int] = []
        group_rows: List[np.ndarray] = []
        group_counts: List[np.ndarray] = []
        occurrence_uid = np.zeros(n, dtype=np.int64)
        base = 0
        for length in np.unique(lengths).tolist():
            sel = np.nonzero(lengths == length)[0]
            rows = stream[starts[sel][:, None] + np.arange(length)[None, :]]
            occurrence_uid[sel] = base + np.arange(sel.size)
            group_lens.append(int(length))
            group_rows.append(np.ascontiguousarray(rows))
            group_counts.append(np.ones(sel.size, dtype=np.int64))
            base += sel.size
        return preprocess.DedupWords(
            group_lens=group_lens,
            group_rows=group_rows,
            group_counts=group_counts,
            occurrence_uid=occurrence_uid,
            n_unique=base,
            uid_group=np.zeros(base, np.int32),
            uid_row=np.zeros(base, np.int64),
        )

    def _placeholder_texts(self, dd: preprocess.DedupWords) -> Dict[Tuple[int, int], str]:
        """Raw text of each unknown-char run, per unique word."""
        out: Dict[Tuple[int, int], str] = {}
        known_set = self._sorted_cps
        base = 0
        for rows in dd.group_rows:
            k, length = rows.shape
            pos = np.searchsorted(known_set, rows)
            pos_c = np.minimum(pos, max(known_set.size - 1, 0))
            known = (known_set[pos_c] == rows) if known_set.size else np.zeros(
                rows.shape, bool
            )
            has_unknown = ~known.all(axis=1)
            for i in np.nonzero(has_unknown)[0]:
                row = rows[i]
                kn = known[i]
                ph = 0
                j = 0
                while j < length:
                    if not kn[j]:
                        j0 = j
                        while j < length and not kn[j]:
                            j += 1
                        out[(base + i, ph)] = "".join(chr(int(c)) for c in row[j0:j])
                        ph += 1
                    else:
                        j += 1
            base += k
        return out
