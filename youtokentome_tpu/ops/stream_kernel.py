"""Flat-stream device encode pipeline: raw UTF-8 bytes in, token ids out.

This is the flagship TPU kernel.  The reference encodes with per-word
linked lists and priority queues on the CPU (bpe.cpp:1455-1632); here the
*entire* pipeline — UTF-8 decode, word segmentation, char->id mapping,
unknown-run collapse, and the greedy BPE merge fixed point — runs on
device over a single flat token stream with static shapes.  The host only
uploads a byte chunk and downloads the final ids.

Representation: after decoding, the chunk becomes a compacted stream of
tokens ``t[i]`` with a parallel word-id array ``wid[i]``:

  * every word is emitted as [space_id, char ids...] (the U+2581 prefix,
    bpe.cpp:1514),
  * maximal runs of unknown chars collapse to one placeholder token
    >= 10**9, numbered per word (bpe.cpp:1503-1527),
  * every '\n' becomes its own single-token pseudo-word carrying the
    sentinel NEWLINE (-2) so the host can split sentences after download,
  * padding slots have t = wid = -1.

The merge fixed point iterates: look up the rule rank of every adjacent
within-word pair, take each word's minimum rank (``jax.ops.segment_min``
over the word ids), merge the leftmost-non-overlapping occurrences of
that rank in each word, and compact the stream.  Equivalence with the
reference's (rank, pos) priority queue is argued in encode_kernel.py;
the same argument covers all words at once because words are
independent.

Kernel-engineering note: on the target toolchain XLA *compile* time, not
run time, dominates (minutes per program; sub-millisecond execution), so
the op palette is restricted to the cheapest-to-compile primitives —
cumsum, lax.cummax, one-hot scatters, segment reductions and gathers —
and the host wrapper uses a single fixed chunk capacity so exactly one
program is ever compiled (persistent-cached across processes).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.state import INVALID_UNICODE, SPACE_TOKEN
from .encode_kernel import PLACEHOLDER_START, EncoderTables
from .hashmap import MISS

NEWLINE = -2  # sentence-boundary sentinel token in the output stream
PAD = -1


def _compact(keep: jnp.ndarray, arrays, fill=PAD):
    """Front-pack each array's kept entries (order preserved) via ONE
    multi-operand sort keyed on kept position.  Scatter-free: XLA lowers
    masked scatters to serialized HBM updates on TPU (~3x slower than
    the fused bitonic sort network this compiles to)."""
    n = keep.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(keep, idx, np.int32(0x7FFFFFFF))
    sorted_ = lax.sort((key,) + tuple(arrays), num_keys=1)[1:]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    live = idx < n_keep
    outs = [jnp.where(live, a, jnp.asarray(fill, a.dtype)) for a in sorted_]
    return outs, n_keep


def _seg_start_index(seg_start: jnp.ndarray) -> jnp.ndarray:
    """Index of the segment start position for every element."""
    idx = jnp.arange(seg_start.shape[0])
    return lax.cummax(jnp.where(seg_start, idx, 0))


def seg_cumsum(values: jnp.ndarray, seg_start: jnp.ndarray) -> jnp.ndarray:
    """Inclusive per-segment cumulative sum (segments contiguous):
    global cumsum minus the exclusive cumsum at each segment's start."""
    cs = jnp.cumsum(values)
    ws = _seg_start_index(seg_start)
    base = cs[ws] - values[ws]
    return cs - base


# ---------------------------------------------------------------------------
# stage 1: UTF-8 decode (device port of ops/utf8.py's closed form)
# ---------------------------------------------------------------------------


def _utf8_decode_device(b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[N] uint8 -> (codepoints [N] uint32 at char-start positions,
    is_start [N] bool).  Invalid bytes yield INVALID_UNICODE starts."""
    n = b.shape[0]
    b32 = b.astype(jnp.uint32)
    is_cont = (b & 0xC0) == 0x80

    def shifted(x, k, fill):
        return jnp.concatenate([x[k:], jnp.full((k,), fill, x.dtype)])

    b1 = shifted(b32, 1, 0)
    b2 = shifted(b32, 2, 0)
    b3 = shifted(b32, 3, 0)
    c1 = shifted(is_cont, 1, False)
    c2 = shifted(is_cont, 2, False)
    c3 = shifted(is_cont, 3, False)

    ascii_ = b < 0x80
    lead2 = (b & 0xE0) == 0xC0
    lead3 = (b & 0xF0) == 0xE0
    lead4 = (b & 0xF8) == 0xF0

    cp2 = ((b32 & 0x1F) << 6) | (b1 & 0x3F)
    cp3 = ((b32 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
    cp4 = (
        ((b32 & 0x07) << 18)
        | ((b1 & 0x3F) << 12)
        | ((b2 & 0x3F) << 6)
        | (b3 & 0x3F)
    )

    def ok_cp(cp):
        return (cp < 0xD800) | ((0xDFFF < cp) & (cp < 0x110000))

    ok2 = lead2 & c1 & (cp2 >= 0x80) & ok_cp(cp2)
    ok3 = lead3 & c1 & c2 & (cp3 >= 0x800) & ok_cp(cp3)
    ok4 = lead4 & c1 & c2 & c3 & (cp4 >= 0x10000) & ok_cp(cp4)

    length = jnp.where(ok2, 2, jnp.where(ok3, 3, jnp.where(ok4, 4, 1)))
    valid_multi = ok2 | ok3 | ok4

    # coverage of continuation bytes by valid multi-byte chars.  Valid
    # chars never overlap (their tails are continuation bytes, and valid
    # starts are not), so the most recent valid multi-byte start fully
    # determines coverage — a cummax + one gather, no scatter.
    idx = jnp.arange(n)
    last_multi = lax.cummax(jnp.where(valid_multi, idx, -1))
    lm = jnp.maximum(last_multi, 0)
    covered = (last_multi >= 0) & (idx > last_multi) & (idx < last_multi + length[lm])
    is_start = ~covered

    cp = jnp.full((n,), INVALID_UNICODE, jnp.uint32)
    cp = jnp.where(ascii_, b32, cp)
    cp = jnp.where(ok2, cp2, cp)
    cp = jnp.where(ok3, cp3, cp)
    cp = jnp.where(ok4, cp4, cp)
    return cp, is_start


# ---------------------------------------------------------------------------
# stage 2: build the token stream
# ---------------------------------------------------------------------------


def _is_space_cp(cp: jnp.ndarray) -> jnp.ndarray:
    return (cp == 32) | ((cp >= 9) & (cp <= 13)) | (cp == SPACE_TOKEN)


def _build_stream(
    bytes_u8: jnp.ndarray,
    n_bytes: jnp.ndarray,
    alpha_cps: jnp.ndarray,
    alpha_ids: jnp.ndarray,
    space_id: jnp.ndarray,
):
    """bytes -> (t [M] int32 tokens, wid [M] int32 word ids, n_tokens).

    M = floor(1.5 * N) + 4 covers the worst case ("a\na\n" = 1.5 tokens
    per byte).
    """
    n = bytes_u8.shape[0]
    m = (3 * n) // 2 + 4
    pos_b = jnp.arange(n)
    in_range = pos_b < n_bytes

    cp, is_start = _utf8_decode_device(bytes_u8)
    char_ok = is_start & in_range & (cp != INVALID_UNICODE)

    # compact codepoints (drop invalid + non-starts); pad tail with spaces
    (cstream_i,), n_c = _compact(char_ok, (cp.astype(jnp.int32),), fill=32)
    cstream = cstream_i.astype(jnp.uint32)
    cidx = jnp.arange(n)
    live = cidx < n_c

    is_nl = (cstream == 10) & live
    is_sp = _is_space_cp(cstream) & ~is_nl
    regular = live & ~is_nl & ~is_sp
    prev_regular = jnp.concatenate([jnp.zeros((1,), bool), regular[:-1]])
    word_start = regular & ~prev_regular
    seg_start = word_start | is_nl  # segment = word or newline pseudo-word

    # char -> id (binary search over the sorted alphabet)
    a_pos = jnp.searchsorted(alpha_cps, cstream)
    a_pos_c = jnp.minimum(a_pos, alpha_cps.shape[0] - 1)
    known = (alpha_cps[a_pos_c] == cstream) & regular
    char_id = jnp.where(known, alpha_ids[a_pos_c], -1)

    # unknown-run collapse within words
    unknown = regular & ~known
    prev_unknown = jnp.concatenate([jnp.zeros((1,), bool), unknown[:-1]])
    run_start = unknown & (~prev_unknown | word_start)
    ordinal = seg_cumsum(run_start.astype(jnp.int32), seg_start) - 1
    tok_of_char = jnp.where(
        known, char_id, PLACEHOLDER_START + jnp.maximum(ordinal, 0)
    ).astype(jnp.int32)
    emit_char = known | run_start

    # word ids (newlines count as their own word)
    wid_c = jnp.cumsum(seg_start.astype(jnp.int32)) - 1

    # emission: word starts emit [space_id, tok] (their first char always
    # emits: it is either known or a run start); other kept chars emit
    # [tok]; newlines emit [NEWLINE].  Interleave (prefix slot, token
    # slot) pairs and compact.
    first_tok = jnp.where(
        word_start, space_id, jnp.where(is_nl, NEWLINE, tok_of_char)
    )
    keep_a = word_start | emit_char | is_nl
    keep_b = word_start
    vals = jnp.stack([first_tok, tok_of_char], axis=1).reshape(-1)
    wids = jnp.stack([wid_c, wid_c], axis=1).reshape(-1)
    keeps = jnp.stack([keep_a, keep_b], axis=1).reshape(-1)
    (t2n, w2n), n_tokens = _compact(keeps, (vals, wids))
    return t2n[:m], w2n[:m], n_tokens


# ---------------------------------------------------------------------------
# stage 2.5: on-device word dedup
# ---------------------------------------------------------------------------


def _mix32(x: jnp.ndarray, c1: int, c2: int) -> jnp.ndarray:
    h = x.astype(jnp.uint32) * np.uint32(c1)
    h = h ^ (h >> np.uint32(15))
    h = h * np.uint32(c2)
    h = h ^ (h >> np.uint32(13))
    return h


def _dedup_words(t, wid, n_tokens):
    """Replace the stream with unique words only; return the info needed
    to expand results back to occurrences.

    BPE is deterministic per word, so each unique word is merged once
    (the reference instead dedups words only when training,
    bpe.cpp:388-418 — doing it for encoding too is the main throughput
    lever on natural text).  Identity is a (length, 64-bit hash) key over
    (token, in-word-position) pairs; a collision needs two different
    words with equal length and equal 64-bit hashes (~2^-64 per pair).

    Returns (ut, uwid, un_tokens, occ_uid [NSEG], ustart [NSEG],
    ulen0 [NSEG], n_words) where occ_uid maps every original word id to
    its unique-word id, and ustart/ulen0 describe unique words in the
    deduplicated stream.
    """
    m = t.shape[0]
    nseg = m + 1
    idx = jnp.arange(m)
    is_word = wid >= 0
    seg_start = jnp.concatenate([jnp.ones((1,), bool), wid[1:] != wid[:-1]]) & is_word
    pos_in_word = idx - _seg_start_index(seg_start)

    hv1 = jnp.where(
        is_word,
        _mix32(t.astype(jnp.uint32) ^ (pos_in_word.astype(jnp.uint32) << 16),
               0x9E3779B1, 0x85EBCA77).astype(jnp.int32),
        0,
    )
    hv2 = jnp.where(
        is_word,
        _mix32(t.astype(jnp.uint32) + pos_in_word.astype(jnp.uint32) * np.uint32(0x27D4EB2F),
               0xC2B2AE3D, 0x165667B1).astype(jnp.int32),
        0,
    )
    seg_ids = jnp.where(is_word, wid, nseg - 1)
    h1 = jax.ops.segment_sum(hv1, seg_ids, num_segments=nseg, indices_are_sorted=True)
    h2 = jax.ops.segment_sum(hv2, seg_ids, num_segments=nseg, indices_are_sorted=True)
    wlen = jax.ops.segment_sum(
        is_word.astype(jnp.int32), seg_ids, num_segments=nseg, indices_are_sorted=True
    )
    n_words = jnp.max(jnp.where(is_word, wid, -1)) + 1

    widx = jnp.arange(nseg)
    # non-words (unused slots) sort last via length 0 -> they form one
    # giant bogus group; masked out below via wlen > 0
    slen, sh1, sh2, swidx = lax.sort((wlen, h1, h2, widx), num_keys=4)
    new_grp = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (slen[1:] != slen[:-1]) | (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1]),
        ]
    )
    grp = jnp.cumsum(new_grp.astype(jnp.int32)) - 1
    grp_of_word = jnp.zeros((nseg,), jnp.int32).at[swidx].set(grp)
    is_rep_word = jnp.zeros((nseg,), bool).at[swidx].set(new_grp)

    # build the unique stream: tokens of representative words only
    keep_tok = is_word & is_rep_word[seg_ids]
    (ut, u_oldwid), un_tokens = _compact(keep_tok, (t, wid))
    # renumber unique words by stream order
    u_is_word = u_oldwid >= 0
    u_seg_start = (
        jnp.concatenate([jnp.ones((1,), bool), u_oldwid[1:] != u_oldwid[:-1]])
        & u_is_word
    )
    uwid = jnp.where(u_is_word, jnp.cumsum(u_seg_start.astype(jnp.int32)) - 1, PAD)
    # map group -> renumbered unique id (scatter at rep word starts)
    rep_grp_at_start = grp_of_word[jnp.where(u_is_word, u_oldwid, nseg - 1)]
    tgt = jnp.where(u_seg_start, rep_grp_at_start, nseg - 1)
    grp_to_uid = jnp.zeros((nseg,), jnp.int32).at[tgt].set(
        jnp.where(u_seg_start, uwid, 0)
    )
    occ_uid = grp_to_uid[grp_of_word]  # original word id -> unique id
    return ut, uwid, un_tokens, occ_uid, n_words


def _expand_occurrences(ut, uwid, occ_uid, n_words, out_cap):
    """Gather the merged unique stream back into occurrence order.

    out[k] = ut[ustart[u] + offset] where word w = the output word
    containing slot k and u = occ_uid[w].
    """
    m = ut.shape[0]
    nseg = m + 1
    idx = jnp.arange(m)
    u_is_word = uwid >= 0
    u_seg_start = (
        jnp.concatenate([jnp.ones((1,), bool), uwid[1:] != uwid[:-1]]) & u_is_word
    )
    seg_ids = jnp.where(u_is_word, uwid, nseg - 1)
    ulen = jax.ops.segment_sum(
        u_is_word.astype(jnp.int32), seg_ids, num_segments=nseg, indices_are_sorted=True
    )
    ustart = jnp.zeros((nseg,), jnp.int32).at[
        jnp.where(u_seg_start, seg_ids, nseg - 1)
    ].set(jnp.where(u_seg_start, idx.astype(jnp.int32), 0))

    # per original word: its unique id, output length, output offset
    word_ids = jnp.arange(nseg)
    valid_w = word_ids < n_words
    occ_len = jnp.where(valid_w, ulen[occ_uid], 0)
    occ_off = jnp.cumsum(occ_len) - occ_len
    total_out = jnp.sum(occ_len)

    k = jnp.arange(out_cap)
    # word containing output slot k: searchsorted over the offsets
    w_of_k = jnp.searchsorted(occ_off + occ_len, k, side="right")
    w_of_k = jnp.minimum(w_of_k, nseg - 1)
    o_of_k = k - occ_off[w_of_k]
    src = ustart[occ_uid[w_of_k]] + o_of_k
    out = ut[jnp.clip(src, 0, m - 1)]
    out = jnp.where(k < total_out, out, PAD)
    return out, total_out


# ---------------------------------------------------------------------------
# stage 3: merge fixed point on the flat stream
# ---------------------------------------------------------------------------


def _merge_fixed_point(tables: EncoderTables, t, wid, n_tokens):
    m = t.shape[0]
    if tables.n_rules == 0:
        return t, wid, n_tokens
    idx = jnp.arange(m)
    n_seg = m // 2 + 2  # words have >= 2 tokens except newline marks... \n
    # pseudo-words are 1 token, so bound segments by m + 1 to be safe
    n_seg = m + 1

    def cond(state):
        _, _, _, done = state
        return ~done

    def body(state):
        t, wid, n, _ = state
        nxt_t = jnp.concatenate([t[1:], jnp.full((1,), PAD, t.dtype)])
        nxt_w = jnp.concatenate([wid[1:], jnp.full((1,), PAD, wid.dtype)])
        valid = (wid >= 0) & (wid == nxt_w) & (t >= 0) & (nxt_t >= 0)
        ranks = jnp.where(valid, tables.table.lookup(t, nxt_t), MISS)
        seg_ids = jnp.where(wid >= 0, wid, n_seg - 1)
        mins = jax.ops.segment_min(
            ranks, seg_ids, num_segments=n_seg, indices_are_sorted=True
        )
        mseg = mins[seg_ids]
        active = mseg < MISS
        hit = (ranks == mseg) & active
        # leftmost non-overlapping within runs of consecutive hits
        last_nonhit = lax.cummax(jnp.where(hit, -1, idx))
        offset = idx - last_nonhit - 1
        sel = hit & (offset % 2 == 0)
        z = tables.rules_z[jnp.clip(mseg, 0, tables.n_rules - 1)]
        new_t = jnp.where(sel, z, t)
        kill = jnp.concatenate([jnp.zeros((1,), bool), sel[:-1]])
        keep = ~kill & (new_t != PAD)
        (t2, w2), n_new = _compact(keep, (new_t, wid))
        done = ~jnp.any(sel)
        return t2, w2, n_new, done

    t, wid, n_tokens, _ = lax.while_loop(
        cond, body, (t, wid, n_tokens, jnp.asarray(False))
    )
    return t, wid, n_tokens


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@jax.jit
def encode_stream_device(
    tables: EncoderTables,
    bytes_u8: jnp.ndarray,
    n_bytes: jnp.ndarray,
    alpha_cps: jnp.ndarray,
    alpha_ids: jnp.ndarray,
    space_id: jnp.ndarray,
):
    """Full device pipeline for one byte chunk.

    Returns (t [1.5N] int32, n_tokens): the flat token stream in order,
    with NEWLINE (-2) sentinels at sentence boundaries, placeholders
    >= 10**9 for unknown runs, PAD (-1) past n_tokens.

    The merge fixed point runs on the *deduplicated* stream (unique
    words only) and the result is expanded back to occurrence order —
    on natural text this shrinks the per-round work by the corpus'
    repetition factor.
    """
    t, wid, n_tokens = _build_stream(
        bytes_u8, n_bytes, alpha_cps, alpha_ids, space_id
    )
    out_cap = t.shape[0]
    ut, uwid, un_tokens, occ_uid, n_words = _dedup_words(t, wid, n_tokens)
    ut, uwid, _ = _merge_fixed_point(tables, ut, uwid, un_tokens)
    out, total_out = _expand_occurrences(ut, uwid, occ_uid, n_words, out_cap)
    return out, total_out


@jax.jit
def _pack_u16(t: jnp.ndarray, unk_id: jnp.ndarray) -> jnp.ndarray:
    """int32 tokens -> uint16 wire format (valid when vocab < 65534):
    placeholders -> unk_id, NEWLINE -> 0xFFFF, PAD -> 0xFFFE."""
    x = jnp.where(t >= PLACEHOLDER_START, unk_id, t)
    x = jnp.where(t == NEWLINE, 0xFFFF, x)
    x = jnp.where(t == PAD, 0xFFFE, x)
    return x.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("k",))
def _slice_prefix(a: jnp.ndarray, k: int) -> jnp.ndarray:
    return a[:k]


class StreamEncoder:
    """Host wrapper: chunking, upload, download, sentence splitting.

    Chunk capacity policy: compiles are expensive (minutes on remote TPU
    toolchains), so by default every call uses ONE fixed chunk size —
    one compiled program total.  YTTM_STREAM_CHUNK overrides the size;
    YTTM_STREAM_ADAPTIVE=1 enables pow2-adaptive capacities (fast for
    small inputs on backends where compiles are cheap, e.g. CPU tests).
    """

    CHUNK = int(os.environ.get("YTTM_STREAM_CHUNK", str(1024 * 1024)))
    ADAPTIVE = os.environ.get("YTTM_STREAM_ADAPTIVE", "0") == "1"

    def __init__(self, tables: EncoderTables, alphabet_cps, alphabet_ids, space_id):
        self.tables = tables
        self.alpha_cps = jnp.asarray(np.asarray(alphabet_cps, dtype=np.uint32))
        self.alpha_ids = jnp.asarray(np.asarray(alphabet_ids, dtype=np.int32))
        self.space_id = jnp.asarray(space_id, dtype=jnp.int32)

    def encode_bytes(
        self, data: bytes, pack_u16: bool = False, unk_id: int = 1
    ) -> np.ndarray:
        """Encode newline-separated text; returns flat ids with NEWLINE
        sentinels preserved (int32, or uint16 wire format with 0xFFFF
        sentinels when pack_u16).  Chunks split at newline boundaries so
        no sentence straddles two chunks.

        All chunk computations are dispatched asynchronously before any
        result is awaited, hiding per-call device latency.
        """
        n = len(data)
        start = 0
        mv = memoryview(data)
        pending = []
        unk = jnp.asarray(unk_id, jnp.int32)
        while start < n:
            end = min(start + self.CHUNK, n)
            if end < n:
                nl = data.rfind(b"\n", start, end)
                if nl > start:
                    end = nl + 1
            chunk = np.frombuffer(mv[start:end], dtype=np.uint8)
            if self.ADAPTIVE:
                cap = 1 << max(14, int(np.ceil(np.log2(max(chunk.size, 1)))))
                cap = min(cap, self.CHUNK)
            else:
                cap = self.CHUNK
            if chunk.size < cap:
                padded = np.full(cap, 32, dtype=np.uint8)
                padded[: chunk.size] = chunk
            else:
                padded = chunk
            t, n_tok = encode_stream_device(
                self.tables,
                jnp.asarray(padded),
                jnp.asarray(chunk.size, jnp.int32),
                self.alpha_cps,
                self.alpha_ids,
                self.space_id,
            )
            if pack_u16:
                t = _pack_u16(t, unk)
            pending.append((t, n_tok))
            start = end

        out_parts = []
        for t, n_tok in pending:
            k = int(n_tok)
            # power-of-two-padded prefix download: bounded shape count,
            # < 2x overshoot
            kp = 1 << max(4, int(np.ceil(np.log2(max(k, 1)))))
            kp = min(kp, t.shape[0])
            out_parts.append(np.asarray(_slice_prefix(t, kp))[:k])
        if not out_parts:
            return np.zeros(0, np.uint16 if pack_u16 else np.int32)
        return np.concatenate(out_parts)
