"""Pure-Python BPE oracle: the executable specification.

This module re-states the reference semantics (VKCOM/YouTokenToMe) in the
simplest possible form.  It is the ground truth the TPU kernels are tested
against, mirroring the reference's own strategy of validating the fast
parallel trainer against a naive oracle (reference:
tests/unit_tests/stress_test.cpp:68-270).

Semantics captured here (with reference locations):

Training (= the fast trainer's observable behaviour, proven equal to the
naive global-argmax-per-round formulation by the reference stress test):
  * data_len counts every decoded item incl. spaces and invalid bytes
    (bpe.cpp:839-857); char frequencies exclude spaces and invalid.
  * character coverage removes the rarest chars while
    (data_len - removed - freq[cur]) > data_len * coverage (bpe.cpp:328-333).
  * id assignment: specials first, then U+2581, then chars by descending
    (frequency, codepoint) (bpe.cpp:340-353; ties: the ascending sort at
    bpe.cpp:324 is consumed back-to-front, so equal-frequency chars get ids
    in descending codepoint order).
  * words split at is_space, deduplicated, prefixed with the U+2581 id
    (bpe.cpp:388-418).
  * pair counting: adjacent pairs; inside a run of equal tokens only even
    offsets count, i.e. floor(run/2) for the run pair (bpe.cpp:140-143,
    465-475; naive form stress_test.cpp:152-159).
  * merge choice: max count; ties -> smaller max(x,y), then smaller
    min(x,y), then larger x (bpe.cpp:110-126).
  * merges apply left-to-right, non-overlapping (stress_test.cpp:181-188).
  * early stop with a warning when no pairs remain (bpe.cpp:1137-1145).
  * final id renaming honours user-chosen special ids (bpe.cpp:814-837).

Encoding (bpe.cpp:1455-1632):
  * trailing spaces stripped; each word prefixed with the U+2581 id;
  * maximal runs of unknown chars collapse to one placeholder token;
  * greedy merge: repeatedly apply the lowest-rank applicable rule,
    leftmost occurrence first (equivalently: apply rules in rank order,
    scanning left-to-right — stress_test.cpp:239-248);
  * ID output maps placeholders to unk_id; SUBWORD output emits the raw
    unknown text (bpe.cpp:1591-1614).
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .models.state import (
    BOS_TOKEN,
    EOS_TOKEN,
    INVALID_UNICODE,
    SPACE_TOKEN,
    BPEState,
    BpeConfig,
    SpecialTokens,
    check_config,
    is_space,
)
from .ops.utf8 import decode_utf8_bytes, encode_utf8


def compute_alphabet(
    char_cnt: Dict[int, int], data_len: int, coverage: float, n_specials: int
) -> Tuple[Dict[int, int], set]:
    """Coverage cutoff + id assignment (bpe.cpp:316-355).

    Returns (char2id with pre-rename ids, removed_chars).
    """
    frequencies = sorted((cnt, ch) for ch, cnt in char_cnt.items())
    cur = 0
    n_removed = 0
    # NB: float comparison, matching the reference's double arithmetic.
    while cur < len(frequencies) and (
        data_len - n_removed - frequencies[cur][0]
    ) > data_len * coverage:
        n_removed += frequencies[cur][0]
        cur += 1
    removed_chars = {frequencies[i][1] for i in range(cur)}

    char2id: Dict[int, int] = {}
    used_ids = n_specials
    char2id[SPACE_TOKEN] = used_ids
    used_ids += 1
    for i in range(len(frequencies) - 1, cur - 1, -1):
        ch = frequencies[i][1]
        if not is_space(ch):
            char2id[ch] = used_ids
            used_ids += 1
    return char2id, removed_chars


def split_words(codepoints: Sequence[int]) -> List[List[int]]:
    """Split at is_space boundaries; empty words never occur."""
    words: List[List[int]] = []
    cur: List[int] = []
    for ch in codepoints:
        if is_space(ch):
            if cur:
                words.append(cur)
                cur = []
        else:
            cur.append(ch)
    if cur:
        words.append(cur)
    return words


def count_pairs(word: Sequence[int]) -> List[Tuple[int, int]]:
    """Adjacent pairs with the equal-run skip rule (stress_test.cpp:152-159).

    Returns the list of counted (left, right) index pairs positions as
    (pair) tuples, one entry per counted occurrence.
    """
    out = []
    i = 0
    while i < len(word) - 1:
        out.append((word[i], word[i + 1]))
        if word[i] == word[i + 1] and i + 2 < len(word) and word[i] == word[i + 2]:
            i += 1
        i += 1
    return out


def _better(a: Tuple[int, int, int], b: Optional[Tuple[int, int, int]]) -> bool:
    """True if candidate a=(cnt,x,y) beats b under the reference ordering
    (bpe.cpp:110-126): higher count; smaller max; smaller min; larger x."""
    if b is None:
        return True
    ca, xa, ya = a
    cb, xb, yb = b
    if ca != cb:
        return ca > cb
    if max(xa, ya) != max(xb, yb):
        return max(xa, ya) < max(xb, yb)
    if min(xa, ya) != min(xb, yb):
        return min(xa, ya) < min(xb, yb)
    return xa > xb


def apply_merge(word: List[int], x: int, y: int, z: int) -> List[int]:
    """Left-to-right non-overlapping merge (stress_test.cpp:181-188)."""
    out: List[int] = []
    i = 0
    n = len(word)
    while i < n:
        if i + 1 < n and word[i] == x and word[i + 1] == y:
            out.append(z)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return out


def rename_tokens(
    char2id: Dict[int, int],
    rules: List[Tuple[int, int, int]],
    special: SpecialTokens,
    n_tokens: int,
) -> Tuple[Dict[int, int], List[Tuple[int, int, int]]]:
    """Permute ids so user special ids are honoured (bpe.cpp:814-837)."""
    renaming: Dict[int, int] = {}
    cur = special.n_special_tokens()
    for i in range(n_tokens):
        if not special.taken_id(i):
            renaming[cur] = i
            cur += 1
    new_char2id = {ch: renaming[idx] for ch, idx in char2id.items()}
    new_rules = [(renaming[x], renaming[y], renaming[z]) for x, y, z in rules]
    return new_char2id, new_rules


def train_from_codepoints(
    codepoints: np.ndarray, vocab_size: int, config: BpeConfig, verbose: bool = False
) -> BPEState:
    """Train on an already-decoded codepoint stream (may contain
    INVALID_UNICODE sentinels, which count toward data_len only)."""
    config = check_config(config, vocab_size)
    special = config.special_tokens
    n_specials = special.n_special_tokens()

    cps = np.asarray(codepoints, dtype=np.uint32)
    data_len = int(cps.size)

    space_mask = np.isin(cps, np.array([9, 10, 11, 12, 13, 32, SPACE_TOKEN], dtype=np.uint32))
    valid_mask = cps != INVALID_UNICODE
    countable = cps[valid_mask & ~space_mask]
    uniq, cnts = np.unique(countable, return_counts=True)
    char_cnt = {int(c): int(n) for c, n in zip(uniq, cnts)}
    if verbose:
        print(
            f"number of unique characters in the training data: {len(char_cnt)}",
            file=sys.stderr,
        )

    char2id, removed = compute_alphabet(
        char_cnt, data_len, config.character_coverage, n_specials
    )

    used_ids = len(char2id) + n_specials
    if used_ids > vocab_size:
        raise ValueError(
            "Incorrect arguments. Vocabulary size too small. Set vocab_size>="
            + str(used_ids)
            + ".  Current value for vocab_size="
            + str(vocab_size)
        )

    # Build deduplicated words as id sequences prefixed with the space id.
    keep = valid_mask & ~np.isin(cps, np.array(sorted(removed), dtype=np.uint32))
    # remove_rare_chars only rewrites the stream when chars were removed
    # (bpe.cpp:357-360); invalid sentinels are dropped either way here
    # because they can never be in char2id.
    stream = cps[keep]
    space_id = char2id[SPACE_TOKEN]
    words = split_words(stream.tolist())
    word_cnt: Dict[Tuple[int, ...], int] = {}
    for w in words:
        key = tuple([space_id] + [char2id[ch] for ch in w])
        word_cnt[key] = word_cnt.get(key, 0) + 1

    coded: List[List[int]] = [list(k) for k in word_cnt.keys()]
    freqs: List[int] = list(word_cnt.values())

    rules: List[Tuple[int, int, int]] = []
    while used_ids < vocab_size:
        # Full recount each round (the naive formulation the fast trainer
        # is proven equal to, stress_test.cpp:149-170).
        local_cnt: Dict[Tuple[int, int], int] = {}
        for w, f in zip(coded, freqs):
            for pair in count_pairs(w):
                local_cnt[pair] = local_cnt.get(pair, 0) + f
        best: Optional[Tuple[int, int, int]] = None
        for (x, y), cnt in local_cnt.items():
            if _better((cnt, x, y), best):
                best = (cnt, x, y)
        if best is None:
            print(
                f"WARNING merged only: {used_ids} pairs of tokens", file=sys.stderr
            )
            break
        _, x, y = best
        z = used_ids
        used_ids += 1
        rules.append((x, y, z))
        for i, w in enumerate(coded):
            coded[i] = apply_merge(w, x, y, z)

    char2id, rules = rename_tokens(char2id, rules, special, vocab_size)
    return BPEState(char2id=char2id, rules=rules, special_tokens=special)


def train(
    data_path: str, model_path: str, vocab_size: int, config: BpeConfig
) -> BPEState:
    """File-based training entry point (bpe.cpp:1368-1388)."""
    with open(data_path, "rb") as f:
        raw = f.read()
    cps = decode_utf8_bytes(raw, keep_invalid=True)
    state = train_from_codepoints(cps, vocab_size, config)
    if model_path:
        state.dump(model_path)
    return state


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------


class OracleEncoder:
    """Naive reference-exact encoder (spec for the TPU encode kernel)."""

    def __init__(self, state: BPEState):
        self.state = state
        self.id2char = {v: k for k, v in state.char2id.items()}
        self.rule2id = {(x, y): i for i, (x, y, _) in enumerate(state.rules)}
        self.recipe: Dict[int, List[int]] = {i: [i] for i in self.id2char}
        for x, y, z in state.rules:
            self.recipe[z] = self.recipe[x] + self.recipe[y]

    def _piece(self, token_id: int) -> str:
        return encode_utf8([self.id2char[t] for t in self.recipe[token_id]])

    def encode_word(self, ids: List[int]) -> List[int]:
        """Greedy merge of one word: repeatedly apply the lowest-rank rule,
        leftmost-first (equivalent to applying rules in rank order)."""
        rules = self.state.rules
        rule2id = self.rule2id
        cur = ids
        while True:
            best_rank = None
            for i in range(len(cur) - 1):
                r = rule2id.get((cur[i], cur[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                return cur
            x, y, z = rules[best_rank]
            cur = apply_merge(cur, x, y, z)

    def encode_sentence(
        self,
        sentence: str,
        output_type: str = "id",
        bos: bool = False,
        eos: bool = False,
        reverse: bool = False,
    ):
        state = self.state
        char2id = state.char2id
        special = state.special_tokens
        text = [ord(c) for c in sentence]
        while text and is_space(text[-1]):
            text.pop()

        out_ids: List[int] = []
        out_pieces: List[str] = []
        if bos:
            if output_type == "id":
                out_ids.append(special.bos_id)
            else:
                out_pieces.append(BOS_TOKEN)

        NEW_TOKEN_START = 10**9
        i = 0
        n = len(text)
        while i < n:
            while i < n and is_space(text[i]):
                i += 1
            if i == n:
                break
            word: List[int] = [char2id[SPACE_TOKEN]]
            unknown: Dict[int, str] = {}
            new_token_cur = NEW_TOKEN_START
            while i < n and not is_space(text[i]):
                if text[i] in char2id:
                    word.append(char2id[text[i]])
                    i += 1
                else:
                    j = i
                    while j < n and not is_space(text[j]) and text[j] not in char2id:
                        j += 1
                    unknown[new_token_cur] = encode_utf8(text[i:j])
                    word.append(new_token_cur)
                    new_token_cur += 1
                    i = j
            merged = self.encode_word(word)
            # reference emission quirk (bpe.cpp:1591-1593): output starts
            # at the first node with token_id != 0, so when id 0 belongs
            # to a real token (possible under custom special ids that
            # leave id 0 unclaimed — then ▁ gets it), an unmerged
            # word-leading ▁ is silently dropped.  Bit-exactness means
            # reproducing it.
            while merged and merged[0] == 0:
                merged = merged[1:]
            for t in merged:
                if t >= NEW_TOKEN_START:
                    if output_type == "id":
                        out_ids.append(special.unk_id)
                    else:
                        out_pieces.append(unknown[t])
                else:
                    if output_type == "id":
                        out_ids.append(t)
                    else:
                        out_pieces.append(self._piece(t))

        if eos:
            if output_type == "id":
                out_ids.append(special.eos_id)
            else:
                out_pieces.append(EOS_TOKEN)
        result = out_ids if output_type == "id" else out_pieces
        if reverse:
            result = result[::-1]
        return result

    def encode(self, sentences, output_type="id", bos=False, eos=False, reverse=False):
        return [
            self.encode_sentence(s, output_type, bos, eos, reverse) for s in sentences
        ]
