"""Model (.yttm) codec: byte-level compatibility with the reference
text format (utils.cpp:50-91) and round-trip stability."""

from youtokentome_tpu.models.state import BPEState, SpecialTokens


def test_roundtrip(tmp_path):
    state = BPEState(
        char2id={9601: 4, 97: 5, 98: 6},
        rules=[(5, 6, 7), (4, 7, 8)],
        special_tokens=SpecialTokens(pad_id=0, unk_id=1, bos_id=2, eos_id=3),
    )
    p = tmp_path / "m.yttm"
    state.dump(str(p))
    loaded = BPEState.load(str(p))
    assert loaded.char2id == state.char2id
    assert loaded.rules == state.rules
    assert loaded.special_tokens == state.special_tokens
    assert loaded.vocab_size() == 3 + 2 + 4


def test_loads_any_whitespace_and_order():
    text = "2 1\n97 5\n9601 4\n4 5 6\n1 0 2 3\n"
    st = BPEState.loads(text)
    assert st.char2id == {97: 5, 9601: 4}
    assert st.rules == [(4, 5, 6)]
    assert st.special_tokens == SpecialTokens(pad_id=0, unk_id=1, bos_id=2, eos_id=3)


def test_specials_order_is_unk_pad_bos_eos():
    # dump writes specials as "unk pad bos eos" (utils.cpp:10-13)
    state = BPEState(
        char2id={9601: 4},
        rules=[],
        special_tokens=SpecialTokens(pad_id=10, unk_id=11, bos_id=12, eos_id=13),
    )
    last = state.dumps().strip().split("\n")[-1]
    assert last == "11 10 12 13"


def test_missing_file_raises_valueerror():
    import pytest

    with pytest.raises(ValueError, match="Can not open file with model"):
        BPEState.load("/nonexistent/path.yttm")
