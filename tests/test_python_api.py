"""Python API surface tests, mirroring the reference's
tests/unit_tests/test_python_api.py at a CI-friendly scale."""

import pickle
import random

import pytest

import youtokentome_tpu as yttm

BOS_ID, EOS_ID = 2, 3


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("api")
    random.seed(19)
    data = tmp / "train.txt"
    with open(data, "w") as f:
        for _ in range(400):
            print("".join(random.choice("abcd ") for _ in range(60)), file=f)
    model = tmp / "model.yttm"
    bpe = yttm.BPE.train(
        data=str(data), vocab_size=200, model=str(model), bos_id=BOS_ID, eos_id=EOS_ID
    )
    return bpe, str(model)


def test_encode_decode(trained):
    bpe, _ = trained
    random.seed(5)
    text_in = [" ".join("".join(random.choice("abcd ") for _ in range(50)).split())]
    ids = bpe.encode(text_in, yttm.OutputType.ID)
    assert text_in == bpe.decode(ids)
    ids_bos_eos = bpe.encode(text_in, yttm.OutputType.ID, bos=True, eos=True)
    assert text_in == bpe.decode(ids_bos_eos, ignore_ids=[BOS_ID, EOS_ID])
    assert bpe.decode(ids, ignore_ids=[]) == bpe.decode(
        ids_bos_eos, ignore_ids=[BOS_ID, EOS_ID]
    )


def test_vocabulary_consistency(trained):
    bpe, _ = trained
    assert bpe.vocab_size() == len(bpe.vocab())
    assert bpe.vocab_size() == len(set(bpe.vocab()))
    for i, subword in enumerate(bpe.vocab()):
        assert i == bpe.subword_to_id(subword)
        assert subword == bpe.id_to_subword(i)


def test_single_string_convenience(trained):
    # str input -> flat list (yttm.pyx:95-100)
    bpe, _ = trained
    flat = bpe.encode("abc abd", yttm.OutputType.ID)
    nested = bpe.encode(["abc abd"], yttm.OutputType.ID)
    assert flat == nested[0]
    sw = bpe.encode("abc abd", yttm.OutputType.SUBWORD)
    assert isinstance(sw, list) and all(isinstance(x, str) for x in sw)


def test_output_type_type_error(trained):
    bpe, _ = trained
    with pytest.raises(TypeError):
        bpe.encode(["abc"], output_type="id")


def test_dropout_validation(trained):
    bpe, _ = trained
    with pytest.raises(ValueError):
        bpe.encode(["abc"], yttm.OutputType.ID, dropout_prob=1.5)


def test_bos_without_trained_bos_raises(tmp_path):
    random.seed(3)
    data = tmp_path / "t.txt"
    data.write_text("ab ab abc " * 50)
    model = tmp_path / "m.yttm"
    bpe = yttm.BPE.train(str(data), str(model), 20, bos_id=-1, eos_id=-1)
    with pytest.raises(ValueError, match="BOS"):
        bpe.encode(["ab"], yttm.OutputType.ID, bos=True)
    with pytest.raises(ValueError, match="EOS"):
        bpe.encode(["ab"], yttm.OutputType.ID, eos=True)


def test_pickle_roundtrip(trained):
    bpe, model_path = trained
    blob = pickle.dumps(bpe)
    bpe2 = pickle.loads(blob)
    s = ["abc abd a"]
    assert bpe.encode(s, yttm.OutputType.ID) == bpe2.encode(s, yttm.OutputType.ID)


def test_decode_type_errors(trained):
    bpe, _ = trained
    with pytest.raises(TypeError):
        bpe.decode("not a list")
    with pytest.raises(TypeError):
        bpe.decode([1, 2], ignore_ids=5)


def test_unknown_chars_map_to_unk(trained):
    bpe, _ = trained
    unk = 1
    ids = bpe.encode(["azb xyz"], yttm.OutputType.ID)[0]
    assert unk in ids  # x/y/z unseen in "abcd " training data


def test_id_hole_clean_error(tmp_path):
    # training stops early (tiny corpus) while a custom special id sits
    # beyond the materialized range: looking up a hole id must raise a
    # clean ValueError, and decode of valid ids must still work
    # (the reference dies on a bare assert here, bpe.cpp:1797)
    data = tmp_path / "t.txt"
    data.write_text("ab ab ab\n")
    model = tmp_path / "m.yttm"
    bpe = yttm.BPE.train(str(data), str(model), 400, eos_id=399)
    hole = None
    for i in range(bpe.vocab_size()):
        try:
            bpe.id_to_subword(i)
        except ValueError:
            hole = i
            break
    assert hole is not None
    with pytest.raises(ValueError):
        bpe.id_to_subword(hole)
    ids = bpe.encode(["ab ab"], yttm.OutputType.ID)[0]
    assert bpe.decode([ids]) == ["ab ab"]
