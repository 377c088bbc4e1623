"""Golden-output language tests (Russian/English/Japanese), after the
reference's tests/unit_tests/test_manual.py.

Tie-break note: the reference's *release* build resolves equal-count
merge ties by hash-map insertion order — explicitly unspecified (its own
stress suite only certifies the ordering under -DDETERMINISTIC_QUEUE,
test_stress.py:17-32, which sorts candidates by the MergeCandidate
comparator, bpe.cpp:110-126).  This framework implements the certified
deterministic ordering, so the goldens below are produced by the
deterministic reference build; where they differ from the reference
repo's hardcoded lists, the difference is exactly a tie the release
build resolves arbitrarily.  Each test also differentially checks
against the deterministic reference binary when a toolchain is present.
"""

import pytest

import youtokentome_tpu as yttm
from reference_oracle import build_refcli, ref_encode, ref_train

RUSSIAN_TRAIN = """
        собирать cборник сборище отобранный сборщица
        """
RUSSIAN_TEST = """
        собранный собрание прибор
        """
RUSSIAN_GOLDEN = [
    "▁с", "об", "ранный", "▁с", "об", "ра", "ни", "е", "▁", "п", "р", "и", "бор"
]

ENGLISH_TRAIN = """
        anachronism
        synchronous
        chronology
        chronic
        chronophilia
        chronoecological
        chronocoulometry
        """
ENGLISH_TEST = "chronocline synchroscope "
ENGLISH_GOLDEN = [
    "▁chrono", "c", "li", "n", "e", "▁s", "yn", "ch", "r", "o", "s", "co", "p", "e"
]

JAPANESE_TRAIN = """
        むかし、 むかし、 ある ところ に
        おじいさん と おばあさん が いました。
        おじいさん が 山（やま） へ 木（き） を きり に いけば、
        おばあさん は 川（かわ） へ せんたく に でかけます。
        「おじいさん、 はよう もどって きなされ。」
        「おばあさん も き を つけて な。」
        まい日（にち） やさしく いい あって でかけます
    """
JAPANESE_TEST = " おばあさん が  川 で せん "
JAPANESE_GOLDEN = ["▁おばあさん", "▁が", "▁", "川", "▁で", "▁", "せ", "ん"]


def _run(tmp_path, train_text, test_text, vocab_size, golden, n_threads=-1):
    data = tmp_path / "train_data.txt"
    data.write_text(train_text)
    model = tmp_path / "model.yttm"
    bpe = yttm.BPE.train(str(data), str(model), vocab_size, n_threads=n_threads)
    result = bpe.encode([test_text], output_type=yttm.OutputType.SUBWORD)
    assert result == [golden]
    if build_refcli() is not None:
        ref_model = tmp_path / "ref.yttm"
        ref_train(data, ref_model, vocab_size)
        ref_out = ref_encode(ref_model, [test_text.replace("\n", " ")], "subword")
        assert result == ref_out


def test_russian(tmp_path):
    _run(tmp_path, RUSSIAN_TRAIN, RUSSIAN_TEST, 50, RUSSIAN_GOLDEN)


def test_english(tmp_path):
    _run(tmp_path, ENGLISH_TRAIN, ENGLISH_TEST, 200, ENGLISH_GOLDEN, n_threads=1)


def test_japanese(tmp_path):
    _run(tmp_path, JAPANESE_TRAIN, JAPANESE_TEST, 100, JAPANESE_GOLDEN)
