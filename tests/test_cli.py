"""CLI subprocess tests, mirroring the reference's tests/unit_tests/
test_cli.py at a CI-friendly scale: train/encode/decode/vocab through
the installed command surface, custom special ids, streaming mode,
encode|decode round trips with --ignore_ids."""

import os
import random
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


_WRAPPER = (
    "import sys, jax;"
    "jax.config.update('jax_platforms', 'cpu');"
    "from youtokentome_tpu.cli import main;"
    "main()"
)


def run_cli(args, stdin=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_yttm")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    res = subprocess.run(
        [sys.executable, "-c", _WRAPPER, *args],
        input=stdin.encode() if stdin is not None else None,
        capture_output=True,
        env=env,
        cwd=str(REPO),
    )
    assert res.returncode == 0, res.stderr.decode()
    return res.stdout.decode()


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    random.seed(19)
    train = tmp / "train.txt"
    with open(train, "w") as f:
        for _ in range(300):
            print("".join(random.choice("abcd ") for _ in range(60)), file=f)
    model = tmp / "base.yttm"
    run_cli(
        [
            "bpe",
            f"--data={train}",
            f"--model={model}",
            "--vocab_size=150",
            "--coverage=0.999",
            "--bos_id=2",
            "--eos_id=3",
        ]
    )
    rename_model = tmp / "rename.yttm"
    run_cli(
        [
            "bpe",
            f"--data={train}",
            f"--model={rename_model}",
            "--vocab_size=150",
            "--coverage=0.999",
            "--bos_id=29",
            "--eos_id=148",
            "--unk_id=122",
        ]
    )
    test_text = "\n".join(
        "".join(random.choice("abcde ") for _ in range(50)) for _ in range(20)
    )
    return tmp, model, rename_model, test_text


def test_encode_bos_eos(artifacts):
    _, model, _, text = artifacts
    out = run_cli(
        ["encode", f"--model={model}", "--output_type=id", "--bos"], stdin=text
    )
    for line in out.strip("\n").split("\n"):
        assert line.split()[0] == "2"
    out = run_cli(
        ["encode", f"--model={model}", "--output_type=id", "--eos", "--reverse"],
        stdin=text,
    )
    for line in out.strip("\n").split("\n"):
        assert line.split()[0] == "3"


def test_custom_special_ids(artifacts):
    _, _, rename_model, text = artifacts
    out = run_cli(
        ["encode", f"--model={rename_model}", "--output_type=id", "--bos", "--eos"],
        stdin=text,
    )
    for line in out.strip("\n").split("\n"):
        toks = line.split()
        assert toks[0] == "29" and toks[-1] == "148"


def test_unknown_char_custom_unk(artifacts):
    _, _, rename_model, _ = artifacts
    out = run_cli(
        ["encode", f"--model={rename_model}", "--output_type=id"], stdin="aXa\n"
    )
    assert "122" in out.split()


def test_stream_mode(artifacts):
    _, model, _, text = artifacts
    batch = run_cli(["encode", f"--model={model}", "--output_type=id"], stdin=text)
    stream = run_cli(
        ["encode", f"--model={model}", "--output_type=id", "--stream"], stdin=text
    )
    assert batch == stream


def test_vocab_cli(artifacts):
    _, model, _, _ = artifacts
    out = run_cli(["vocab", f"--model={model}"])
    lines = out.strip("\n").split("\n")
    assert lines[0].startswith("0\t")
    assert lines[1].split("\t")[1] == "<UNK>"
    verbose = run_cli(["vocab", f"--model={model}", "--verbose"])
    assert "+" in verbose


def test_encode_decode_roundtrip(artifacts):
    _, model, _, _ = artifacts
    text = "abc abd dcba\ncc dd aa\n"
    ids = run_cli(["encode", f"--model={model}", "--output_type=id"], stdin=text)
    decoded = run_cli(["decode", f"--model={model}"], stdin=ids)
    assert decoded == text


def test_roundtrip_with_ignore_ids(artifacts):
    _, model, _, _ = artifacts
    text = "abc abd dcba\n"
    ids = run_cli(
        ["encode", f"--model={model}", "--output_type=id", "--bos", "--eos"],
        stdin=text,
    )
    decoded = run_cli(
        ["decode", f"--model={model}", "--ignore_ids=2,3"], stdin=ids
    )
    assert decoded == text


def test_subword_output(artifacts):
    _, model, _, _ = artifacts
    out = run_cli(
        ["encode", f"--model={model}", "--output_type=subword"], stdin="abc def\n"
    )
    assert out.startswith("▁")
