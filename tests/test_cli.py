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


def test_decode_line_streamed(artifacts):
    """Interactive decode parity (bpe.cpp:2016-2028): each line's text is
    emitted and flushed BEFORE stdin reaches EOF."""
    import select

    tmp, model, _, test_text = artifacts
    line1 = run_cli(
        ["encode", f"--model={model}", "--output_type=id"],
        stdin=test_text.split("\n")[0] + "\n",
    ).splitlines()[0]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-c", _WRAPPER, "decode", f"--model={model}"],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        env=env,
        cwd=str(REPO),
    )
    try:
        proc.stdin.write((line1 + "\n").encode())
        proc.stdin.flush()
        # stdin stays OPEN: the line must come back on its own
        ready, _, _ = select.select([proc.stdout], [], [], 60)
        assert ready, "decode produced no output before EOF"
        out = proc.stdout.readline().decode()
        assert out.endswith("\n") and out.strip()
    finally:
        proc.stdin.close()
        proc.wait(timeout=30)


def test_train_stderr_parity(tmp_path):
    """Training prints the reference's config block (bpe.cpp:1352-1366)
    and a merge line every 1000 ids by default (bpe.cpp:1198-1219)."""
    import re

    random.seed(31)
    train = tmp_path / "t.txt"
    with open(train, "w") as f:
        for _ in range(800):
            print("".join(random.choice("abcdefgh ") for _ in range(70)), file=f)
    model = tmp_path / "m.yttm"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c", _WRAPPER, "bpe", f"--data={train}",
         f"--model={model}", "--vocab_size=1100"],
        capture_output=True, env=env, cwd=str(REPO),
    )
    assert res.returncode == 0, res.stderr.decode()
    err = res.stderr.decode()
    for want in (
        "Training parameters",
        f"  input: {train}",
        f"  model: {model}",
        "  vocab_size: 1100",
        "  character_coverage: 1",
        "  pad: 0",
        "  unk: 1",
        "  bos: 2",
        "  eos: 3",
        "reading file...",
        "learning bpe...",
        "model saved to:",
    ):
        assert want in err, f"missing {want!r} in stderr:\n{err}"
    # the id-1000 merge line: "id: 1000=x+y   freq: N   subword: sz=sx+sy"
    m = re.search(r"^id: 1000=(\d+)\+(\d+)\s+freq: (\d+)\s+subword: (\S+)=(\S+)\+(\S+)$",
                  err, re.M)
    assert m, f"missing merge log line in stderr:\n{err}"
    assert m.group(4) == m.group(5) + m.group(6)
