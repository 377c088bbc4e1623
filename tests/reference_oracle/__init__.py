"""Builds and wraps the reference implementation as a conformance oracle.

The reference sources at /root/reference are compiled (read-only, with
-DDETERMINISTIC_QUEUE like the reference's own stress harness,
tests/unit_tests/test_stress.py:17-32) into a small CLI binary.  Build
artifacts land in a gitignored directory.  If no C++ toolchain or the
reference tree is unavailable, tests depending on it are skipped.
"""

import os
import subprocess
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")
HERE = Path(__file__).resolve().parent
BUILD_DIR = HERE / "_build"
BINARY = BUILD_DIR / "refcli"


def build_refcli() -> Path | None:
    if BINARY.exists():
        return BINARY
    cpp_dir = REFERENCE_ROOT / "youtokentome" / "cpp"
    if not cpp_dir.exists():
        return None
    BUILD_DIR.mkdir(exist_ok=True)
    srcs = [
        str(HERE / "refcli.cpp"),
        str(cpp_dir / "bpe.cpp"),
        str(cpp_dir / "utils.cpp"),
        str(cpp_dir / "utf8.cpp"),
    ]
    cmd = [
        "g++",
        "-std=c++11",
        "-O2",
        "-pthread",
        "-DDETERMINISTIC_QUEUE",
        f"-I{cpp_dir}",
        *srcs,
        "-o",
        str(BINARY),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return BINARY


def ref_train(data_path, model_path, vocab_size, coverage=1.0, pad=0, unk=1, bos=2, eos=3):
    binary = build_refcli()
    assert binary is not None
    subprocess.run(
        [
            str(binary),
            "train",
            str(data_path),
            str(model_path),
            str(vocab_size),
            repr(coverage),
            str(pad),
            str(unk),
            str(bos),
            str(eos),
        ],
        check=True,
        capture_output=True,
    )


def ref_encode(model_path, sentences, output_type="id", bos=False, eos=False,
               reverse=False, dropout=0.0):
    binary = build_refcli()
    assert binary is not None
    inp = "\n".join(sentences) + "\n" if sentences else ""
    res = subprocess.run(
        [
            str(binary),
            "encode",
            str(model_path),
            output_type,
            str(int(bos)),
            str(int(eos)),
            str(int(reverse)),
            repr(dropout),
        ],
        input=inp.encode(),
        check=True,
        capture_output=True,
    )
    lines = res.stdout.decode().split("\n")[: len(sentences)]
    if output_type == "id":
        return [[int(x) for x in line.split()] for line in lines]
    return [line.split("\t") if line else [] for line in lines]


def ref_decode(model_path, id_lines):
    binary = build_refcli()
    assert binary is not None
    inp = "\n".join(" ".join(str(i) for i in ids) for ids in id_lines) + "\n"
    res = subprocess.run(
        [str(binary), "decode", str(model_path)],
        input=inp.encode(),
        check=True,
        capture_output=True,
    )
    return res.stdout.decode().split("\n")[: len(id_lines)]
