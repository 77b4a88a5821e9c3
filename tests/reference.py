"""Helpers to drive the reference SRLA binary for golden comparisons.

Builds the reference CLI out-of-tree on first use (cmake; ~30 s once).
"""

import os
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference"
REF_BIN = os.path.join(REPO, ".refbuild", "tool", "srla")


def reference_available() -> bool:
    if os.path.exists(REF_BIN):
        return True
    if not os.path.isdir(os.path.join(REF_SRC, "tools", "srla_codec")):
        return False
    try:
        build = os.path.join(REPO, ".refbuild", "tool")
        subprocess.run(["cmake", "-S", os.path.join(REF_SRC, "tools", "srla_codec"),
                        "-B", build, "-DCMAKE_BUILD_TYPE=Release"],
                       check=True, capture_output=True)
        subprocess.run(["cmake", "--build", build, "-j8"],
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return os.path.exists(REF_BIN)


def ref_encode(pcm: np.ndarray, bps: int, rate: int, preset=0, B=4096, V=0,
               P=0, L=4, svr=0) -> bytes:
    from srla_tpu.wavio import WavData, write_wav
    args = ["-m", str(preset), "-B", str(B), "-V", str(V), "-L", str(L)]
    if P:
        args += ["-P", str(P)]
    if svr:
        args += ["--svr-filter-learning-iteration", str(svr)]
    with tempfile.TemporaryDirectory() as d:
        wavp, srlp = os.path.join(d, "in.wav"), os.path.join(d, "out.srl")
        write_wav(wavp, WavData(pcm, rate, bps))
        r = subprocess.run([REF_BIN, "-e"] + args + [wavp, srlp],
                           capture_output=True)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode())
        with open(srlp, "rb") as f:
            return f.read()


def ref_decode(stream: bytes) -> "np.ndarray":
    from srla_tpu.wavio import read_wav
    with tempfile.TemporaryDirectory() as d:
        srlp, wavp = os.path.join(d, "in.srl"), os.path.join(d, "out.wav")
        with open(srlp, "wb") as f:
            f.write(stream)
        r = subprocess.run([REF_BIN, "-d", srlp, wavp], capture_output=True)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode())
        return read_wav(wavp).pcm
