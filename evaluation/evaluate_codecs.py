#!/usr/bin/env python3
"""Codec evaluation harness: compression rate and encode/decode speed.

Measures srla_tpu (exact and tpu backends) and, when available, the reference
`srla` binary and `flac`, over a corpus of WAV files — or a deterministic
synthetic corpus when no corpus directory is given. Asserts bit-exact
round-trips, writes a CSV summary, mirrors the reference's
evaluation/evaluate_codecs.py metrics (% of realtime, compression %).

Usage:
  python3 evaluation/evaluate_codecs.py [--corpus DIR] [--out results.csv]
          [--configs "-m 2 -V 0 -B 4096" ...]
"""

from __future__ import annotations

import argparse
import csv
import os
import shlex
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srla_tpu import decode as srla_decode  # noqa: E402
from srla_tpu import encode as srla_encode  # noqa: E402
from srla_tpu.wavio import WavData, read_wav, write_wav  # noqa: E402

REF_BIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "tool", "srla")


def synthetic_corpus(tmpdir: str) -> list:
    """Deterministic mini-corpus in the spirit of the RWC categories."""
    rate = 44100
    rng = np.random.RandomState(42)
    files = []

    def tone_mix(n, freqs, noise):
        t = np.arange(n) / rate
        sig = sum(np.sin(2 * np.pi * f * t + i) * a
                  for i, (f, a) in enumerate(freqs))
        sig = sig + rng.randn(n) * noise
        l = np.round(np.clip(sig, -1, 1) * 22000).astype(np.int32)
        r = np.round(np.clip(np.roll(sig, 7) * 0.9, -1, 1) * 22000)
        return np.stack([l, r.astype(np.int32)])

    specs = {
        "classic": tone_mix(rate * 20, [(261.6, .3), (329.6, .2), (392, .15)],
                            0.01),
        "jazz": tone_mix(rate * 20, [(220, .25), (277.2, .2), (440, .1)],
                         0.04),
        "popular": tone_mix(rate * 20, [(196, .35), (392, .2), (784, .1)],
                            0.08),
        "noise": np.stack([
            (rng.randn(rate * 20) * 8000).astype(np.int32),
            (rng.randn(rate * 20) * 8000).astype(np.int32)]),
    }
    for name, pcm in specs.items():
        path = os.path.join(tmpdir, f"{name}.wav")
        write_wav(path, WavData(pcm.astype(np.int32), rate, 16))
        files.append(path)
    return files


def parse_config(cfg: str) -> dict:
    toks = shlex.split(cfg)
    out = {"preset": 4, "B": 4096, "V": 0, "L": 4, "P": 0}
    i = 0
    flagmap = {"-m": "preset", "-B": "B", "-V": "V", "-L": "L", "-P": "P"}
    while i < len(toks):
        if toks[i] in flagmap:
            out[flagmap[toks[i]]] = int(toks[i + 1])
            i += 2
        else:
            i += 1
    return out


def measure_srla_tpu(path: str, cfg: dict, backend: str):
    wav = read_wav(path)
    duration = wav.pcm.shape[1] / wav.sampling_rate
    raw_size = os.path.getsize(path)
    t0 = time.time()
    stream = srla_encode(wav.pcm, wav.bits_per_sample, wav.sampling_rate,
                         preset=cfg["preset"], max_block=cfg["B"],
                         variable_divisions=cfg["V"],
                         lookahead_factor=cfg["L"], ltp_order=cfg["P"],
                         backend=backend)
    t1 = time.time()
    _, out = srla_decode(stream)
    t2 = time.time()
    assert np.array_equal(out, wav.pcm), f"round trip failed for {path}"
    return {
        "encode_pct_rt": 100.0 * (t1 - t0) / duration,
        "decode_pct_rt": 100.0 * (t2 - t1) / duration,
        "compression_pct": 100.0 * len(stream) / raw_size,
    }


def measure_reference(path: str, cfg: dict):
    if not os.path.exists(REF_BIN):
        return None
    wav = read_wav(path)
    duration = wav.pcm.shape[1] / wav.sampling_rate
    raw_size = os.path.getsize(path)
    with tempfile.TemporaryDirectory() as d:
        srl = os.path.join(d, "out.srl")
        dec = os.path.join(d, "out.wav")
        args = [REF_BIN, "-e", "-m", str(cfg["preset"]), "-B", str(cfg["B"]),
                "-V", str(cfg["V"]), "-L", str(cfg["L"])]
        if cfg["P"]:
            args += ["-P", str(cfg["P"])]
        t0 = time.time()
        subprocess.run(args + [path, srl], check=True, capture_output=True)
        t1 = time.time()
        subprocess.run([REF_BIN, "-d", srl, dec], check=True,
                       capture_output=True)
        t2 = time.time()
        comp = os.path.getsize(srl)
    return {
        "encode_pct_rt": 100.0 * (t1 - t0) / duration,
        "decode_pct_rt": 100.0 * (t2 - t1) / duration,
        "compression_pct": 100.0 * comp / raw_size,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="Directory of WAV files (default: synthetic corpus)")
    ap.add_argument("--out", default="evaluation_results.csv")
    ap.add_argument("--configs", nargs="*",
                    default=["-m 0 -V 0 -B 4096", "-m 2 -V 0 -B 4096",
                             "-m 4 -V 0 -B 4096"])
    ap.add_argument("--backends", nargs="*", default=["exact"])
    args = ap.parse_args()

    tmp = None
    if args.corpus:
        files = sorted(
            os.path.join(args.corpus, f) for f in os.listdir(args.corpus)
            if f.lower().endswith(".wav"))
    else:
        tmp = tempfile.TemporaryDirectory()
        files = synthetic_corpus(tmp.name)

    rows = []
    for cfg_str in args.configs:
        cfg = parse_config(cfg_str)
        for codec in [f"srla_tpu[{b}]" for b in args.backends] + ["reference"]:
            agg = {"encode_pct_rt": [], "decode_pct_rt": [],
                   "compression_pct": []}
            for path in files:
                if codec.startswith("srla_tpu"):
                    backend = codec.split("[")[1][:-1]
                    m = measure_srla_tpu(path, cfg, backend)
                else:
                    m = measure_reference(path, cfg)
                if m is None:
                    break
                for k, v in m.items():
                    agg[k].append(v)
            if not agg["encode_pct_rt"]:
                continue
            row = {"codec": codec, "config": cfg_str,
                   **{k: round(float(np.mean(v)), 3)
                      for k, v in agg.items()}}
            rows.append(row)
            print(row)

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
