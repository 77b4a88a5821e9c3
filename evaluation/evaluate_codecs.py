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
import json
import os
import shlex
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from srla_tpu import decode as srla_decode  # noqa: E402
from srla_tpu import encode as srla_encode  # noqa: E402
from srla_tpu.wavio import WavData, read_wav, write_wav  # noqa: E402

REF_BIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "tool", "srla")


def synthetic_corpus(tmpdir: str, seconds: float = 20.0,
                     extended: bool = False) -> list:
    """Deterministic synthetic corpus mirroring the reference evaluation's
    five RWC categories (classic/jazz/popular/vocal/rhythm — see
    /root/reference/evaluation/evaluate_codecs.py), two takes each.

    Signals are built from the ingredients that drive lossless-codec
    behavior: harmonic stacks with vibrato (LPC-friendly), note transients
    (block-boundary stress), sung-vowel formants with pitch drift (LTP),
    percussive noise bursts (raw/Rice-k stress), silence and quiet passages
    (silent/allzero blocks), and inter-channel correlation (MS/LS/SR).

    `extended` adds adversarial content the musical categories don't cover
    (codec behavior is content-dependent — NOTES r3 records a -V win
    flipping to a loss between corpora): transient-dense material,
    near-silence with true-zero gaps, hard-clipped program, 24-bit depth,
    and a >2-channel file."""
    rate = 44100
    n = int(seconds * rate)
    t = np.arange(n) / rate
    files = []

    def stereo(mid, side_gain, rng, amp=22000):
        delay = rng.randint(5, 40)
        side = np.roll(mid, delay) * side_gain
        l = np.clip(mid + side, -1, 1)
        r = np.clip(mid - side, -1, 1)
        return np.stack([np.round(l * amp), np.round(r * amp)]).astype(
            np.int32)

    def notes_env(seg, rng, attack=0.01, decay=3.0):
        """Per-note exponential envelopes at `seg`-second note boundaries."""
        env = np.zeros(n)
        for s0 in np.arange(0, seconds, seg):
            i0 = int(s0 * rate)
            i1 = min(n, int((s0 + seg) * rate))
            tt = np.arange(i1 - i0) / rate
            env[i0:i1] = np.minimum(tt / attack, 1.0) * np.exp(-tt * decay)
        return env

    def harmonics(f0, amps, vib_hz=5.0, vib_cents=8.0):
        vib = 2 ** (vib_cents / 1200 * np.sin(2 * np.pi * vib_hz * t))
        ph = 2 * np.pi * np.cumsum(f0 * vib) / rate
        return sum(a * np.sin((i + 1) * ph) for i, a in enumerate(amps))

    def classic(seed):
        rng = np.random.RandomState(seed)
        scale = [261.6, 293.7, 329.6, 392.0, 440.0]
        f0 = np.repeat(rng.choice(scale, int(seconds / 2) + 1),
                       2 * rate)[:n]
        sig = harmonics(f0, [.4, .2, .1, .05]) * notes_env(2.0, rng, .05, .8)
        sig[-rate:] *= np.linspace(1, 0, rate)  # decays to near-silence
        return stereo(sig * 0.8, 0.1, rng)

    def jazz(seed):
        rng = np.random.RandomState(seed)
        walk = [110, 146.8, 164.8, 220]
        f0 = np.repeat(rng.choice(walk, int(seconds * 2) + 1),
                       rate // 2)[:n]
        bass = harmonics(f0, [.5, .15]) * notes_env(0.5, rng, .005, 4.0)
        brush = rng.randn(n) * 0.02 * (1 + np.sin(2 * np.pi * 2 * t))
        return stereo((bass + brush) * 0.7, 0.2, rng)

    def popular(seed):
        rng = np.random.RandomState(seed)
        kick = np.zeros(n)
        for b in np.arange(0, seconds, 0.5):
            i0 = int(b * rate)
            ln = min(n - i0, 4000)
            kick[i0:i0 + ln] += np.sin(
                2 * np.pi * 55 * np.exp(-np.arange(ln) / 2000)
                * np.arange(ln) / rate) * np.exp(-np.arange(ln) / 1500)
        synth = harmonics(np.full(n, 196.0), [.25, .2, .15, .1, .05])
        sig = kick * 0.6 + synth * 0.3 * notes_env(1.0, rng, .01, 1.0)
        return stereo(sig, 0.3, rng)

    def vocal(seed):
        rng = np.random.RandomState(seed)
        f0 = 220 * 2 ** (np.cumsum(rng.randn(n) * 1e-5)
                         + 0.3 * np.sin(2 * np.pi * 0.4 * t))
        ph = 2 * np.pi * np.cumsum(f0) / rate
        glottal = sum(np.sin(k * ph) / k for k in range(1, 12))
        formant = np.sin(2 * np.pi * 800 * t) * 0.2 + 1.0
        breath = rng.randn(n) * 0.01
        sig = (glottal * 0.25 * formant + breath) * notes_env(4.0, rng,
                                                              0.3, 0.3)
        return stereo(sig, 0.05, rng)

    def rhythm(seed):
        rng = np.random.RandomState(seed)
        sig = np.zeros(n)
        for b in np.arange(0, seconds, 0.25):
            i0 = int(b * rate)
            ln = min(n - i0, 2500)
            tone = 1 if int(b * 4) % 4 else 0
            burst = rng.randn(ln) * (0.5 if tone else 0.9)
            burst *= np.exp(-np.arange(ln) / (300 if tone else 900))
            sig[i0:i0 + ln] += burst
        sig[n // 2:n // 2 + rate // 2] = 0  # hard silence gap
        return stereo(sig * 0.6, 0.4, rng)

    def transient(seed):
        # Transient-dense: randomized click/snap onsets every few ms defeat
        # long predictors and stress partition search + block boundaries.
        rng = np.random.RandomState(seed)
        sig = np.zeros(n)
        pos = 0
        while pos < n - 600:
            ln = rng.randint(40, 600)
            burst = rng.randn(ln) * np.exp(-np.arange(ln) / rng.randint(8, 80))
            sig[pos:pos + ln] += burst * rng.uniform(0.2, 0.95)
            pos += ln + rng.randint(20, 400)
        return stereo(np.clip(sig, -1, 1) * 0.8, 0.35, rng)

    def quiet(seed):
        # Near-silence with true-zero gaps: exercises SILENT blocks, tiny
        # Rice parameters, and the order-0/low-order decision edges.
        rng = np.random.RandomState(seed)
        sig = rng.randn(n) * 1.2e-4                       # ~-78 dBFS floor
        for _ in range(int(seconds)):
            i0 = rng.randint(0, n - rate // 2)
            sig[i0:i0 + rng.randint(rate // 8, rate // 2)] = 0.0  # hard zero
        for _ in range(int(seconds / 4)):
            i0 = rng.randint(0, n - 4000)
            tt = np.arange(4000)
            sig[i0:i0 + 4000] += (np.sin(2 * np.pi * rng.uniform(200, 2000)
                                         * tt / rate)
                                  * np.exp(-tt / 800) * 3e-3)
        return stereo(sig, 0.5, rng, amp=32000)

    def clipped(seed):
        # Hard-clipped loud program: long flat-topped runs at full scale
        # produce pathological residual statistics (max Rice k, raw blocks).
        rng = np.random.RandomState(seed)
        mix = (harmonics(np.full(n, 98.0), [.7, .4, .3, .2])
               + rng.randn(n) * 0.1) * 2.5
        return stereo(np.clip(mix, -0.999, 0.999), 0.1, rng, amp=32767)

    for name, fn in [("classic", classic), ("jazz", jazz),
                     ("popular", popular), ("vocal", vocal),
                     ("rhythm", rhythm)]:
        for take in (1, 2):
            pcm = fn(seed=100 * take + sum(name.encode()) % 97)
            path = os.path.join(tmpdir, f"{name}_{take}.wav")
            write_wav(path, WavData(pcm, rate, 16))
            files.append(path)
    if extended:
        for name, fn in [("transient", transient), ("quiet", quiet),
                         ("clipped", clipped)]:
            pcm = fn(seed=100 + sum(name.encode()) % 97)
            path = os.path.join(tmpdir, f"{name}_1.wav")
            write_wav(path, WavData(pcm, rate, 16))
            files.append(path)
        # 24-bit: vocal content rescaled to full 24-bit range.
        rng = np.random.RandomState(11)
        pcm16 = vocal(seed=211)
        pcm24 = np.clip(pcm16.astype(np.int64) * 256
                        + rng.randint(-127, 128, pcm16.shape),
                        -(1 << 23), (1 << 23) - 1).astype(np.int32)
        path = os.path.join(tmpdir, "deep24_1.wav")
        write_wav(path, WavData(pcm24, rate, 24))
        files.append(path)
        # 4-channel: two decorrelated stereo pairs (surround-style bed).
        a = classic(seed=311)
        b = rhythm(seed=313)
        pcm4 = np.concatenate([a, b], axis=0)
        path = os.path.join(tmpdir, "multi4_1.wav")
        write_wav(path, WavData(pcm4, rate, 16))
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


def _stable(times: list) -> bool:
    """Two fastest runs agree within 25% — enough to trust the min."""
    if len(times) < 2:
        return False
    a, b = sorted(times)[:2]
    return b <= 1.25 * a


def measure_host_batch(files: list, cfg: dict, backend: str,
                       repeats: int = 3):
    """Measure the srla_tpu HOST backends in a jax-free subprocess.

    In-process host timing on this machine is contaminated by the jax/axon
    runtime's background threads (always imported via sitecustomize); the
    deployment shape of the host path is a jax-free process, so measure it
    as one.  Returns a list of per-file metric dicts (incl. stream sha256
    for the byte-identity gate)."""
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "host_worker.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize axon/jax hook
    env["JAX_PLATFORMS"] = "cpu"           # belt & braces: never dial axon
    job = json.dumps({"files": files, "cfg": cfg, "backend": backend,
                      "repeats": repeats})
    proc = subprocess.run([sys.executable, worker], input=job.encode(),
                          env=env, capture_output=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"host worker failed: {proc.stderr.decode()[-2000:]}")
    return [json.loads(line) for line in proc.stdout.splitlines() if line]


def measure_srla_tpu(path: str, cfg: dict, backend: str, repeats: int = 3):
    from srla_tpu.decoder import SRLADecoder
    from srla_tpu.encoder import EncodeParameter, SRLAEncoder

    wav = read_wav(path)
    duration = wav.pcm.shape[1] / wav.sampling_rate
    raw_size = os.path.getsize(path)
    param = EncodeParameter(
        num_channels=wav.pcm.shape[0], bits_per_sample=wav.bits_per_sample,
        sampling_rate=wav.sampling_rate, preset=cfg["preset"],
        max_num_samples_per_block=cfg["B"],
        min_num_samples_per_block=cfg["B"] >> cfg["V"],
        num_lookahead_samples=cfg["L"] * cfg["B"], ltp_order=cfg["P"])
    pcm = np.asarray(wav.pcm, np.int32)
    enc_times, dec_times = [], []
    stream, st = None, {}
    # Best-of-N: run twice (the second run reuses compiled device programs,
    # which is the deployment steady state), early-stop when stable.
    for _ in range(repeats):
        enc = SRLAEncoder(param, backend=backend)
        t0 = time.time()
        s = enc.encode_whole(pcm)
        enc_times.append(time.time() - t0)
        if stream is None:
            stream, st = s, enc.stats
        else:
            assert s == stream, f"non-deterministic encode: {path}"
        dec = SRLADecoder(backend="tpu" if backend == "tpu" else "native")
        t0 = time.time()
        _, out = dec.decode_whole(s)
        dec_times.append(time.time() - t0)
        assert np.array_equal(out, wav.pcm), f"round trip failed for {path}"
        if _stable(enc_times) and _stable(dec_times):
            break
    # Capability accounting columns (no silent fallbacks): how much of the
    # encode/decode actually ran on which path.
    return {
        "encode_pct_rt": 100.0 * min(enc_times) / duration,
        "decode_pct_rt": 100.0 * min(dec_times) / duration,
        "compression_pct": 100.0 * len(stream) / raw_size,
        "enc_device_blocks": st.get("device_blocks", 0),
        "enc_host_blocks": st.get("host_blocks", 0),
        "enc_repaired_blocks": st.get("repaired_blocks", 0),
        "dec_device_blocks": dec.stats.get("device_blocks", 0),
        "dec_host_blocks": dec.stats.get("host_blocks", 0),
    }, stream


def measure_reference(path: str, cfg: dict, repeats: int = 3):
    if not os.path.exists(REF_BIN):
        return None, None
    wav = read_wav(path)
    duration = wav.pcm.shape[1] / wav.sampling_rate
    raw_size = os.path.getsize(path)
    enc_times, dec_times = [], []
    with tempfile.TemporaryDirectory() as d:
        srl = os.path.join(d, "out.srl")
        dec = os.path.join(d, "out.wav")
        args = [REF_BIN, "-e", "-m", str(cfg["preset"]), "-B", str(cfg["B"]),
                "-V", str(cfg["V"]), "-L", str(cfg["L"])]
        if cfg["P"]:
            args += ["-P", str(cfg["P"])]
        # Best-of-N with early stop, same policy as the srla_tpu rows: the
        # machine's multi-second external throttle windows make single-shot
        # timings a lottery for every codec.
        for _ in range(repeats):
            t0 = time.time()
            subprocess.run(args + [path, srl], check=True,
                           capture_output=True)
            t1 = time.time()
            subprocess.run([REF_BIN, "-d", srl, dec], check=True,
                           capture_output=True)
            t2 = time.time()
            enc_times.append(t1 - t0)
            dec_times.append(t2 - t1)
            if _stable(enc_times) and _stable(dec_times):
                break
        comp = os.path.getsize(srl)
        with open(srl, "rb") as f:
            stream = f.read()
    return {
        "encode_pct_rt": 100.0 * min(enc_times) / duration,
        "decode_pct_rt": 100.0 * min(dec_times) / duration,
        "compression_pct": 100.0 * comp / raw_size,
    }, stream


def measure_flac_py(path: str, cfg: dict):
    """Competitor row from the bundled from-scratch FLAC implementation
    (evaluation/flac_codec.py): COMPRESSION is directly comparable to any
    conforming FLAC encoder at ~-5 settings; speed is NOT comparable to the
    C `flac` tool (this is numpy) and is reported for completeness only."""
    import flac_codec

    wav = read_wav(path)
    if wav.bits_per_sample != 16 or wav.pcm.shape[0] > 2:
        return None
    duration = wav.pcm.shape[1] / wav.sampling_rate
    raw_size = os.path.getsize(path)
    t0 = time.time()
    data = flac_codec.encode_flac(wav.pcm, 16, wav.sampling_rate)
    t1 = time.time()
    back, _, _ = flac_codec.decode_flac(data)
    t2 = time.time()
    assert np.array_equal(back, wav.pcm), f"flac round trip failed: {path}"
    return {
        "encode_pct_rt": 100.0 * (t1 - t0) / duration,
        "decode_pct_rt": 100.0 * (t2 - t1) / duration,
        "compression_pct": 100.0 * len(data) / raw_size,
    }


def measure_flac(path: str, cfg: dict):
    """FLAC as the external competitor baseline (reference evaluation runs
    flac/wavpack/tta/tak/mpeg4als). Uses the system binary when present,
    else the bundled from-scratch implementation (flac-py rows)."""
    import shutil
    if shutil.which("flac") is None:
        return measure_flac_py(path, cfg)
    wav = read_wav(path)
    duration = wav.pcm.shape[1] / wav.sampling_rate
    raw_size = os.path.getsize(path)
    level = {0: "-0", 2: "-3", 4: "-5", 6: "-8"}.get(cfg["preset"], "-5")
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "out.flac")
        dec = os.path.join(d, "dec.wav")
        t0 = time.time()
        subprocess.run(["flac", level, "-f", "-s", "-o", out, path],
                       check=True, capture_output=True)
        t1 = time.time()
        subprocess.run(["flac", "-d", "-f", "-s", "-o", dec, out],
                       check=True, capture_output=True)
        t2 = time.time()
        comp = os.path.getsize(out)
    return {
        "encode_pct_rt": 100.0 * (t1 - t0) / duration,
        "decode_pct_rt": 100.0 * (t2 - t1) / duration,
        "compression_pct": 100.0 * comp / raw_size,
    }


# The reference evaluation's full matrix: every -m preset crossed with the
# fixed/variable/LTP block strategies and three block sizes
# (/root/reference/evaluation/evaluate_codecs.py:204-276 runs the same axes).
GRID_CONFIGS = [
    f"-m {m} {strat} -B {b}"
    for m in (0, 2, 4, 6)
    for strat in ("-V 0", "-V 2", "-P 3")
    for b in (2048, 4096, 8192)
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None,
                    help="Directory of WAV files (default: synthetic corpus)")
    ap.add_argument("--out", default="evaluation_results.csv")
    ap.add_argument("--configs", nargs="*",
                    default=["-m 0 -V 0 -B 4096", "-m 2 -V 0 -B 4096",
                             "-m 4 -V 0 -B 4096"])
    ap.add_argument("--grid", action="store_true",
                    help="Run the full {m}x{V/P}x{B} matrix (36 configs)")
    ap.add_argument("--backends", nargs="*", default=["exact"])
    ap.add_argument("--seconds", type=float, default=20.0,
                    help="Synthetic corpus file length")
    ap.add_argument("--per-file", default=None,
                    help="Also write per-file rows to this CSV")
    ap.add_argument("--tpu-files", type=int, default=None,
                    help="Measure the tpu backend on only the first N files"
                         " (device-program compiles through a remote link"
                         " cost minutes per new shape; other codecs still"
                         " run the full corpus)")
    ap.add_argument("--files", type=int, default=None,
                    help="Cap the corpus at the first N files (long-file"
                         " grid runs)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="Best-of-N budget for the srla_tpu rows (the"
                         " device tunnel's throughput swings 5-10x between"
                         " windows; raise for outlier re-measurement)")
    args = ap.parse_args()
    if args.grid:
        args.configs = GRID_CONFIGS

    tmp = None
    if args.corpus:
        files = sorted(
            os.path.join(args.corpus, f) for f in os.listdir(args.corpus)
            if f.lower().endswith(".wav"))
    else:
        tmp = tempfile.TemporaryDirectory()
        files = synthetic_corpus(tmp.name, args.seconds)
    if args.files:
        files = files[:args.files]

    import shutil
    flac_name = "flac" if shutil.which("flac") else "flac-py"
    rows = []
    file_rows = []
    mismatches = 0

    def fieldnames(rws):
        names = []
        for r in rws:
            for k in r:
                if k not in names:
                    names.append(k)
        return names

    def flush():
        # Incremental write: multi-hour grid runs must not lose completed
        # rows to one failing config. The aggregate CSV is rebuilt from the
        # per-file rows with intersection semantics (evaluation/aggregate.py)
        # so a codec measured on a file subset can never skew a mean.
        from aggregate import aggregate as _aggregate
        out_rows = _aggregate(file_rows) if file_rows else rows
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames(out_rows),
                               restval="")
            w.writeheader()
            w.writerows(out_rows)
        if args.per_file:
            with open(args.per_file, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=fieldnames(file_rows),
                                   restval="")
                w.writeheader()
                w.writerows(file_rows)
    for cfg_i, cfg_str in enumerate(args.configs):
        cfg = parse_config(cfg_str)
        # Reference first so its streams are available for the byte compare.
        codecs = ["reference"] + [f"srla_tpu[{b}]" for b in args.backends]
        if cfg_i == 0 or shutil.which("flac"):
            # flac-py has a single effort level; one row suffices.
            codecs += [flac_name]
        ref_streams = {}
        for codec in codecs:
            agg = {}
            cfiles = files
            if codec == "srla_tpu[tpu]" and args.tpu_files:
                cfiles = files[:args.tpu_files]
            if codec.startswith("srla_tpu") and "tpu" not in codec:
                # Host backends measure in a jax-free subprocess (their
                # deployment shape); one worker per config covers all files.
                import hashlib
                backend = codec.split("[")[1][:-1]
                try:
                    batch = measure_host_batch(cfiles, cfg, backend)
                except Exception as e:
                    mismatches += 1
                    print(f"MEASURE FAILED: {codec} {cfg_str}: {e!r}",
                          flush=True)
                    continue
                for m in batch:
                    path = m.pop("file")
                    sha = m.pop("sha256")
                    ref = ref_streams.get(path)
                    if ref is not None \
                            and hashlib.sha256(ref).hexdigest() != sha:
                        mismatches += 1
                        print(f"BYTE MISMATCH: {codec} {cfg_str} {path}")
                    for k, v in m.items():
                        agg.setdefault(k, []).append(v)
                    file_rows.append({
                        "codec": codec, "config": cfg_str,
                        "file": os.path.basename(path),
                        **{k: round(v, 3) for k, v in m.items()}})
                if not agg.get("encode_pct_rt"):
                    continue
                row = {"codec": codec, "config": cfg_str,
                       **{k: round(float(np.mean(v)), 3)
                          for k, v in agg.items()}}
                rows.append(row)
                print(row, flush=True)
                flush()
                continue
            for path in cfiles:
                try:
                    if codec.startswith("srla_tpu"):
                        backend = codec.split("[")[1][:-1]
                        m, stream = measure_srla_tpu(path, cfg, backend,
                                                     repeats=args.repeats)
                        # Bit-exactness vs the reference binary is the spec:
                        # matching flags must give byte-identical streams.
                        ref = ref_streams.get(path)
                        if ref is not None and stream != ref:
                            mismatches += 1
                            print(f"BYTE MISMATCH: {codec} {cfg_str} {path}")
                    elif codec == "reference":
                        m, stream = measure_reference(path, cfg)
                        if m is not None:
                            ref_streams[path] = stream
                    else:
                        m = measure_flac(path, cfg)
                except Exception as e:  # record, keep the grid going
                    mismatches += 1
                    print(f"MEASURE FAILED: {codec} {cfg_str} {path}: {e!r}",
                          flush=True)
                    continue
                if m is None:
                    break
                for k, v in m.items():
                    agg.setdefault(k, []).append(v)
                file_rows.append({"codec": codec, "config": cfg_str,
                                  "file": os.path.basename(path),
                                  **{k: round(v, 3) for k, v in m.items()}})
            if not agg.get("encode_pct_rt"):
                continue
            row = {"codec": codec, "config": cfg_str,
                   **{k: round(float(np.mean(v)), 3)
                      for k, v in agg.items()}}
            rows.append(row)
            print(row, flush=True)
            flush()

    flush()
    print(f"wrote {args.out}")
    if args.per_file:
        print(f"wrote {args.per_file}")
    if mismatches:
        print(f"{mismatches} byte mismatches vs reference")
        return 1
    return 0


if __name__ == "__main__":
    main()
