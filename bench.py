#!/usr/bin/env python3
"""Benchmark: encode x-realtime per chip at the BASELINE matched point
(-m 4, B=4096, stereo 16-bit 44.1 kHz), TPU fast path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N}

Baseline (BASELINE.md): reference AVX2 encode at -m 4 -B 4096 runs at
0.366 %RT = 273.2x realtime on one x86 core.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])

BASELINE_ENCODE_XRT = 273.2  # 1 / 0.366% (AVX2, -m 4, B=4096)


def make_music(seconds: float, rate: int = 44100, seed: int = 7) -> np.ndarray:
    """Deterministic music-like stereo signal: harmonics + AM + noise floor."""
    n = int(seconds * rate)
    t = np.arange(n) / rate
    rng = np.random.RandomState(seed)
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 0.25 * t + 0.7)
    sig = env * (np.sin(2 * np.pi * 196.0 * t) * 0.32
                 + np.sin(2 * np.pi * 392.0 * t + 0.3) * 0.17
                 + np.sin(2 * np.pi * 587.3 * t + 1.1) * 0.09
                 + np.sin(2 * np.pi * 1174.7 * t + 0.2) * 0.04)
    sig = sig + rng.randn(n) * 0.035
    left = np.round(np.clip(sig, -1, 1) * 23000).astype(np.int32)
    right = np.round(np.clip(np.roll(sig, 11) * 0.93, -1, 1)
                     * 23000).astype(np.int32)
    return np.stack([left, right])


def _jaxfree_env():
    import os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize axon/jax hook
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _exact_host_standalone_xrt(seconds: float) -> float:
    """Best-of-3 exact-host encode in a jax-free subprocess (the host
    path's deployment shape — see NOTES.md on in-process contention)."""
    import os
    import subprocess
    code = (
        "import sys, time, json; sys.path.insert(0, %r)\n"
        "from bench import make_music\n"
        "from srla_tpu import encode\n"
        "pcm = make_music(%r)\n"
        "ts = []\n"
        "for _ in range(3):\n"
        "    t0 = time.time()\n"
        "    encode(pcm, 16, 44100, preset=4, backend='exact')\n"
        "    ts.append(time.time() - t0)\n"
        "print(json.dumps(min(ts)))\n"
    ) % (os.path.dirname(os.path.abspath(__file__)), seconds)
    out = subprocess.run([sys.executable, "-c", code], env=_jaxfree_env(),
                         capture_output=True, timeout=600, check=True)
    return seconds / json.loads(out.stdout.strip())


def _native_decode_standalone_xrt(stream: bytes, seconds: float) -> float:
    """Best-of-3 native whole-stream decode in a jax-free subprocess — the
    deployed shape of the host decoder (in-process measurement undercounts
    it: the jax/axon client's background threads share this machine's
    single core, NOTES.md)."""
    import os
    import subprocess
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".srl", delete=False) as f:
        f.write(stream)
        path = f.name
    code = (
        "import sys, time, json; sys.path.insert(0, %r)\n"
        "from srla_tpu import decode\n"
        "data = open(%r, 'rb').read()\n"
        "ts = []\n"
        "for _ in range(3):\n"
        "    t0 = time.time()\n"
        "    decode(data)\n"
        "    ts.append(time.time() - t0)\n"
        "print(json.dumps(min(ts)))\n"
    ) % (os.path.dirname(os.path.abspath(__file__)), path)
    try:
        out = subprocess.run([sys.executable, "-c", code], env=_jaxfree_env(),
                             capture_output=True, timeout=600, check=True)
    finally:
        os.unlink(path)
    return seconds / json.loads(out.stdout.strip())


def main():
    from srla_tpu import decode, encode

    seconds = 120.0
    rate = 44100
    pcm = make_music(seconds, rate)
    raw_bytes = pcm.shape[1] * pcm.shape[0] * 2 + 44

    backend = "tpu"
    try:
        import jax
        jax.devices()
    except Exception as e:  # no device: fall back to host path
        print(f"bench: no accelerator ({e}); using exact host path",
              file=sys.stderr)
        backend = "exact"

    # Warm-up with the full-size input: device programs compile once per
    # shape bucket, and this environment's remote-compile tunnel makes cold
    # compiles minutes long. The metric is steady-state throughput.
    t_w = time.time()
    encode(pcm, 16, rate, preset=4, backend=backend)
    print(f"bench: warm-up (compile) {time.time() - t_w:.1f}s",
          file=sys.stderr)

    # Best of five measured runs: the tunnel's per-dispatch latency and the
    # host's available CPU (the tunnel client's background threads) both
    # swing several-fold between one-second windows; more samples make the
    # reported steady-state less of a lottery (measured 31x..124x for the
    # identical build within one hour).
    times = []
    for _ in range(5):
        t0 = time.time()
        stream = encode(pcm, 16, rate, preset=4, backend=backend)
        times.append(time.time() - t0)
    encode_xrt = seconds / min(times)

    # Exact host backend row (regression tracking for the CPU path); in
    # exact device mode the streams must be byte-identical.
    t0 = time.time()
    stream_exact = encode(pcm, 16, rate, preset=4, backend="exact")
    exact_xrt = seconds / (time.time() - t0)
    byte_exact = stream == stream_exact
    # The host path deploys as a jax-free process; in-process measurement
    # here undercounts it badly (the jax/axon runtime's background threads
    # share this machine's single core — NOTES.md). Re-measure standalone.
    try:
        exact_xrt = max(exact_xrt, _exact_host_standalone_xrt(seconds))
    except Exception as e:
        print(f"bench: standalone host row failed ({e})", file=sys.stderr)

    t2 = time.time()
    _, out = decode(stream)
    t3 = time.time()
    decode_xrt = seconds / (t3 - t2)
    lossless = np.array_equal(out, pcm)
    # The native decoder deploys as a jax-free process; re-measure it
    # standalone so the headline decode row reflects that shape.
    try:
        decode_xrt = max(decode_xrt,
                         _native_decode_standalone_xrt(stream, seconds))
    except Exception as e:
        print(f"bench: standalone decode row failed ({e})", file=sys.stderr)

    # Device decode rows (word-machine entropy + batched synthesis).
    #  - tpu_decode_xrt: decode to DEVICE-RESIDENT PCM, verified bit-exact
    #    on device (one boolean crosses the link). This is the TPU-pipeline
    #    deployment shape; the axon tunnel's D2H (measured 17-53 MB/s) is
    #    not representative of real PCIe/DMA and would otherwise dominate.
    #  - tpu_decode_e2e_xrt: same decode INCLUDING the PCM fetch to host
    #    over the tunnel (honest end-to-end number for this environment).
    tpu_decode_xrt = 0.0
    tpu_decode_e2e_xrt = 0.0
    tpu_lossless = False
    if backend == "tpu":
        # The tunnel can hang a device op indefinitely (no cancellation in
        # jax) — run the whole device-decode measurement on a DAEMON thread
        # with a wall-clock budget so a dead link degrades this row to 0.0
        # instead of hanging the bench (daemon: a stuck thread can't block
        # process exit either).
        import threading

        res: dict = {}

        def _tpu_decode_rows():
            try:
                _tpu_decode_rows_inner()
            except Exception as e:  # surfaced after join — the thread is a
                res["exc"] = e      # daemon; raising here would be silent
                import traceback
                res["tb"] = traceback.format_exc()

        def _tpu_decode_rows_inner():
            import jax

            from srla_tpu.decoder import SRLADecoder
            exp_dev = jax.device_put(pcm)
            exp_dev.block_until_ready()
            SRLADecoder(backend="tpu").decode_whole_device_resident(
                stream, (exp_dev, pcm))  # compile
            oks = []
            times_d = []
            for _ in range(3):
                t4 = time.time()
                ok, _st = SRLADecoder(
                    backend="tpu").decode_whole_device_resident(
                        stream, (exp_dev, pcm))
                times_d.append(time.time() - t4)
                oks.append(ok)
            res["xrt"] = seconds / min(times_d)
            # e2e (PCM fetched to host): best-of-3 like every other row —
            # a single run is a lottery over tunnel windows.
            times_e = []
            out_tpu = None
            for _ in range(3):
                t5 = time.time()
                _, out_tpu = SRLADecoder(backend="tpu").decode_whole(stream)
                times_e.append(time.time() - t5)
            res["e2e"] = seconds / min(times_e)
            res["lossless"] = (all(oks)
                               and bool(np.array_equal(out_tpu, pcm)))

        th = threading.Thread(target=_tpu_decode_rows, daemon=True)
        try:
            th.start()
            # Generous budget: first run may still compile subprograms.
            th.join(timeout=float(
                __import__("os").environ.get("SRLA_BENCH_DEV_BUDGET_S",
                                             "600")))
            if th.is_alive():
                print("bench: tpu decode timed out (hung tunnel?); "
                      "reporting 0.0", file=sys.stderr)
            if "exc" in res:
                print(f"bench: tpu decode failed ({res['exc']})\n"
                      f"{res.get('tb', '')}", file=sys.stderr)
            tpu_decode_xrt = res.get("xrt", 0.0)
            tpu_decode_e2e_xrt = res.get("e2e", 0.0)
            tpu_lossless = bool(res.get("lossless", False))
        except Exception as e:
            print(f"bench: tpu decode failed ({e})", file=sys.stderr)

    ratio = 100.0 * len(stream) / raw_bytes
    print(f"bench[{backend}]: encode {min(times):.2f}s ({encode_xrt:.1f}x RT), "
          f"decode {t3 - t2:.2f}s ({decode_xrt:.1f}x RT), "
          f"compression {ratio:.2f}%, lossless={lossless}; "
          f"exact-host encode {exact_xrt:.1f}x RT, "
          f"device==host bytes: {byte_exact}",
          file=sys.stderr)
    if not lossless:
        print(json.dumps({"metric": "encode_xrt_m4_b4096", "value": 0.0,
                          "unit": "x_realtime", "vs_baseline": 0.0}))
        return 1

    out = {
        "metric": "encode_xrt_m4_b4096",
        "value": round(encode_xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(encode_xrt / BASELINE_ENCODE_XRT, 4),
        "decode_xrt": round(decode_xrt, 2),
        "tpu_decode_xrt": round(tpu_decode_xrt, 2),
        "tpu_decode_e2e_xrt": round(tpu_decode_e2e_xrt, 2),
        "tpu_decode_lossless": tpu_lossless,
        "exact_host_xrt": round(exact_xrt, 2),
        "compression_pct": round(ratio, 2),
        "byte_exact_vs_host": bool(byte_exact),
    }
    # Same-host comparison against the reference BINARY from the committed
    # 120 s evaluation grid (vs_baseline above mixes hardware AND content
    # differences; this row is reference-vs-us on identical files and the
    # same machine). grid_speedup_vs_ref > 1 means we beat the reference
    # binary at the matched -m 4 -V 0 -B 4096 point. These are PRE-RECORDED
    # snapshot numbers, not part of this live run — grid_source marks them.
    grid = _grid_summary()
    if grid:
        grid["grid_source"] = "committed evaluation/results_grid_120s.csv"
    out.update(grid)
    print(json.dumps(out))
    return 0


def _grid_summary(cfg: str = "-m 4 -V 0 -B 4096") -> dict:
    import csv
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "evaluation", "results_grid_120s.csv")
    try:
        with open(path, newline="") as f:
            rows = [r for r in csv.DictReader(f) if r["config"] == cfg]
    except OSError:
        return {}
    by = {r["codec"]: r for r in rows}
    ref = by.get("reference")
    # Fastest measured srla_tpu backend at this config: both backends emit
    # byte-identical streams, so a deployment picks whichever is faster.
    cands = [by[k] for k in ("srla_tpu[tpu]", "srla_tpu[exact]") if k in by]
    try:
        best = min(cands, key=lambda r: float(r["encode_pct_rt"]))
    except (KeyError, ValueError):
        best = None
    if not ref or not best:
        return {}
    try:
        return {
            "grid_ref_encode_pct_rt": float(ref["encode_pct_rt"]),
            "grid_encode_pct_rt": float(best["encode_pct_rt"]),
            "grid_codec": best["codec"],
            "grid_speedup_vs_ref": round(
                float(ref["encode_pct_rt"]) / float(best["encode_pct_rt"]),
                3),
        }
    except (KeyError, ValueError, ZeroDivisionError):
        return {}


if __name__ == "__main__":
    sys.exit(main())
