#!/usr/bin/env python3
"""Measure H2D/D2H bandwidth through the device link vs transfer concurrency.

The encode path's floor is the PCM upload and the decode path's floor is the
PCM fetch (NOTES.md: 17-90 MB/s observed through the axon tunnel).  If the
link multiplexes independent transfers, splitting one large copy into k
concurrent slice copies raises aggregate bandwidth; this probe measures the
sweet spot so the defaults in decoder._fetch_concurrent / encoder uploads
are data, not guesses.

Usage: python tools/tunnel_probe.py [MB] [reps]
Prints one JSON line per (direction, parts) with best-of-reps MB/s.
"""

import concurrent.futures as cf
import json
import sys
import time

import numpy as np


def _d2h(arr, parts: int) -> float:
    # Always fetch via fresh slice objects: np.asarray(arr) caches the host
    # copy on the jax Array, so a repeated whole-array fetch times ~0.
    rows = arr.shape[0]
    parts = max(1, parts)
    step = -(-rows // parts)
    chunks = [arr[k * step:(k + 1) * step]
              for k in range(parts) if k * step < rows]
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(len(chunks)) as ex:
        list(ex.map(np.asarray, chunks))
    return time.perf_counter() - t0


def _h2d(host: np.ndarray, parts: int) -> float:
    # block_until_ready does NOT wait through the tunnel (NOTES.md); force
    # materialization by consuming every chunk in a jitted reduction and
    # fetching the scalar result.
    import jax
    import jax.numpy as jnp

    def _consume(o) -> float:
        return float(jnp.sum(o.astype(jnp.int32)))

    rows = host.shape[0]
    if parts <= 1:
        t0 = time.perf_counter()
        _consume(jax.device_put(host))
        return time.perf_counter() - t0
    step = -(-rows // parts)
    chunks = [host[k * step:(k + 1) * step]
              for k in range(parts) if k * step < rows]
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(len(chunks)) as ex:
        outs = list(ex.map(jax.device_put, chunks))
    for o in outs:
        _consume(o)
    return time.perf_counter() - t0


def main() -> int:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 21.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    rows = int(mb * 1e6) // (2 * 1024)
    host = np.random.RandomState(0).randint(
        -2 ** 15, 2 ** 15, size=(rows, 1024), dtype=np.int16)
    nbytes = host.nbytes
    darr = jax.device_put(host)
    darr.block_until_ready()
    _ = np.asarray(darr[:8])  # warm the fetch path
    for parts in (1, 2, 4, 8, 16, 32):
        ts = [_d2h(darr, parts) for _ in range(reps)]
        print(json.dumps({"dir": "d2h", "parts": parts,
                          "mbps": round(nbytes / min(ts) / 1e6, 1),
                          "all_mbps": [round(nbytes / t / 1e6, 1)
                                       for t in ts]}))
    for parts in (1, 2, 4, 8, 16, 32):
        ts = [_h2d(host, parts) for _ in range(reps)]
        print(json.dumps({"dir": "h2d", "parts": parts,
                          "mbps": round(nbytes / min(ts) / 1e6, 1),
                          "all_mbps": [round(nbytes / t / 1e6, 1)
                                       for t in ts]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
