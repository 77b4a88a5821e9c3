#!/usr/bin/env python3
"""A/B the Pallas LPC-synthesis kernel against the XLA scan on hardware.

Runs both formulations of the decode synthesis recurrence
(kernels/decode2._lpc_scan vs kernels/pallas_lpc.lpc_scan_pallas) at the
deployment shapes (rows = 128-block chunk x channels, n = block size),
checks bit-exact agreement on device, and reports steady-state timings.

The XLA scan pays ~4 us/sample-step of dispatch overhead (NOTES round-3
cost model: ~16 ms at n=4096); the Pallas kernel runs the whole recurrence
in one kernel with the M-tap window in a register tile. This tool is the
evidence for flipping SRLA_LPC_IMPL=pallas to default (VERDICT r4 task 6).

Usage: python tools/pallas_lpc_ab.py [reps]
Prints one JSON line per shape.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp

    from srla_tpu.kernels.decode2 import _align_coefs, _lpc_scan
    from srla_tpu.kernels.pallas_lpc import lpc_scan_pallas

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    fail = 0
    for (R, n, M) in [(256, 2048, 8), (256, 4096, 16), (256, 8192, 16),
                      (512, 4096, 16)]:
        rng = np.random.RandomState(R + n + M)
        res = rng.randint(-20000, 20000, (R, n)).astype(np.int32)
        orders = rng.randint(1, M + 1, R).astype(np.int32)
        coefs = rng.randint(-(1 << 15), 1 << 15, (R, M)).astype(np.int32)
        rshifts = rng.randint(1, 15, R).astype(np.int32)
        dcoef = rng.randint(0, 16, R).astype(np.int32)
        dprev = rng.randint(-30000, 30000, R).astype(np.int32)
        aligned = _align_coefs(jnp.asarray(coefs), jnp.asarray(orders), M)
        args = (jnp.asarray(res), aligned, jnp.asarray(orders),
                jnp.asarray(rshifts))
        kw = dict(dcoef=jnp.asarray(dcoef), dprev=jnp.asarray(dprev))

        # block_until_ready does not wait through the device link (NOTES);
        # time K data-dependent chained calls and one tiny forced fetch,
        # then subtract the measured fetch round-trip and divide by K.
        K = 8
        rts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jnp.zeros((1, 8), jnp.int32) + 1)
            rts.append(time.perf_counter() - t0)
        rt = min(rts)

        def run(fn):
            out = fn(*args, n, M, **kw)          # compile + correctness
            host = np.asarray(out)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                o = args[0]
                for _k in range(K):
                    o = fn(o, *args[1:], n, M, **kw)
                np.asarray(o[:1, :8])            # forced materialization
                ts.append(time.perf_counter() - t0)
            return host, max(min(ts) - rt, 1e-9) / K

        try:
            want, t_xla = run(lambda *a, **k: _lpc_scan(*a, **k))
            got, t_pal = run(
                lambda *a, **k: lpc_scan_pallas(*a, **k))
            exact = bool(np.array_equal(got, want))
            fail += not exact
            print(json.dumps({
                "shape": f"R{R}_n{n}_M{M}", "bit_exact": exact,
                "xla_scan_ms": round(t_xla * 1e3, 2),
                "pallas_ms": round(t_pal * 1e3, 2),
                "speedup": round(t_xla / t_pal, 2) if t_pal else None}))
        except Exception as e:
            fail += 1
            print(json.dumps({"shape": f"R{R}_n{n}_M{M}",
                              "error": repr(e)[:300]}))
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
