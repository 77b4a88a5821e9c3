#!/usr/bin/env python3
"""Minimal repros for the Mosaic/Pallas miscompiles that parked the Pallas
bit-packer (kernels/pallas_pack.py) in rounds 2-3.

Two independent packing formulations were bit-exact under
``pallas_call(..., interpret=True)`` but produced wrong words through the
device Mosaic pipeline (NOTES.md "Mosaic/Pallas miscompile"):

  probe A — dot_general with M=1: a (1, C) values row combined against a
            (C, W) one-hot placement matrix via jnp.dot. pallas_pack.py's
            header says "dot_general with M=1 miscompiles (verified by
            probe kernels)"; this is that probe, committed.
  probe B — dynamic-window read-modify-write: a fori_loop ORing each
            codeword into out_ref at a data-dependent word offset through
            pl.ds dynamic slices.
  probe C — the production-candidate masked-reduction combine (the shipped
            pallas_pack.py formulation) as a control: expected to PASS.

Run on real TPU hardware:  python3 tools/mosaic_repro.py
Each probe prints PASS or MISCOMPILE(+first mismatching words) comparing
device output against interpret=True on identical inputs. Exit code 1 if
any probe marked `expected_ok` fails, so CI can pin the control.
"""

from __future__ import annotations

import sys
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
from jax.experimental import pallas as pl               # noqa: E402
from jax.experimental.pallas import tpu as pltpu        # noqa: E402

C = 256        # codewords per row
W = 128        # output words per row


def _inputs(seed: int = 0):
    """Codeword placements: disjoint 8-bit fields, one per codeword slot,
    so integer sums equal ORs and every formulation must agree exactly."""
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 256, size=(1, C)).astype(np.int32)
    word = rng.randint(0, W, size=(1, C)).astype(np.int32)
    shift = (rng.randint(0, 4, size=(1, C)) * 8).astype(np.int32)
    # Keep (word, shift) pairs unique -> disjoint fields.
    key = word * 4 + shift // 8
    _, first = np.unique(key, return_index=True)
    mask = np.zeros((1, C), bool)
    mask[0, first] = True
    vals = np.where(mask, vals, 0)
    return jnp.asarray(vals), jnp.asarray(word), jnp.asarray(shift)


# --- probe A: one-hot dot_general with M=1 ------------------------------- #

def _dot_kernel(vals_ref, word_ref, shift_ref, out_ref):
    vals = vals_ref[...]                       # (1, C)
    word = word_ref[...]
    shift = shift_ref[...]
    shifted = vals << shift                    # (1, C)
    cols = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    onehot = (cols == word.reshape(C, 1)).astype(jnp.int32)   # (C, W)
    out_ref[...] = jnp.dot(shifted, onehot,
                           preferred_element_type=jnp.int32)  # (1, W) M=1


# --- probe B: dynamic-window RMW ----------------------------------------- #

def _rmw_kernel(vals_ref, word_ref, shift_ref, out_ref):
    out_ref[...] = jnp.zeros((1, W), jnp.int32)

    def body(i, _):
        w = word_ref[0, i]
        v = vals_ref[0, i] << shift_ref[0, i]
        cur = out_ref[pl.ds(0, 1), pl.ds(w, 1)]
        out_ref[pl.ds(0, 1), pl.ds(w, 1)] = cur | v
        return 0

    jax.lax.fori_loop(0, C, body, 0)


# --- probe C (control): masked lane reduction (shipped formulation) ------ #

def _mask_kernel(vals_ref, word_ref, shift_ref, out_ref):
    vals = vals_ref[...]
    word = word_ref[...]
    shift = shift_ref[...]
    shifted = (vals << shift).reshape(1, C)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (W, C), 0)
    contrib = jnp.sum(jnp.where(lanes == word.reshape(1, C), shifted, 0),
                      axis=1, keepdims=True)               # (W, 1)
    out_ref[...] = contrib.reshape(1, W)


def _run(kernel, interpret: bool):
    vals, word, shift = _inputs()
    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        interpret=interpret,
    )
    return np.asarray(fn(vals, word, shift))


def probe(name: str, kernel, expected_ok: bool) -> bool:
    ref = _run(kernel, interpret=True)
    try:
        dev = _run(kernel, interpret=False)
    except Exception as e:  # compile/runtime error is also a finding
        print(f"{name}: ERROR on device: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")
        return not expected_ok
    if np.array_equal(ref, dev):
        if not expected_ok:
            # The canary: this formulation is KNOWN-BROKEN on the stack the
            # repro was committed against. It passing means a jaxlib/Mosaic
            # bump fixed the packing path — unpark kernels/pallas_pack.py's
            # fast formulations and re-run the bench A/B.
            print(f"{name}: FIXED UPSTREAM (was known-broken) — unpark "
                  "pallas_pack.py fast formulations")
            return False
        print(f"{name}: PASS (device == interpreter)")
        return True
    bad = np.flatnonzero(ref[0] != dev[0])[:8]
    print(f"{name}: MISCOMPILE — {len(np.flatnonzero(ref[0] != dev[0]))}/"
          f"{W} words differ; first at {bad.tolist()}; "
          f"ref={ref[0][bad].tolist()} dev={dev[0][bad].tolist()}")
    return not expected_ok


def main() -> int:
    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"devices {jax.devices()}")
    if jax.default_backend() != "tpu":
        print("NOTE: no TPU — interpret-vs-interpret is vacuous; "
              "run this on hardware.")
    ok = True
    ok &= probe("A one-hot dot_general M=1 ", _dot_kernel, expected_ok=False)
    ok &= probe("B dynamic-window RMW      ", _rmw_kernel, expected_ok=False)
    ok &= probe("C masked reduction control", _mask_kernel, expected_ok=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
