#!/usr/bin/env python3
"""Regenerate the long-file evaluation corpora (not committed: ~100 MB).

The corpora are fully deterministic (synthetic_corpus uses fixed seeds):
  corpus120/  = classic_1, vocal_1, rhythm_1 at 120 s  (3-file grid runs)
  corpus120b/ = classic_1, vocal_1 at 120 s            (2-file grid runs)

Usage: python3 evaluation/make_corpus.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from evaluate_codecs import synthetic_corpus  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    with tempfile.TemporaryDirectory() as d:
        files = synthetic_corpus(d, 120.0, extended=True)
        by_name = {os.path.basename(f): f for f in files}
        for outdir, names in (
                ("corpus120", ["classic_1.wav", "vocal_1.wav",
                               "rhythm_1.wav"]),
                # Adversarial companion corpus (evaluate with
                # --corpus evaluation/corpus120x): content the musical
                # categories don't cover — transient-dense, near-silent,
                # hard-clipped, 24-bit, 4-channel.
                ("corpus120x", ["transient_1.wav", "quiet_1.wav",
                                "clipped_1.wav", "deep24_1.wav",
                                "multi4_1.wav"]),
                ("corpus120b", ["classic_1.wav", "vocal_1.wav"])):
            out = os.path.join(HERE, outdir)
            os.makedirs(out, exist_ok=True)
            for n in names:
                shutil.copy(by_name[n], os.path.join(out, n))
            print(f"{out}: {names}")


if __name__ == "__main__":
    main()
