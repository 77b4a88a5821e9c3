#!/usr/bin/env python3
"""Plot the evaluation grid: compression vs speed, one figure per block
strategy x block size, mirroring the reference's
evaluation/plot_codec_performance_graph.py (speed as % of realtime on the x
axis of a compression/speed tradeoff scatter).

Usage:
  python3 evaluation/plot_codec_performance.py \
      [--csv evaluation/results_grid.csv] [--outdir evaluation/plots]

Design notes: categorical colors use the first slots of a validated
colorblind-safe palette in fixed codec order (never cycled); single axis per
figure; per-point direct labels carry the -m preset so identity is not
color-alone.
"""

from __future__ import annotations

import argparse
import csv
import os
import re
from collections import defaultdict

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Fixed codec -> color order (validated categorical palette, light mode).
PALETTE = {
    "reference": "#2a78d6",       # blue
    "srla_tpu[exact]": "#eb6834",  # orange
    "srla_tpu[tpu]": "#1baf7a",    # aqua
    "flac": "#eda100",             # yellow
    "flac-py": "#eda100",          # yellow (bundled implementation)
}
MARKERS = {"reference": "o", "srla_tpu[exact]": "s", "srla_tpu[tpu]": "D",
           "flac": "^", "flac-py": "^"}
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e3e2de"
SURFACE = "#fcfcfb"


def load(csv_path):
    rows = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            m = re.match(r"-m (\d+) (-V (\d+)|-P (\d+)) -B (\d+)",
                         row["config"])
            if not m:
                continue
            strat = ("V" + m.group(3)) if m.group(3) is not None \
                else ("P" + m.group(4))
            rows.append(dict(
                codec=row["codec"], preset=int(m.group(1)), strat=strat,
                B=int(m.group(5)),
                encode=float(row["encode_pct_rt"]),
                decode=float(row["decode_pct_rt"]),
                comp=float(row["compression_pct"])))
    return rows


STRAT_TITLE = {"V0": "fixed blocks", "V2": "variable blocks (-V 2)",
               "P3": "long-term prediction (-P 3)"}

# Published competitor numbers from the reference repo's committed results
# (real FLAC/WavPack/TTA/Monkey's/ALS/TAK/HALAC binaries on the RWC corpus,
# single x86 core — /root/reference/evaluation/
# codec_comparison_summery_other_codecs.csv "total mean" rows). No real
# competitor binary exists or is installable in this environment, so these
# are imported as-published: DIFFERENT hardware and DIFFERENT corpus — use
# them for order-of-magnitude context, not point comparison (the caveat is
# stamped on every figure that shows them).
COMPETITOR_CSV = ("/root/reference/evaluation/"
                  "codec_comparison_summery_other_codecs.csv")
COMPETITOR_PICKS = ["FLAC -8", "WavPack -hh -x4", "TTA",
                    "Monkey's Audio -c4000", "MPEG4-ALS -7", "TAK -p4m",
                    "HALAC V.0.3.8 -mt=1 -normal"]
COMPETITOR_COLOR = "#8a8884"


def load_competitors(path=COMPETITOR_CSV):
    """-> {codec: {"encode": %RT, "decode": %RT, "comp": %}} or {}."""
    try:
        with open(path) as f:
            table = list(csv.reader(f))
    except OSError:
        return {}
    header = table[0]
    rows = {r[0]: r[1:] for r in table[1:] if r}
    need = {"encode": "total mean encode time",
            "decode": "total mean decode time",
            "comp": "total mean compression rate"}
    out = {}
    for name in COMPETITOR_PICKS:
        if name not in header[1:]:
            continue
        ix = header[1:].index(name)
        try:
            out[name] = {k: float(rows[v][ix]) for k, v in need.items()}
        except (KeyError, ValueError, IndexError):
            continue
    return out


def plot_group(rows, strat, B, metric, outdir, competitors=None):
    sel = [r for r in rows if r["strat"] == strat and r["B"] == B]
    if not sel:
        return None
    fig, ax = plt.subplots(figsize=(6.4, 4.6), dpi=120)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    codecs = [c for c in PALETTE if any(r["codec"] == c for r in sel)]
    for codec in codecs:
        pts = sorted((r for r in sel if r["codec"] == codec),
                     key=lambda r: r["preset"])
        xs = [r[metric] for r in pts]
        ys = [r["comp"] for r in pts]
        ax.plot(xs, ys, "-", color=PALETTE[codec], linewidth=2, alpha=0.55,
                zorder=2)
        ax.scatter(xs, ys, s=42, color=PALETTE[codec],
                   marker=MARKERS[codec], label=codec, zorder=3,
                   edgecolors=SURFACE, linewidths=1.2)
        for r in pts:
            ax.annotate(f"m{r['preset']}", (r[metric], r["comp"]),
                        textcoords="offset points", xytext=(6, 5),
                        fontsize=7.5, color=TEXT2)
    if competitors:
        xs = [v[metric] for v in competitors.values()]
        ys = [v["comp"] for v in competitors.values()]
        ax.scatter(xs, ys, s=26, color=COMPETITOR_COLOR, marker="x",
                   label="published competitors*", zorder=2, linewidths=1.2)
        for name, v in competitors.items():
            short = name.split(" V.")[0]
            ax.annotate(short, (v[metric], v["comp"]),
                        textcoords="offset points", xytext=(5, -8),
                        fontsize=6.5, color=COMPETITOR_COLOR)
        ax.text(0.99, 0.01,
                "*reference-published (RWC corpus, other hardware):"
                " context only, not same-run",
                transform=ax.transAxes, ha="right", va="bottom",
                fontsize=6.5, color=TEXT2)
    ax.set_xlabel(f"{metric} time, % of realtime (lower = faster)",
                  color=TEXT)
    ax.set_ylabel("compressed size, % of original (lower = smaller)",
                  color=TEXT)
    ax.set_title(f"{STRAT_TITLE.get(strat, strat)}, B={B} — {metric}",
                 color=TEXT, fontsize=11)
    ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
    for spine in ax.spines.values():
        spine.set_color(GRID)
    ax.tick_params(colors=TEXT2, labelsize=8.5)
    ax.legend(frameon=False, fontsize=8.5, labelcolor=TEXT)
    fig.tight_layout()
    name = f"{metric}_{strat}_B{B}.png"
    fig.savefig(os.path.join(outdir, name), facecolor=SURFACE)
    plt.close(fig)
    return name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default="evaluation/results_grid.csv")
    ap.add_argument("--outdir", default="evaluation/plots")
    ap.add_argument("--no-competitors", action="store_true",
                    help="Omit the published-competitor context markers")
    args = ap.parse_args()
    rows = load(args.csv)
    competitors = {} if args.no_competitors else load_competitors()
    os.makedirs(args.outdir, exist_ok=True)
    groups = sorted({(r["strat"], r["B"]) for r in rows})
    made = []
    for strat, B in groups:
        for metric in ("encode", "decode"):
            name = plot_group(rows, strat, B, metric, args.outdir,
                              competitors)
            if name:
                made.append(name)
    print(f"wrote {len(made)} plots to {args.outdir}")


if __name__ == "__main__":
    main()
