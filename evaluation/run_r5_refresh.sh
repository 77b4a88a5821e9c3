#!/bin/bash
# Round-5 grid finalization: rerun rows measured before the rice-search
# rewrite (3c2e664) or contaminated by concurrent profiling, measure the
# adversarial corpus, then merge everything into the committed CSVs.
set -ex
cd "$(dirname "$0")/.."

# Grid rows keep the XLA-scan LPC synthesis: the Pallas kernel (default on
# since r5) would add one remote Mosaic compile per NEW (B, W, M, Bp)
# decode bucket — dozens across 22 configs, minutes each through this
# tunnel — to improve only the decode rows, which are D2H-floor-bound here
# (NOTES r5: 0.52 %RT floor) and already documented as losing to the native
# path in this environment. bench.py measures the Pallas default separately.
export SRLA_LPC_IMPL=xla

# 1) Adversarial corpus (transient/near-silence/clipped/24-bit/4ch) — these
#    rows don't exist at all yet, so they run first.
PYTHONUNBUFFERED=1 timeout 3600 python3 evaluation/evaluate_codecs.py \
  --corpus evaluation/corpus120x --backends exact tpu --repeats 3 \
  --out evaluation/results_adversarial_120s.csv \
  --per-file evaluation/results_adversarial_120s_per_file.csv \
  --configs "-m 4 -V 0 -B 4096" "-m 4 -P 3 -B 4096"

# 2) Rerun every config whose committed row predates the round-5 library
#    (rice-search rewrite 3c2e664, int16 H2D, pipelined D2H): all of the
#    r3/r4-era grid rows that currently lose to the reference, worst first,
#    so a timeout still refreshes the most misleading rows. Rows write
#    incrementally; the merge below takes whatever finished.
PYTHONUNBUFFERED=1 timeout 10800 python3 evaluation/evaluate_codecs.py \
  --corpus evaluation/corpus120 --backends exact tpu --repeats 3 \
  --out evaluation/results_r5_rerun.csv \
  --per-file evaluation/results_r5_rerun_per_file.csv \
  --configs \
  "-m 4 -V 2 -B 8192" "-m 0 -V 2 -B 4096" "-m 0 -V 2 -B 8192" \
  "-m 0 -V 2 -B 2048" "-m 2 -V 2 -B 4096" "-m 2 -V 2 -B 8192" \
  "-m 2 -V 2 -B 2048" "-m 4 -V 0 -B 2048" "-m 4 -V 0 -B 4096" \
  "-m 4 -V 0 -B 8192" "-m 4 -P 3 -B 2048" "-m 4 -P 3 -B 8192" \
  "-m 6 -P 3 -B 4096" "-m 0 -P 3 -B 8192" "-m 0 -P 3 -B 4096" \
  "-m 0 -V 0 -B 8192" "-m 0 -V 0 -B 4096" "-m 2 -P 3 -B 2048" \
  "-m 2 -P 3 -B 8192" "-m 2 -P 3 -B 4096" "-m 2 -V 0 -B 8192" \
  "-m 6 -V 0 -B 2048"

# 3) Merge per-file rows (later wins) and rebuild the aggregate.
python3 evaluation/merge_grids.py evaluation/results_grid_120s_per_file.csv \
  evaluation/results_grid_120s_per_file.csv \
  evaluation/results_r5_grid_per_file.csv \
  evaluation/results_r5_grid2_per_file.csv \
  evaluation/results_r5_rerun_per_file.csv
python3 - <<'EOF'
import csv, sys
sys.path.insert(0, 'evaluation')
from aggregate import aggregate
rows = list(csv.DictReader(open('evaluation/results_grid_120s_per_file.csv')))
out = aggregate(rows)
names = []
for r in out:
    for k in r:
        if k not in names:
            names.append(k)
with open('evaluation/results_grid_120s.csv', 'w', newline='') as f:
    w = csv.DictWriter(f, fieldnames=names, restval='')
    w.writeheader(); w.writerows(out)
print('aggregate rows:', len(out))
EOF

# 4) Replot.
python3 evaluation/plot_codec_performance.py \
  --csv evaluation/results_grid_120s.csv --outdir evaluation/plots120
