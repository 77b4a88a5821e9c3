#!/bin/bash
# Round-5 grid finalization: rerun rows measured before the rice-search
# rewrite (3c2e664) or contaminated by concurrent profiling, measure the
# adversarial corpus, then merge everything into the committed CSVs.
set -ex
cd "$(dirname "$0")/.."

# 1) Rerun the configs measured with the pre-3c2e664 (old rice search)
#    library where the stale rows LOSE to the reference; the -m 0 -P 3 rows
#    already win with the old library and only understate us, so they keep
#    their committed figures if time runs short.
PYTHONUNBUFFERED=1 timeout 7200 python3 evaluation/evaluate_codecs.py \
  --corpus evaluation/corpus120 --backends exact tpu --repeats 3 \
  --out evaluation/results_r5_rerun.csv \
  --per-file evaluation/results_r5_rerun_per_file.csv \
  --configs \
  "-m 0 -V 2 -B 4096" "-m 0 -V 2 -B 8192" "-m 2 -V 2 -B 2048" \
  "-m 0 -P 3 -B 2048" "-m 0 -P 3 -B 4096" "-m 0 -P 3 -B 8192"

# 2) Adversarial corpus (transient/quiet/clipped/24-bit/4ch), two configs.
PYTHONUNBUFFERED=1 timeout 5400 python3 evaluation/evaluate_codecs.py \
  --corpus evaluation/corpus120x --backends exact tpu --repeats 3 \
  --out evaluation/results_adversarial_120s.csv \
  --per-file evaluation/results_adversarial_120s_per_file.csv \
  --configs "-m 4 -V 0 -B 4096" "-m 4 -P 3 -B 4096"

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
