#!/usr/bin/env python3
"""Merge partial 120 s grid runs into one results_grid_120s.csv.

Later inputs win on (codec, config) collisions — pass runs in
oldest-to-newest order. Rows keep their original columns; missing columns
are blank (the reference/flac rows have no stats columns).

Usage:
  python3 evaluation/merge_grids.py OUT.csv IN1.csv IN2.csv [...]
"""

import csv
import sys


def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    rows: dict[tuple, dict] = {}
    order: list[tuple] = []
    names: list[str] = []
    for path in ins:
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                key = (row["codec"], row["config"], row.get("file", ""))
                if key not in rows:
                    order.append(key)
                rows[key] = row
                for k in row:
                    if k not in names:
                        names.append(k)
    # Stable presentation: group by config in first-seen order, fixed codec
    # order within a config.
    codec_rank = {"reference": 0, "srla_tpu[exact]": 1, "srla_tpu[tpu]": 2}
    cfg_order = []
    for key in order:
        if key[1] not in cfg_order:
            cfg_order.append(key[1])
    order.sort(key=lambda k: (cfg_order.index(k[1]),
                              codec_rank.get(k[0], 9), k[2]))
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=names, restval="")
        w.writeheader()
        w.writerows(rows[k] for k in order)
    print(f"wrote {out_path}: {len(rows)} rows from {len(ins)} inputs")


if __name__ == "__main__":
    main()
