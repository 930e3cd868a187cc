"""Merge chunked sharded-study runs and compare against the committed
artifact (full-width verification on a host that cannot hold the whole
study in one run).

The 8-virtual-device CPU mesh executes every solve under shard_map
exactly as one chunk of geometries at a time (the single-core host makes
a monolithic 24-geometry run impractical); each chunk writes its own
--output-base.  This script concatenates the chunk CSVs, de-duplicates
on the study keys, and gates the union row-for-row against the
committed single-chip artifact via scripts/compare_sharded_study.py's
comparator.

Usage:
    python scripts/merge_sharded_chunks.py no_uptake OUT.json CHUNK_DIR...
"""
import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_sharded_study import STUDIES, compare  # noqa: E402


def main():
    study = sys.argv[1]
    out_path = sys.argv[2]
    chunk_dirs = sys.argv[3:]
    cfg = STUDIES[study]
    frames = []
    for d in chunk_dirs:
        p = os.path.join(d, cfg["csv_rel"])
        if os.path.exists(p):
            frames.append(pd.read_csv(p))
        else:
            print(f"(skipping {d}: no {cfg['csv_rel']})")
    if not frames:
        print("no chunk CSVs found")
        sys.exit(1)
    merged = pd.concat(frames, ignore_index=True)
    merged = merged.drop_duplicates(subset=cfg["keys"], keep="last")
    base = "/tmp/_sharded_merge"
    dst = os.path.join(base, os.path.dirname(cfg["csv_rel"]))
    os.makedirs(dst, exist_ok=True)
    merged.to_csv(os.path.join(base, cfg["csv_rel"]), index=False)
    res = compare(base, study)
    res["chunks"] = chunk_dirs
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=2)
    print(json.dumps(res, indent=2))
    sys.exit(0 if res["ok"] else 1)


if __name__ == "__main__":
    main()
