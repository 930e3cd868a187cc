"""Compare a sharded Phase-B study CSV against the committed artifact.

Gate for the multichip punch-list item: a Phase-B sweep run with
`--shard N` (solves executed under shard_map on an N-device mesh,
parallel/sharded_solve.py) must reproduce the committed single-chip
artifact `examples/phase_b_tpu_h0.02/` to <= 1e-8 relative on every
metric column.  Reference analogue: the latent MPI capability scoped in
SURVEY.md section 2.3 (the FEniCS original runs serially; ref
no_advection_analysis_B.py produces the same CSV schema).

Usage:
    python -m fenics_eff_uptake_tpu.studies.phase_b run --shard 8 --tp 2 \
        --output-base /tmp/pb_shard_full
    python scripts/compare_sharded_study.py /tmp/pb_shard_full
"""
import json
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV_REL = os.path.join("mu Sweep Analysis", "no_adv_mu_sweep_results.csv")
COMMITTED = os.path.join(REPO, "examples", "phase_b_tpu_h0.02", CSV_REL)
METRICS = ["avg_conc_sulc", "avg_conc_rect", "flux_sulc_y0",
           "flux_rect_bottom", "CR", "flux_ratio"]
TOL = 1e-8


def compare(shard_base, committed=COMMITTED, tol=TOL):
    s = pd.read_csv(os.path.join(shard_base, CSV_REL))
    g = pd.read_csv(committed)
    m = s.merge(g, on=["geometry", "mu_factor"], suffixes=("_sh", "_ref"))
    out = {"rows_sharded": len(s), "rows_committed": len(g),
           "rows_matched": len(m), "tol": tol, "per_metric": {}}
    worst = 0.0
    for c in METRICS:
        a = m[c + "_sh"].to_numpy()
        b = m[c + "_ref"].to_numpy()
        rel = float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-12)))
        out["per_metric"][c] = rel
        worst = max(worst, rel)
    out["max_rel_delta"] = worst
    out["ok"] = bool(len(m) == len(s) and len(m) > 0 and worst <= tol)
    return out


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pb_shard_full"
    res = compare(base)
    print(json.dumps(res, indent=2))
    sys.exit(0 if res["ok"] else 1)
