"""Real-data capacity audit (VERDICT r3 task #6).

Runs PLG extraction + grid build over ALL real dtu006 edge images
(/root/reference/example/dtu006/edges/, 49 views @ 1600x1200) at the
default padding budgets and reports, per view: traced chains, chains
dropped to the max_polylines_per_view budget, max/95p chain length, and
coordinates clamped by max_polyline_len.  The default budgets must give
ZERO drops on this data (dtu006 is the reference's only shipped scene).

Usage: python tools/capacity_audit.py [--budget P] [--maxlen L]
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from edgegraph3d_tpu.config import EdgeGraphConfig
from edgegraph3d_tpu.plgs import extraction
from edgegraph3d_tpu.plgs.polyline_graph import from_polyline_list

EDGES_DIR = "/root/reference/example/dtu006/edges"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int,
                    default=EdgeGraphConfig.max_polylines_per_view)
    ap.add_argument("--maxlen", type=int,
                    default=EdgeGraphConfig.max_polyline_len)
    args = ap.parse_args()
    cfg = EdgeGraphConfig().replace(max_polylines_per_view=args.budget,
                                    max_polyline_len=args.maxlen)

    paths = sorted(glob.glob(os.path.join(EDGES_DIR, "*.png")))
    if not paths:
        print(f"no edge images under {EDGES_DIR}", file=sys.stderr)
        return 1
    total_drop = 0
    worst = (0, "")
    lens_all = []
    for p in paths:
        mask = np.asarray(Image.open(p).convert("L")) > 0
        chains = extraction.extract_chains_native(mask, cfg)
        if chains is None:
            m2 = extraction.remove_useless_corners(mask)
            node_xy, edges = extraction.build_pixel_edges(
                m2, loop_check_dist=cfg.loop_check_dist)
            chains = extraction.trace_chains(node_xy, edges)
            chains = extraction.optimize_chains(chains, cfg)
        plg = from_polyline_list(chains, max_polylines=args.budget,
                                 max_len=args.maxlen)
        n = len([c for c in chains if len(c) >= 2])
        # count post-split chains (the budget applies AFTER max_len
        # splitting, mirroring from_polyline_list)
        n_split = sum(-(-max(len(c) - 1, 1) // (args.maxlen - 1))
                      for c in chains if len(c) >= 2)
        lens = [len(c) for c in chains if len(c) >= 2]
        lens_all.extend(lens)
        total_drop += plg.overflow_dropped
        if n_split > worst[0]:
            worst = (n_split, os.path.basename(p))
        print(f"{os.path.basename(p)}: chains={n} post-split={n_split} "
              f"dropped={plg.overflow_dropped} maxlen={max(lens)} "
              f"p95len={int(np.percentile(lens, 95))}")
    lens_all = np.asarray(lens_all)
    print(f"\nTOTAL dropped at budget {args.budget}: {total_drop}")
    print(f"worst view: {worst[1]} with {worst[0]} post-split chains")
    print(f"chain length: max={lens_all.max()} "
          f"p99={int(np.percentile(lens_all, 99))} "
          f"p95={int(np.percentile(lens_all, 95))}")
    return 0 if total_drop == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
