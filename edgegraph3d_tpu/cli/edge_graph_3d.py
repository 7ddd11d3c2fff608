"""EdgeGraph3D CLI (parity: src/edgegraph3d/edge_graph_3d.cpp:37-60 and
the parameter contract of io/input/edge_graph_3d_input_params.cpp:65-118).

Usage:
    python -m edgegraph3d_tpu.cli.edge_graph_3d [-i] \
        <images_folder> <edges_folder> <working_folder> \
        <input_sfm_data.json> <output.json>
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="EdgeGraph3D",
        description="TPU-native multi-view 3D edge reconstruction")
    ap.add_argument("-i", dest="debug_images", action="store_true",
                    help="output debug images")
    ap.add_argument("images_folder")
    ap.add_argument("edges_folder")
    ap.add_argument("working_folder")
    ap.add_argument("sfm_data_file")
    ap.add_argument("output_json")
    ap.add_argument("--max-starting-views", type=int, default=None,
                    help="limit starting cams per refpoint (speed knob)")
    ap.add_argument("--simplify-3d", action="store_true",
                    help="simplify the saved 3D graph (tol 0.01, "
                    "polyline_graph_3d.hpp:65)")
    ap.add_argument("--fragment-3d", type=float, default=None,
                    metavar="MAXLEN",
                    help="fragment the saved 3D graph at this arc-length "
                    "(polyline_graph_3d.cpp:99-122)")
    ap.add_argument("--ba-steps", type=int, default=0, metavar="N",
                    help="joint Schur-LM bundle-adjustment steps over "
                    "the augmented scene (cameras + points free) before "
                    "the final filter; 0 disables (new capability over "
                    "the reference's point-only refinement, "
                    "gauss_newton.cpp:136-178)")
    args = ap.parse_args(argv)

    from edgegraph3d_tpu.config import DEFAULT_CONFIG
    from edgegraph3d_tpu.pipeline import edge_matching
    cfg = DEFAULT_CONFIG.replace(
        output_3d_simplify=args.simplify_3d,
        output_3d_fragment_maxlen=args.fragment_3d,
        ba_steps=args.ba_steps)
    out = edge_matching(args.images_folder, args.edges_folder,
                        args.working_folder, args.sfm_data_file,
                        args.output_json, config=cfg,
                        max_starting_views=args.max_starting_views,
                        debug_images=args.debug_images)
    print(f"Wrote {out.n_points} points to {args.output_json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
