"""json_to_ply CLI (parity: src/utils/json_to_ply.cpp:47-93).

Usage:
    python -m edgegraph3d_tpu.cli.json_to_ply <input.json> <output.ply> \
        [--images <folder>]   # colored output
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="json_to_ply")
    ap.add_argument("input_json")
    ap.add_argument("output_ply")
    ap.add_argument("--images", default=None,
                    help="RGB image folder for colored output")
    args = ap.parse_args(argv)

    from edgegraph3d_tpu.core import sfm as sfm_io
    from edgegraph3d_tpu.io.ply import output_point_cloud

    sfmd = sfm_io.read_sfm_data(args.input_json)
    images = None
    if args.images:
        from edgegraph3d_tpu.io.images import list_image_files, \
            load_rgb_image
        files = list_image_files(args.images)
        images = [load_rgb_image(f) for f in files]
    output_point_cloud(sfmd, args.output_ply, images)
    print(f"Wrote {sfmd.n_points} points to {args.output_ply}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
