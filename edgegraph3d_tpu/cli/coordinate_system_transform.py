"""coordinate_system_transform CLI (parity:
src/coordinate_system_transform/transform_coordinate_system.cpp main).

Usage:
    python -m edgegraph3d_tpu.cli.coordinate_system_transform \
        <input.json> <target_camera_poses.txt> <output.json>
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="coordinate_system_transform")
    ap.add_argument("input_json")
    ap.add_argument("target_poses")
    ap.add_argument("output_json")
    ap.add_argument("--keep-null-cameras", action="store_true",
                    help="include all-zero target cameras in the fit")
    args = ap.parse_args(argv)

    from edgegraph3d_tpu.core import sfm as sfm_io
    from edgegraph3d_tpu.utils.transform import (read_camera_poses,
                                                 transform_coordinate_system)

    sfmd = sfm_io.read_sfm_data(args.input_json)
    targets = read_camera_poses(args.target_poses)
    out = transform_coordinate_system(
        sfmd, targets, exclude_null_cameras=not args.keep_null_cameras)
    sfm_io.write_sfm_data(out, args.output_json)
    print(f"Transformed {out.n_points} points, {out.n_cameras} cameras")
    return 0


if __name__ == "__main__":
    sys.exit(main())
