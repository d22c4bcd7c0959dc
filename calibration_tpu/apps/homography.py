"""Homography estimation & refinement CLI (reference:
apps/examples/homography.cpp).

Input JSON: {"correspondences": [{"object_xy": [x,y], "image_uv": [u,v]}...],
"ransac": {...}?, "optimize": true, "options": {...}}; output mirrors the
reference's OutputData aggregate.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from .. import native


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Homography estimation and refinement example")
    parser.add_argument("--input", required=True, help="Input JSON with correspondences")
    parser.add_argument("-o", "--output", default="", help="Optional output JSON file")
    parser.add_argument("--pretty", action="store_true", help="Pretty-print JSON output")
    parser.add_argument("--no-refine", action="store_true", help="Skip non-linear refinement")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from ..io import jsonio
    from ..ops import homography as H
    from ..ops import ransac as ransac_mod
    from ..optim import OptimOptions, optimize_homography
    from ..pipeline.facades.intrinsics import RansacConfig

    try:
        input_json = json.loads(Path(args.input).read_text())
    except OSError:
        print(f"Failed to open input file: {args.input}", file=sys.stderr)
        return 1

    corr = input_json.get("correspondences", input_json.get("field_0", []))
    obj = np.array([c.get("object_xy", c.get("field_0")) for c in corr], float)
    uv = np.array([c.get("image_uv", c.get("field_1")) for c in corr], float)
    if obj.shape[0] < 4:
        print("Failed to estimate homography", file=sys.stderr)
        return 1

    ransac_cfg = input_json.get("ransac")
    run_refine = (not args.no_refine) and bool(input_json.get("optimize", True))
    options = (
        jsonio.from_jsonable(input_json.get("options", {}), OptimOptions)
        if input_json.get("options")
        else OptimOptions()
    )

    if ransac_cfg is not None:
        ropts = jsonio.from_jsonable(ransac_cfg, RansacConfig).to_options()
        rr = ransac_mod.ransac_homography(jnp.asarray(obj), jnp.asarray(uv), ropts)
        success = bool(rr.success)
        hmtx = np.asarray(rr.model)
        inliers = [int(i) for i in np.where(np.asarray(rr.inlier_mask))[0]]
        rms = H.symmetric_rms_px(rr.model, jnp.asarray(obj), jnp.asarray(uv), rr.inlier_mask)
    else:
        hm = H.estimate_homography_dlt(jnp.asarray(obj), jnp.asarray(uv))
        success = bool(np.all(np.isfinite(np.asarray(hm))))
        hmtx = np.asarray(hm)
        inliers = list(range(obj.shape[0]))
        rms = H.symmetric_rms_px(
            hm, jnp.asarray(obj), jnp.asarray(uv), jnp.ones(obj.shape[0], bool)
        )

    if not success:
        print("Failed to estimate homography", file=sys.stderr)
        return 1

    output = {
        "success": True,
        "correspondence_count": int(obj.shape[0]),
        "estimated": {
            "success": success,
            "hmtx": hmtx.tolist(),
            "inliers": inliers,
            "symmetric_rms_px": float(rms),
        },
    }
    if run_refine:
        refined = optimize_homography(obj, uv, hmtx, options)
        opt_json = {
            "core": {
                "success": refined.core.success,
                "report": refined.core.report,
                "final_cost": refined.core.final_cost,
            },
            "homography": refined.homography.tolist(),
        }
        if refined.core.covariance is not None:
            opt_json["core"]["covariance"] = refined.core.covariance.tolist()
        output["optimized"] = opt_json

    text = native.dumps_fast(output, indent=2 if args.pretty else None)
    if args.output:
        Path(args.output).write_text(text + "\n")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
