#!/usr/bin/env python
"""32-px bucket histogram + whole-image-vs-tiled split for a real image
directory (VERDICT r5 #5: quantify real-directory serving).

Drives the REAL serving policy (`InferencePipeline._whole_image_plan` —
pixel budget, reflect limit, shape-cache cap, pad-up-to-compiled-bucket)
over the directory's shapes in serving order, without loading a model.

Usage:
  python scripts/bucket_histogram.py <dir-of-images>
  python scripts/bucket_histogram.py --shapes WxH,WxH,...   (no images)
  python scripts/bucket_histogram.py --shapes-file list.txt (one WxH/line)

Knobs honored: FREQFUSION_WHOLE_IMAGE_PX / _SHAPES.
Prints one JSON line with the histogram and the split.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shapes_from_dir(d):
    from PIL import Image
    out = []
    for f in sorted(os.listdir(d)):
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            with Image.open(os.path.join(d, f)) as im:
                w, h = im.size
            out.append((h, w))
    return out


def parse_shapes(items):
    out = []
    for s in items:
        s = s.strip()
        if s:
            w, h = s.lower().split("x")
            out.append((int(h), int(w)))
    return out


def simulate(shapes):
    """Run the real policy over (h, w) shapes in order."""
    from freqfusion_tpu.infer.io import InferencePipeline

    class _Stub:
        WHOLE_IMAGE_MAX_PX = InferencePipeline.WHOLE_IMAGE_MAX_PX
        WHOLE_IMAGE_MAX_SHAPES = InferencePipeline.WHOLE_IMAGE_MAX_SHAPES
        _cliff_warn = InferencePipeline._cliff_warn
        _whole_image_plan = InferencePipeline._whole_image_plan

    stub = _Stub()
    hist, whole, padded_up, tiled = {}, 0, 0, 0
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for h, w in shapes:
            hp = -(-max(h, 64) // 32) * 32
            wp = -(-max(w, 64) // 32) * 32
            hist[f"{wp}x{hp}"] = hist.get(f"{wp}x{hp}", 0) + 1
            plan = stub._whole_image_plan(h, w)
            if plan is None:
                tiled += 1
            elif plan != (hp, wp):
                padded_up += 1
            else:
                whole += 1
    return {
        "images": len(shapes),
        "distinct_buckets": len(hist),
        "histogram": dict(sorted(hist.items(), key=lambda kv: -kv[1])),
        "compiled_buckets": len(getattr(stub, "_whole_shapes", set())),
        "whole_image": whole, "padded_up": padded_up, "tiled": tiled,
        "whole_image_pct": round(100.0 * (whole + padded_up)
                                 / max(1, len(shapes)), 1),
        "max_px": _Stub.WHOLE_IMAGE_MAX_PX,
        "max_shapes": _Stub.WHOLE_IMAGE_MAX_SHAPES,
    }


def main():
    args = sys.argv[1:]
    if args and args[0] == "--shapes":
        shapes = parse_shapes(args[1].split(","))
    elif args and args[0] == "--shapes-file":
        with open(args[1]) as f:
            shapes = parse_shapes(f.readlines())
    elif args:
        shapes = shapes_from_dir(args[0])
    else:
        sys.exit(__doc__)
    print(json.dumps(simulate(shapes)))


if __name__ == "__main__":
    main()
