#!/usr/bin/env python
"""Cem-Yuksel hair dataset download + preparation.

Parity target: reference scripts/download_parse_cy.py — download the .hair
models from cemyuksel.com, parse them, and generate the synthetic multi-view
dataset (same outputs as the USC pipeline).
"""

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODELS = ["wWavy", "wStraight", "wCurly"]
URL = "http://www.cemyuksel.com/research/hairmodels/{name}.hair.gz"


def download(name: str, target_dir: str) -> str:
    import gzip
    import shutil

    os.makedirs(target_dir, exist_ok=True)
    path = os.path.join(target_dir, f"{name}.hair")
    if os.path.exists(path):
        return path
    gz_path = path + ".gz"
    print(f"downloading {URL.format(name=name)}")
    urllib.request.urlretrieve(URL.format(name=name), gz_path)
    with gzip.open(gz_path, "rb") as src, open(path, "wb") as dst:
        shutil.copyfileobj(src, dst)
    os.remove(gz_path)
    return path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_path", "-o", required=True)
    parser.add_argument("--models", nargs="+", default=MODELS)
    parser.add_argument("--cache", default="./cy_cache")
    parser.add_argument("--cameras", type=int, default=16)
    parser.add_argument("--width", type=int, default=1000)
    parser.add_argument("--height", type=int, default=1000)
    parser.add_argument("--cam_z", type=float, default=0.5)
    parser.add_argument("--pct_strands", type=float, default=100)
    parser.add_argument("--orientation", choices=["analytic", "gabor"],
                        default="analytic")
    parser.add_argument("--head_obj", default=None,
                        help="optional woman.obj head mesh (CY conventions)")
    args = parser.parse_args()

    from hairgs_tpu.data.cy import load_hair_from_cy_dataset
    from hairgs_tpu.data.head import load_head_from_cy_dataset
    from hairgs_tpu.data.synthetic import generate_dataset

    head = load_head_from_cy_dataset(args.head_obj) if args.head_obj else None
    for name in args.models:
        path = download(name, args.cache)
        hair = load_hair_from_cy_dataset(path, pct_strands=args.pct_strands)
        out = os.path.join(args.output_path, name)
        generate_dataset(
            out, hair,
            head_verts=head.verts if head is not None else None,
            num_cameras=args.cameras, width=args.width, height=args.height,
            cam_z=args.cam_z, orientation_source=args.orientation,
        )
        print(f"{name}: dataset written to {out}")


if __name__ == "__main__":
    main()
