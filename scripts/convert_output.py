#!/usr/bin/env python
"""Convert an output checkpoint PLY into viewer-friendly strand geometry.

Parity target: reference scripts/convert_output.py:18-77 — load the Gaussian
or hair checkpoint, extract eval-style points/edges, and write polyline
(edges) and triangle-fan (faces) PLYs for external viewers.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--prediction_path", "-p", required=True)
    parser.add_argument("--output_path", "-o", required=True)
    parser.add_argument("--sh_degree", type=int, default=0)
    parser.add_argument("--color", nargs=3, type=float, default=[0.35, 0.2, 0.1])
    args = parser.parse_args()

    from hairgs_tpu.evaluation.eval_data import load_eval_data_from_gaussians
    from hairgs_tpu.visualization import save_ply_edges, save_ply_faces

    data = load_eval_data_from_gaussians(args.prediction_path, args.sh_degree)
    points = data.points
    colors = np.tile((np.asarray(args.color) * 255).astype(np.uint8),
                     (points.shape[0], 1))
    os.makedirs(args.output_path, exist_ok=True)
    edges = data.edges
    save_ply_edges(points, colors, edges,
                   os.path.join(args.output_path, "strands_edges.ply"))
    if edges is not None and edges.shape[0]:
        save_ply_faces(points, colors, edges,
                       os.path.join(args.output_path, "strands_faces.ply"))
    print(f"wrote viewer PLYs for {points.shape[0]} points to {args.output_path}")


if __name__ == "__main__":
    main()
