"""Probe: does the Stage-III precision collapse come from low-opacity clutter?

Loads a Stage-III HairModel checkpoint on CPU, recomputes the strand metric
grid with the eval foreground opacity threshold swept upward (the eval default
is OPACITY_TH=0.005 — barely above the opacity-reset floor), and prints the
(4mm,90deg) precision/recall/F1 per threshold.  If precision recovers as the
threshold rises, the converged model's geometry is fine and the regression is
near-invisible clutter the reference-parity eval convention counts.

Usage: python scripts/probe_opacity_filter.py <ply> <source_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ply, src = sys.argv[1], sys.argv[2]
    import os

    from hairgs_tpu.evaluation.eval_data import compute_eval_data_from_hair
    from hairgs_tpu.evaluation.metrics import compute_metrics
    from hairgs_tpu.io.npz import HairEvalData, load_hair_eval_data_npz
    from hairgs_tpu.models.hair import HairModel
    from hairgs_tpu.topo.strands import compute_strands_info

    gt = load_hair_eval_data_npz(os.path.join(src, "hair_eval_data.npz"))
    h = HairModel(sh_degree=0)
    h.load_ply(ply)
    arrays = h.host_arrays(keys=("endpoints", "endpoint_pairs", "opacity", "mask"))
    opa = h.np_opacity(arrays)[:, 0]
    msk = h.np_mask(arrays)[:, 0]
    n = opa.shape[0]
    print(f"segments={n}  opacity percentiles "
          f"p10={np.percentile(opa, 10):.4f} p50={np.percentile(opa, 50):.4f} "
          f"p90={np.percentile(opa, 90):.4f}")
    for th in (0.005, 0.05, 0.1, 0.25, 0.5):
        keep = (opa >= th) & (msk >= 0.25)
        info = compute_strands_info(
            h, only_foreground=False, store=False,
            arrays={"endpoints": arrays["endpoints"],
                    "endpoint_pairs": arrays["endpoint_pairs"][keep],
                    "opacity": arrays["opacity"][keep],
                    "mask": arrays["mask"][keep]})
        if not info.list_strands:
            print(f"th={th}: no strands")
            continue
        seg_id = np.concatenate(info.list_strands, axis=0)
        segs = arrays["endpoints"][seg_id]
        d = segs[:, 1] - segs[:, 0]
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        pred = HairEvalData(points=segs[:, 0], directions=d,
                            points_id_to_strand_id=info.id_to_strand_id[seg_id[:, 0]],
                            edges=None)
        m, thr, table = compute_metrics(pred=pred, gt=gt, bidirectional=True,
                                        return_table=True)
        print(f"\n=== opacity th={th}  kept={int(keep.sum())}/{n} ===")
        print(table)


if __name__ == "__main__":
    main()
