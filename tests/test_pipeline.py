"""End-to-end three-stage pipeline smoke test on a tiny synthetic scene.

Mirrors run_full_pipeline_single.sh: dataset prep -> Stage I (train) ->
Stage II (merge) -> Stage III (train, resumed from the hair PLY) -> eval.
"""

import dataclasses
import os
from argparse import Namespace

import numpy as np
import pytest

from hairgs_tpu.config import GeneralConfig, ModelConfig, OptimizationConfig, RuntimeConfig
from hairgs_tpu.data.synthetic import generate_dataset, synthetic_test_hair
from hairgs_tpu.render.renderer import RasterConfig


SMALL_RASTER = dict(max_tiles_per_gaussian=8, max_pairs_per_tile=128,
                    composite_chunk=16)


def small_opt(iterations):
    return dataclasses.replace(
        OptimizationConfig(),
        iterations=iterations,
        position_lr_max_steps=iterations,
        densify_from_iter=10,
        densify_until_iter=int(iterations * 0.9),
        densification_interval=20,
        opacity_reset_interval=10 * iterations,  # off
        merge_interval=10,
    )


def make_args(source, model_path, opt, extra=None):
    ns = dict(
        source_path=source, model_path=model_path, images="images",
        sh_degree=0, resolution=-1, data_device="cpu", eval=False,
        quiet=True, logger="none", ip="", port=0, vis2d=False,
        update_vis2d_frequency=10**9, vis3d=False,
        save_frequency=opt.iterations, eval_frequency=opt.iterations,
        view_batch=1, mesh_max_devices=0, capacity_round=256,
        **SMALL_RASTER,
    )
    for f in dataclasses.fields(OptimizationConfig):
        ns[f.name] = getattr(opt, f.name)
    if extra:
        ns.update(extra)
    return Namespace(**ns)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    hair = synthetic_test_hair(num_strands=20, points_per_strand=8, seed=1)
    out = generate_dataset(
        str(root / "data"), hair, num_cameras=6, width=64, height=64,
        cam_z=0.35, init_points="gt_hair_verts", init_subsample=3,
        raster_cfg=RasterConfig(max_tiles_per_gaussian=8, max_pairs_per_tile=128,
                                chunk=16),
    )
    return out


class TestDatasetGeneration:
    def test_layout(self, dataset):
        for p in [
            "images/image_1.png", "masks/image_1.png",
            "orientations/image_1_orientation.png",
            "orientations/image_1_confidence.png",
            "sparse/0/cameras.bin", "sparse/0/images.bin", "sparse/0/points3D.bin",
            "hair_eval_data.npz", "head_reconstruction_data.npz",
        ]:
            assert os.path.exists(os.path.join(dataset, p)), p

    def test_images_have_content(self, dataset):
        from PIL import Image

        img = np.asarray(Image.open(os.path.join(dataset, "images/image_1.png")))
        assert img.max() > 30  # strands visible
        mask = np.asarray(Image.open(os.path.join(dataset, "masks/image_1.png")))
        assert 0 < (mask > 0).mean() < 0.9


class TestGaussShardCLI:
    def test_train_driver_runs_slab_sharded(self, dataset, tmp_path):
        """--gauss_shard wiring through training(): 2D (data x gauss) mesh,
        batched cameras, checkpoint written."""
        from train import training

        model_path = str(tmp_path / "gs_run")
        opt = small_opt(20)
        args = make_args(dataset, model_path, opt,
                         extra={"gauss_shard": 4, "view_batch": 2})
        mp = ModelConfig(source_path=dataset, model_path=model_path,
                         sh_degree=0)
        gp = GeneralConfig(quiet=True, logger="none",
                           save_frequency=20, eval_frequency=20)
        rt = RuntimeConfig(capacity_round=256, max_tiles_per_gaussian=8,
                           max_pairs_per_tile=128, composite_chunk=16,
                           gauss_shard=4, view_batch=2)
        scene, model = training(mp, opt, gp, rt, args)
        assert model.count > 0
        assert os.path.exists(os.path.join(
            model_path, "point_cloud", "iteration_20", "point_cloud.ply"))


class TestFullPipeline:
    def test_three_stages(self, dataset, tmp_path):
        from train import training
        from hairgs_tpu.models.hair import HairModel
        from hairgs_tpu.scene import Scene
        from hairgs_tpu.topo.merge import stage2_merge_loop
        from hairgs_tpu.evaluation.eval_data import compute_eval_data_from_hair
        from hairgs_tpu.evaluation.metrics import compute_metrics

        model_path = str(tmp_path / "run")

        # ---- Stage I
        opt = small_opt(60)
        args = make_args(dataset, model_path, opt)
        mp = ModelConfig(source_path=dataset, model_path=model_path, sh_degree=0)
        gp = GeneralConfig(quiet=True, logger="none",
                           save_frequency=60, eval_frequency=60)
        rt = RuntimeConfig(capacity_round=256, max_tiles_per_gaussian=8,
                           max_pairs_per_tile=128, composite_chunk=16)
        scene, model = training(mp, opt, gp, rt, args)
        ply1 = os.path.join(model_path, "point_cloud", "iteration_60",
                            "point_cloud.ply")
        assert os.path.exists(ply1)
        assert model.count > 0

        # ---- Stage II (resume from the Stage-I checkpoint)
        scene2 = Scene(args, shuffle=False, capacity_round=256)
        g = scene2.gaussians
        g.training_setup(opt)
        assert not isinstance(g, HairModel)
        hair = g.to_hair_model(scene2.head_reconstruction.scalp_verts)
        hair.training_setup(opt)
        n_before = len(hair.strands_info.list_strands)
        stage2_merge_loop(hair, max_iterations=50)
        n_after = len(hair.strands_info.list_strands)
        assert n_after <= n_before
        scene2.gaussians = hair
        ply2 = scene2.save(1)
        assert os.path.exists(ply2)

        # ---- Stage III (resume: scene auto-dispatches to HairModel)
        opt3 = small_opt(30)
        args3 = make_args(dataset, model_path, opt3)
        gp3 = GeneralConfig(quiet=True, logger="none",
                            save_frequency=30, eval_frequency=30)
        scene3, model3 = training(mp, opt3, gp3, rt, args3)
        assert isinstance(model3, HairModel)
        assert model3.num_segments > 0

        # ---- Offline render sets (render.py driver; reference layout
        # model_path/render/train/iteration_N/{renders,gt}/<type_name>/)
        from render import TYPE_MAP, render_sets

        args_r = make_args(dataset, model_path, opt3, extra={"type": -1})
        render_sets(args_r)
        base = os.path.join(model_path, "render", "train",
                            f"iteration_{scene3.loaded_iter + 30}")
        for type_name in ("rgb", "rgb_foreground", "mask_foreground",
                          "mask_other", "orientation_map"):
            for kind in ("renders", "gt"):
                d = os.path.join(base, kind, type_name)
                assert os.path.isdir(d) and len(os.listdir(d)) > 0, d
        assert set(TYPE_MAP.values()) == {
            "all", "rgb", "rgb_foreground", "mask_foreground", "mask_other",
            "orientation_map"}

        # ---- Eval
        pred = compute_eval_data_from_hair(model3)
        gt = scene3.gt
        assert gt is not None
        metrics, ths = compute_metrics(pred=pred, gt=gt, bidirectional=True)
        assert set(metrics) == {"precision(b)", "recall(b)", "f1(b)",
                                "strand_consistency(b)"}
        assert len(ths) == 4
        for v in metrics.values():
            assert np.all(np.isfinite(v)) and np.all(v >= 0) and np.all(v <= 1)
        # NOTE: no quality bar here — at 64px one pixel covers ~11mm, far
        # coarser than the 2-4mm metric thresholds; quality is validated by
        # the benchmark at realistic resolution on TPU.


class TestViewBatchDriver:
    """Driver-path view-batch DP (SURVEY §2.3): `--view_batch K` must train
    with the camera minibatch actually device-split over the mesh."""

    def test_view_batch_trains_sharded(self, dataset, tmp_path, monkeypatch):
        import hairgs_tpu.parallel.mesh as pm
        from train import training

        recorded = []
        orig = pm.shard_view_batch

        def spy(batch, mesh, axis_name="data"):
            out = orig(batch, mesh, axis_name)
            recorded.append(
                (out.image.sharding.num_devices,
                 out.image.sharding.shard_shape(out.image.shape)[0])
            )
            return out

        monkeypatch.setattr(pm, "shard_view_batch", spy)

        model_path = str(tmp_path / "run_vb")
        opt = small_opt(16)
        args = make_args(dataset, model_path, opt, extra={"view_batch": 4})
        mp = ModelConfig(source_path=dataset, model_path=model_path, sh_degree=0)
        gp = GeneralConfig(quiet=True, logger="none",
                           save_frequency=16, eval_frequency=16)
        rt = RuntimeConfig(capacity_round=256, max_tiles_per_gaussian=8,
                           max_pairs_per_tile=128, composite_chunk=16,
                           view_batch=4)
        scene, model = training(mp, opt, gp, rt, args)
        # 16 iterations / 4 views per step = 4 sharded steps
        assert len(recorded) == 4
        # 4 views split over a 4-device mesh: one view per device
        assert all(r == (4, 1) for r in recorded)
        assert os.path.exists(os.path.join(
            model_path, "point_cloud", "iteration_16", "point_cloud.ply"))


class TestAsyncTopologyDriver:
    """--async_topology through training(): densify/merge events compute on
    the worker thread and install between steps; reset/growth cadences stay
    synchronous and force-settle flights (train.py async branch)."""

    def test_stage3_trains_async(self, dataset, tmp_path):
        from train import training
        from hairgs_tpu.models.hair import HairModel
        from hairgs_tpu.scene import Scene

        model_path = str(tmp_path / "run")
        opt = small_opt(20)
        args = make_args(dataset, model_path, opt)
        mp = ModelConfig(source_path=dataset, model_path=model_path,
                         sh_degree=0)
        gp = GeneralConfig(quiet=True, logger="none",
                           save_frequency=20, eval_frequency=20)
        rt = RuntimeConfig(capacity_round=256, max_tiles_per_gaussian=8,
                           max_pairs_per_tile=128, composite_chunk=16)
        training(mp, opt, gp, rt, args)

        scene2 = Scene(args, shuffle=False, capacity_round=256)
        g = scene2.gaussians
        g.training_setup(opt)
        hair = g.to_hair_model(scene2.head_reconstruction.scalp_verts)
        hair.training_setup(opt)
        scene2.gaussians = hair
        scene2.save(1)

        # Stage III with async topology: 40 iters crosses the merge cadence
        # 4x and densification 2x; growth (sync, force-settles) also fires
        opt3 = dataclasses.replace(small_opt(40), growth_interval=25)
        args3 = make_args(dataset, model_path, opt3,
                          extra={"async_topology": True})
        gp3 = GeneralConfig(quiet=True, logger="none",
                            save_frequency=40, eval_frequency=40)
        rt3 = dataclasses.replace(rt, async_topology=True)
        scene3, model3 = training(mp, opt3, gp3, rt3, args3)
        assert isinstance(model3, HairModel)
        assert model3.num_segments > 0
        assert model3.strands_info is not None
        # the topology stayed a consistent graph (every active pair indexes
        # a live endpoint)
        arr = model3.host_arrays(keys=("endpoint_pairs",))
        assert arr["endpoint_pairs"].max() < model3.num_endpoints

        # ---- async topology COMBINED with the 2D (data x gauss) mesh
        # (VERDICT r3 #8: the --gauss_shard + --async_topology combination):
        # resume the same run for 20 more iters with the slab train step,
        # crossing the merge cadence while events install into slab-sharded
        # arenas.
        opt4 = dataclasses.replace(small_opt(60), growth_interval=55)
        args4 = make_args(dataset, model_path, opt4,
                          extra={"async_topology": True, "gauss_shard": 2,
                                 "view_batch": 2})
        gp4 = GeneralConfig(quiet=True, logger="none",
                            save_frequency=60, eval_frequency=60)
        rt4 = dataclasses.replace(rt, async_topology=True, gauss_shard=2,
                                  view_batch=2)
        scene4, model4 = training(mp, opt4, gp4, rt4, args4)
        assert isinstance(model4, HairModel)
        assert model4.num_segments > 0
        arr4 = model4.host_arrays(keys=("endpoint_pairs",))
        assert arr4["endpoint_pairs"].max() < model4.num_endpoints
        # iteration numbering is cumulative across resumed legs: the end
        # save lands at loaded_iter + opt4.iterations
        assert os.path.exists(os.path.join(
            model_path, "point_cloud",
            f"iteration_{scene4.loaded_iter + 60}", "point_cloud.ply"))


class TestLambertLighting:
    """use_lighting parity surface (reference OpenGLRenderer.py:52-61 +
    parse_usc_hairsalon.py:159-162): kNN-PCA normals and the flag-gated
    Lambert term on segment colors."""

    def test_pca_normals_on_a_plane(self):
        # points sampled on z=0 must get +-z normals, unit length
        from hairgs_tpu.ops.knn import estimate_pointcloud_normals

        rng = np.random.default_rng(0)
        pts = np.zeros((200, 3), np.float32)
        pts[:, :2] = rng.uniform(-1, 1, (200, 2))
        n = np.asarray(estimate_pointcloud_normals(pts, k=16))
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
        assert np.all(np.abs(n[:, 2]) > 0.99)

    def test_lambert_darkens_within_bounds(self):
        # ka=kd=0.5 white lights: lit colors = flat * f with f in [0.5, 1.0]
        from hairgs_tpu.data.synthetic import (
            strand_segments_to_gaussians,
            synthetic_test_hair,
        )

        hair = synthetic_test_hair(num_strands=10, points_per_strand=6, seed=3)
        flat = strand_segments_to_gaussians(hair)
        lit = strand_segments_to_gaussians(hair, use_lighting=True)
        f = lit["colors"] / np.maximum(flat["colors"], 1e-9)
        assert f.min() >= 0.5 - 1e-5 and f.max() <= 1.0 + 1e-5
        # per-segment factor is shared across channels
        np.testing.assert_allclose(f[:, 0], f[:, 1], atol=1e-5)
        # and the scene is actually shaded, not uniformly scaled
        assert f[:, 0].std() > 1e-3
        # geometry untouched
        np.testing.assert_array_equal(flat["means3d"], lit["means3d"])

    def test_generate_dataset_lit_images_differ(self, dataset, tmp_path):
        from PIL import Image

        from hairgs_tpu.data.synthetic import (
            generate_dataset,
            synthetic_test_hair,
        )

        hair = synthetic_test_hair(num_strands=20, points_per_strand=8, seed=1)
        out = str(tmp_path / "lit")
        # identical geometry/camera/raster setup to the module fixture so
        # only the lighting differs
        generate_dataset(out, hair, num_cameras=2, width=64, height=64,
                         cam_z=0.35, init_points="gt_hair_verts",
                         init_subsample=3,
                         raster_cfg=RasterConfig(max_tiles_per_gaussian=8,
                                                 max_pairs_per_tile=128,
                                                 chunk=16),
                         use_lighting=True)
        a = np.asarray(Image.open(os.path.join(dataset, "images", "image_1.png")),
                       np.float32)
        b = np.asarray(Image.open(os.path.join(out, "images", "image_1.png")),
                       np.float32)
        # same coverage, darker hair pixels
        am = np.asarray(Image.open(os.path.join(dataset, "masks", "image_1.png")))
        bm = np.asarray(Image.open(os.path.join(out, "masks", "image_1.png")))
        np.testing.assert_array_equal(am, bm)
        assert b.sum() < a.sum()
        assert np.any(a != b)
