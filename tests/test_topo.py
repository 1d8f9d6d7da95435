import dataclasses
import numpy as np
import pytest

from hairgs_tpu.config import OptimizationConfig
from hairgs_tpu.models.hair import HairModel
from hairgs_tpu.models.gaussian import GaussianModel
from hairgs_tpu.topo.strands import (
    compute_strands_info,
    update_strand_root,
    smooth_pair_indices,
    _walk_strands_np,
)
from hairgs_tpu.topo.graph_ops import (
    HairHostState,
    hair_densification,
    hair_merging,
    hair_growing,
    hair_reset_opacity,
)
from hairgs_tpu.topo.merge import compute_endpoint_pair_to_merge, stage2_merge_loop


def inv_sig(x):
    return float(np.log(x / (1 - x)))


def make_hair_model(endpoints, pairs, opacity=0.5, mask=0.9, width=1e-4,
                    ref_root=None, cfg=None):
    ns = pairs.shape[0]
    m = HairModel(sh_degree=0, capacity_round=64)
    seg = dict(
        features_dc=np.zeros((ns, 1, 3), np.float32),
        features_rest=np.zeros((ns, 0, 3), np.float32),
        opacity=np.full((ns, 1), inv_sig(opacity), np.float32),
        mask=np.full((ns, 1), inv_sig(mask), np.float32),
        width=np.full((ns, 1), np.log(width), np.float32),
    )
    m.install(np.asarray(endpoints, np.float32), np.asarray(pairs, np.int64), seg)
    m.ref_strand_root = (
        np.asarray(ref_root, np.float32) if ref_root is not None
        else np.asarray([[0.0, 0.0, 0.0]], np.float32)
    )
    update_strand_root(m)
    m.training_setup(cfg or OptimizationConfig())
    compute_strands_info(m)
    return m


def two_strands():
    """Strand A: (0,0,0)-(0.01,0,0)-(0.02,0,0); strand B colinear further out."""
    eps = np.asarray(
        [
            [0, 0, 0], [0.01, 0, 0], [0.02, 0, 0],
            [0.021, 0, 0], [0.031, 0, 0], [0.041, 0, 0],
        ],
        np.float32,
    )
    pairs = np.asarray([[0, 1], [1, 2], [3, 4], [4, 5]], np.int64)
    return eps, pairs


class TestStrandsInfo:
    def test_basic_walk(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        info = m.strands_info
        assert len(info.list_strands) == 2
        # both strands oriented with the end nearest the origin first
        s0 = info.list_strands[0]
        np.testing.assert_array_equal(s0, [[0, 1], [1, 2]])
        s1 = info.list_strands[1]
        np.testing.assert_array_equal(s1, [[3, 4], [4, 5]])
        assert info.strand_endpoint_id_to_complementary[0] == 2
        assert info.strand_endpoint_id_to_complementary[2] == 0

    def test_flip_by_root_distance(self):
        eps, pairs = two_strands()
        # reference root near the FAR end -> strands flipped
        m = make_hair_model(eps, pairs, ref_root=[[0.1, 0, 0]])
        s0 = m.strands_info.list_strands[0]
        np.testing.assert_array_equal(s0, [[2, 1], [1, 0]])

    def test_background_excluded(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs, mask=0.1)  # below FG_BIN_TH
        info = compute_strands_info(m, only_foreground=True)
        assert len(info.list_strands) == 0

    def test_smooth_pairs(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        sp, valid = smooth_pair_indices(m.strands_info)
        assert valid.sum() == 2  # one consecutive pair per strand
        np.testing.assert_array_equal(sp[0], [[0, 1], [1, 2]])

    def test_update_strand_root(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs, ref_root=[[0, 0, 0]])
        assert 0 in m.strand_root_endpoint_idx


class TestMerge:
    def test_candidates_found_colinear(self):
        eps, pairs = two_strands()
        cfg = OptimizationConfig()
        m = make_hair_model(eps, pairs, cfg=cfg)
        # tip of A (id 2) and root of B (id 3) are 1mm apart, directions
        # anti-aligned -> mergeable
        cand = compute_endpoint_pair_to_merge(m)
        assert cand.shape[0] == 1
        assert set(cand[0].tolist()) == {2, 3}

    def test_no_candidates_when_far(self):
        eps, pairs = two_strands()
        eps = eps.copy()
        eps[3:] += np.asarray([0.1, 0, 0])  # move strand B far away
        m = make_hair_model(eps, pairs)
        assert compute_endpoint_pair_to_merge(m).shape[0] == 0

    def test_no_candidates_when_misaligned(self):
        eps, pairs = two_strands()
        eps = eps.copy()
        # strand B perpendicular: bends 90deg relative to A
        eps[4] = [0.021, 0.01, 0]
        eps[5] = [0.021, 0.02, 0]
        m = make_hair_model(eps, pairs)
        assert compute_endpoint_pair_to_merge(m).shape[0] == 0

    def test_merge_joins_strands(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        n = hair_merging(m)
        assert n == 1
        info = m.strands_info
        assert len(info.list_strands) == 1
        assert info.list_strands[0].shape[0] == 4  # 4 segments after weld
        # merged joint at midpoint of old ids 2,3
        arrays = m.host_arrays()
        dists = np.linalg.norm(arrays["endpoints"] - np.asarray([0.0205, 0, 0]), axis=1)
        assert dists.min() < 1e-6

    def test_stage2_loop_converges(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        iters = stage2_merge_loop(m, max_iterations=100)
        assert iters >= 1
        assert compute_endpoint_pair_to_merge(m).shape[0] == 0


class TestDensification:
    def test_split_long_segment(self):
        # one very long segment (longer than max_segment_length)
        eps = np.asarray([[0, 0, 0], [1.0, 0, 0]], np.float32)
        pairs = np.asarray([[0, 1]], np.int64)
        m = make_hair_model(eps, pairs)
        assert m.max_segment_length < 1.0
        info = hair_densification(m, extent=1.0, max_screen_size=None)
        assert info["split"] == 1
        assert m.num_segments == 2
        arrays = m.host_arrays()
        # midpoint inserted
        mid = np.linalg.norm(arrays["endpoints"] - np.asarray([0.5, 0, 0]), axis=1)
        assert mid.min() < 1e-6
        # still one connected strand
        assert len(m.strands_info.list_strands) == 1

    def test_prune_transparent(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs, opacity=0.001)  # below opacity_th
        info = hair_densification(m, extent=1.0, max_screen_size=None)
        assert info["prune_total"] > 0

    def test_weld_collapsed(self):
        # middle segment collapsed to a point between two good segments
        eps = np.asarray(
            [[0, 0, 0], [0.01, 0, 0], [0.01, 0, 0], [0.02, 0, 0]], np.float32
        )
        pairs = np.asarray([[0, 1], [1, 2], [2, 3]], np.int64)
        # num_points_strand=1 keeps max_segment_length above the segment
        # lengths so the split strategy stays quiet in this test
        cfg = dataclasses.replace(OptimizationConfig(), num_points_strand=1)
        m = make_hair_model(eps, pairs, cfg=cfg)
        info = hair_densification(m, extent=1.0, max_screen_size=None)
        assert info["merge_collapsed"] == 1
        assert m.num_segments == 2
        assert len(m.strands_info.list_strands) == 1

    def test_reset_opacity(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs, opacity=0.7)
        hair_reset_opacity(m)
        st = HairHostState(m)
        np.testing.assert_allclose(st.opacity_act(), 0.01, rtol=1e-4)


class TestNativeMerge:
    def test_native_candidates_match_scipy(self):
        pytest.importorskip("hairgs_tpu.native")
        from scipy.spatial import cKDTree

        from hairgs_tpu.native import greedy_complementary_filter, merge_candidates

        rng = np.random.default_rng(0)
        for trial in range(8):
            m = int(rng.integers(5, 300))
            pts = rng.uniform(-0.1, 0.1, (m, 3)).astype(np.float32)
            d = rng.normal(size=(m, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            tips = rng.permutation(m * 3)[:m].astype(np.int64)
            comp_full = np.full(3 * m, -1, np.int64)
            perm = rng.permutation(m)
            for i in range(0, m - 1, 2):
                a, b = tips[perm[i]], tips[perm[i + 1]]
                comp_full[a] = b
                comp_full[b] = a
            dist_th, dir_th = 0.02, float(np.cos(np.deg2rad(30)))
            p1, p2, dist = merge_candidates(
                pts, d, dist_th, dir_th, False, tips, comp_full[tips]
            )
            tree = cKDTree(pts)
            nls = tree.query_ball_point(pts, r=dist_th, return_sorted=True)
            rp1, rp2 = [], []
            for i in range(m):
                nn = np.asarray(nls[i])
                gid = tips[i]
                keep = (tips[nn] != comp_full[gid]) & (tips[nn] != gid)
                nn = nn[keep]
                if nn.size == 0:
                    continue
                dots = d[nn] @ (-d[i])
                for j in nn[dots >= dir_th]:
                    rp1.append(gid)
                    rp2.append(tips[j])
            assert np.array_equal(p1, np.asarray(rp1, np.int64)), trial
            assert np.array_equal(p2, np.asarray(rp2, np.int64)), trial

    def test_greedy_filter_matches_python(self):
        pytest.importorskip("hairgs_tpu.native")
        from hairgs_tpu.native import greedy_complementary_filter

        rng = np.random.default_rng(1)
        for trial in range(6):
            k, e = int(rng.integers(1, 150)), 400
            pairs = rng.integers(0, e, (k, 2)).astype(np.int64)
            comp = rng.integers(0, e, e).astype(np.int64)
            got = greedy_complementary_filter(pairs, comp)
            disabled = np.zeros(e + 1, bool)
            want = np.ones(k, bool)
            for i in range(k):
                a, b = pairs[i]
                if disabled[a] or disabled[b]:
                    want[i] = False
                else:
                    disabled[comp[a]] = True
                    disabled[comp[b]] = True
            assert np.array_equal(got, want), trial


class TestGrowing:
    def test_tip_extension(self):
        eps, pairs = two_strands()
        cfg = OptimizationConfig()
        m = make_hair_model(eps, pairs, cfg=cfg)
        before = m.num_segments
        grown = hair_growing(m, growth_length=0.002)
        assert grown == 2  # both strands below num_points_strand
        assert m.num_segments == before + 2
        # new tip of strand A extends along +x from (0.02,0,0)
        arrays = m.host_arrays()
        d = np.linalg.norm(arrays["endpoints"] - np.asarray([0.022, 0, 0]), axis=1)
        assert d.min() < 1e-6


class TestConversion:
    def test_gaussian_to_hair(self):
        rng = np.random.default_rng(0)
        n = 20
        pts = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
        colors = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
        g = GaussianModel(sh_degree=0, capacity_round=64)
        g.create_from_pcd(pts, colors)
        g.training_setup(OptimizationConfig())
        hair = g.to_hair_model(ref_strand_root=np.asarray([[0, 0, 0]], np.float32))
        assert hair.num_segments == n
        assert hair.num_endpoints == 2 * n
        arrays = hair.host_arrays()
        # each segment is disconnected: [(i, i+n)]
        np.testing.assert_array_equal(
            arrays["endpoint_pairs"],
            np.stack([np.arange(n), np.arange(n) + n], axis=1),
        )
        # endpoint midpoint equals original center
        mids = arrays["endpoints"][arrays["endpoint_pairs"]].mean(axis=1)
        np.testing.assert_allclose(mids, pts, atol=1e-5)
        # derived segment length maps back to the principal scale via pval
        seg_len = np.linalg.norm(
            arrays["endpoints"][arrays["endpoint_pairs"][:, 1]]
            - arrays["endpoints"][arrays["endpoint_pairs"][:, 0]],
            axis=1,
        )
        scale_max = np.exp(np.asarray(g.params.scaling)[:n]).max(axis=1)
        np.testing.assert_allclose(
            seg_len, 2 * scale_max / g.dist_to_scale_factor, rtol=1e-4
        )

    def test_hair_ply_roundtrip_preserves_strands(self, tmp_path):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        p = str(tmp_path / "h.ply")
        m.save_ply(p)
        m2 = HairModel(sh_degree=0, capacity_round=64)
        m2.load_ply(p)
        assert m2.num_segments == m.num_segments
        assert len(m2.strands_info.list_strands) == 2
        a1 = m.host_arrays()
        a2 = m2.host_arrays()
        np.testing.assert_allclose(a1["endpoints"], a2["endpoints"])
        np.testing.assert_array_equal(a1["endpoint_pairs"], a2["endpoint_pairs"])


class TestMomentCarryMaps:
    """The topology surgery keeps Adam moments on device and routes them
    through gather-or-zero index maps (device->host is ~1 MB/s on the remote
    runtime). These tests pin the carry semantics: surviving rows keep their
    exact moment values, new rows start at zero, zeroed planes zero."""

    def _stamp_moments(self, model):
        import jax.numpy as jnp

        def stamp(tree, base):
            d = tree._asdict()
            out = {}
            for k, v in d.items():
                r = jnp.arange(v.shape[0], dtype=jnp.float32) + base
                out[k] = jnp.broadcast_to(
                    r.reshape((-1,) + (1,) * (v.ndim - 1)), v.shape
                ).astype(v.dtype)
            return type(tree)(**out)

        model.opt_state = model.opt_state._replace(
            mu=stamp(model.opt_state.mu, 1.0),
            nu=stamp(model.opt_state.nu, 1000.0),
        )

    def test_gaussian_prune_carries_rows(self):
        from hairgs_tpu.models.gaussian import GaussianModel

        rng = np.random.default_rng(0)
        n = 12
        pts = rng.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
        m = GaussianModel(sh_degree=0, capacity_round=16)
        m.create_from_pcd(pts, rng.uniform(0, 1, (n, 3)).astype(np.float32))
        m.training_setup(OptimizationConfig())
        # drop opacity of rows 3 and 7 below the prune threshold
        arrays = m.host_arrays()
        arrays["opacity"][[3, 7]] = -20.0
        m._install(arrays, n, moments=m.host_moments(),
                   step=int(m.opt_state.step))
        self._stamp_moments(m)
        mu_before = np.asarray(m.opt_state.mu.xyz)[:n].copy()
        m.densification(extent=1.0, max_screen_size=None)
        keep = np.setdiff1d(np.arange(n), [3, 7])
        mu_after = np.asarray(m.opt_state.mu.xyz)[: m.count]
        np.testing.assert_allclose(mu_after[: len(keep)], mu_before[keep])
        # rows appended by clone/split (if any) must be zero
        np.testing.assert_allclose(mu_after[len(keep):], 0.0)

    def test_gaussian_reset_opacity_zeroes_one_plane(self):
        from hairgs_tpu.models.gaussian import GaussianModel

        rng = np.random.default_rng(1)
        n = 8
        pts = rng.uniform(-0.05, 0.05, (n, 3)).astype(np.float32)
        m = GaussianModel(sh_degree=0, capacity_round=16)
        m.create_from_pcd(pts, rng.uniform(0, 1, (n, 3)).astype(np.float32))
        m.training_setup(OptimizationConfig())
        self._stamp_moments(m)
        mu_xyz = np.asarray(m.opt_state.mu.xyz)[:n].copy()
        m.reset_opacity()
        np.testing.assert_allclose(np.asarray(m.opt_state.mu.opacity), 0.0)
        np.testing.assert_allclose(np.asarray(m.opt_state.nu.opacity), 0.0)
        np.testing.assert_allclose(np.asarray(m.opt_state.mu.xyz)[:n], mu_xyz)

    def test_hair_merge_carries_segment_rows(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        self._stamp_moments(m)
        mu_w_before = np.asarray(m.opt_state.mu.width)[: m.num_segments].copy()
        merged = hair_merging(m)
        assert merged > 0
        ns = m.num_segments
        mu_w = np.asarray(m.opt_state.mu.width)[:ns]
        # the merge cats re-linked copies of the touched segments (zero
        # moments) and prunes the originals; untouched segments keep theirs.
        # two_strands merges tips of segment rows 1 and 2 -> rows 0,3 stay.
        np.testing.assert_allclose(mu_w[0], mu_w_before[0])
        np.testing.assert_allclose(mu_w[1], mu_w_before[3])
        np.testing.assert_allclose(mu_w[2:], 0.0)

    def test_hair_reset_opacity_plane(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        self._stamp_moments(m)
        mu_e = np.asarray(m.opt_state.mu.endpoints)[: m.num_endpoints].copy()
        from hairgs_tpu.topo.graph_ops import hair_reset_opacity

        hair_reset_opacity(m)
        np.testing.assert_allclose(np.asarray(m.opt_state.mu.opacity), 0.0)
        np.testing.assert_allclose(
            np.asarray(m.opt_state.mu.endpoints)[: m.num_endpoints], mu_e)


class TestAsyncTopology:
    """Background topology events (topo/async_events.py, opt-in via
    --async_topology). Pins the two semantics that make the overlap safe:
    with no training between launch and poll the result is IDENTICAL to the
    synchronous path, and with training in between surviving rows keep their
    LIVE device values while new rows come from the snapshot."""

    def _worker(self, m):
        from hairgs_tpu.topo.async_events import TopologyWorker

        return TopologyWorker(m)

    def _state(self, m):
        arr = m.host_arrays()
        return arr, [s.copy() for s in m.strands_info.list_strands]

    def test_idle_matches_sync_merge(self):
        eps, pairs = two_strands()
        m_sync = make_hair_model(eps, pairs)
        m_async = make_hair_model(eps, pairs)

        info, arrays = hair_densification(
            m_sync, extent=1.0, max_screen_size=None, return_arrays=True)
        hair_merging(m_sync, arrays=arrays)

        w = self._worker(m_async)
        w.launch(densify=True, merge=True, extent=1.0, size_th=None)
        assert w.poll(force=True)
        assert not w.in_flight

        a_s, strands_s = self._state(m_sync)
        a_a, strands_a = self._state(m_async)
        assert len(strands_s) == len(strands_a) == 1
        np.testing.assert_array_equal(strands_s[0], strands_a[0])
        for k in a_s:
            np.testing.assert_allclose(a_a[k], a_s[k], err_msg=k)

    def test_idle_matches_sync_split(self):
        eps = np.asarray([[0, 0, 0], [1.0, 0, 0]], np.float32)
        pairs = np.asarray([[0, 1]], np.int64)
        m_sync = make_hair_model(eps, pairs)
        m_async = make_hair_model(eps, pairs)

        hair_densification(m_sync, extent=1.0, max_screen_size=None)
        assert m_sync.num_segments == 2

        w = self._worker(m_async)
        w.launch(densify=True, merge=False, extent=1.0, size_th=None)
        assert w.poll(force=True)

        a_s, _ = self._state(m_sync)
        a_a, _ = self._state(m_async)
        for k in a_s:
            np.testing.assert_allclose(a_a[k], a_s[k], err_msg=k)

    def test_survivors_keep_live_values(self):
        import jax.numpy as jnp

        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        w = self._worker(m)
        w.launch(densify=False, merge=True, extent=1.0, size_th=None)

        # "train" while the flight is out: bump a feature plane and an
        # endpoint on device (the snapshot must not see this)
        ns, ne = m.num_segments, m.num_endpoints
        m.params = m.params._replace(
            features_dc=m.params.features_dc + 1.0,
            endpoints=m.params.endpoints.at[0, 0].add(5e-4),
        )
        assert w.poll(force=True)

        arr = m.host_arrays()
        # two_strands merge prunes segment rows 1,2 and cats re-linked
        # copies: surviving rows 0,3 land at 0,1 with LIVE (bumped) features;
        # the cat'ed copies keep snapshot values (documented deviation)
        np.testing.assert_allclose(arr["features_dc"][:2], 1.0)
        np.testing.assert_allclose(arr["features_dc"][2:], 0.0)
        # endpoint 0 survives the merge; its live nudge must be kept
        d = np.linalg.norm(arr["endpoints"] - np.asarray([5e-4, 0, 0]), axis=1)
        assert d.min() < 1e-7
        # the merged joint is a NEW row: midpoint of SNAPSHOT ids 2,3
        d = np.linalg.norm(arr["endpoints"] - np.asarray([0.0205, 0, 0]), axis=1)
        assert d.min() < 1e-6

    def test_moments_carry_through_async(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        TestMomentCarryMaps._stamp_moments(TestMomentCarryMaps(), m)
        mu_w_before = np.asarray(m.opt_state.mu.width)[: m.num_segments].copy()

        w = self._worker(m)
        w.launch(densify=False, merge=True, extent=1.0, size_th=None)
        assert w.poll(force=True)

        mu_w = np.asarray(m.opt_state.mu.width)[: m.num_segments]
        np.testing.assert_allclose(mu_w[0], mu_w_before[0])
        np.testing.assert_allclose(mu_w[1], mu_w_before[3])
        np.testing.assert_allclose(mu_w[2:], 0.0)

    def test_worker_error_surfaces_in_poll(self):
        eps, pairs = two_strands()
        m = make_hair_model(eps, pairs)
        m.ref_strand_root = None  # poisons compute_strands_info in the flight
        w = self._worker(m)
        w.launch(densify=True, merge=False, extent=1.0, size_th=None)
        with pytest.raises(RuntimeError, match="async topology"):
            w.poll(force=True)
        assert not w.in_flight
