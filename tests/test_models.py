"""Model-forward shape/contract tests (the reference has none; these guard
the dict-of-tensors contract that losses/metrics/engines key off)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.models import create_model


def _init_and_apply(model, x, train=False, **kwargs):
    rngs = {"params": jax.random.key(0), "points": jax.random.key(1),
            "dropout": jax.random.key(2)}
    variables = model.init(rngs, x, train=train, **kwargs)
    out = model.apply(
        variables, x, train=train,
        rngs={"points": jax.random.key(3), "dropout": jax.random.key(4)},
        mutable=["batch_stats"] if train else False,
        **kwargs)
    if train:
        out = out[0]
    return variables, out


class TestPanopticDeepLab:
    def test_forward_shapes(self):
        model = create_model("PanopticDeepLab", encoder="resnet18",
                             num_classes=3)
        x = jnp.zeros((1, 64, 64, 1))
        _, out = _init_and_apply(model, x)
        assert out["sem_logits"].shape == (1, 64, 64, 3)
        assert out["ctr_hmp"].shape == (1, 64, 64, 1)
        assert out["offsets"].shape == (1, 64, 64, 2)

    def test_ins_decoder(self):
        model = create_model("PanopticDeepLab", encoder="resnet18",
                             num_classes=1, ins_decoder=True)
        x = jnp.zeros((1, 64, 64, 1))
        variables, out = _init_and_apply(model, x)
        assert out["sem_logits"].shape == (1, 64, 64, 1)
        assert "instance_decoder" in str(jax.tree_util.tree_structure(
            variables["params"])) or "instance_decoder" in variables["params"]


class TestPanopticDeepLabPR:
    def test_train_outputs(self):
        model = create_model("PanopticDeepLabPR", encoder="resnet18",
                             num_classes=1, train_num_points=64)
        x = jnp.zeros((2, 64, 64, 1))
        _, out = _init_and_apply(model, x, train=True)
        assert out["sem_logits"].shape == (2, 64, 64, 1)
        assert out["sem_points"].shape == (2, 64, 1)
        assert out["point_coords"].shape == (2, 64, 2)

    def test_eval_render(self):
        model = create_model("PanopticDeepLabPR", encoder="resnet18",
                             num_classes=1, subdivision_num_points=128)
        x = jnp.zeros((1, 64, 64, 1))
        variables, _ = _init_and_apply(model, x, train=True)
        out = model.apply(variables if "batch_stats" in variables else variables,
                          x, train=False, render_steps=2,
                          interpolate_ins=False)
        # 2 render steps: 1/4 res -> full res sem; ins heads stay at 1/4
        assert out["sem_logits"].shape == (1, 64, 64, 1)
        assert out["ctr_hmp"].shape == (1, 16, 16, 1)
        assert out["offsets"].shape == (1, 16, 16, 2)


@pytest.mark.slow
class TestPanopticBiFPN:
    @pytest.mark.parametrize("arch", ["PanopticBiFPN", "PanopticBiFPNPR"])
    def test_forward_shapes(self, arch):
        model = create_model(arch, encoder="regnety_200mf", fpn_dim=32,
                             fpn_layers=1, num_classes=1,
                             subdivision_num_points=128)
        x = jnp.zeros((1, 128, 128, 1))
        _, out = _init_and_apply(model, x)
        assert out["sem_logits"].shape == (1, 128, 128, 1)

    def test_bc_model(self):
        model = create_model("PanopticDeepLabBC", encoder="resnet18",
                             num_classes=1, train_num_points=32,
                             subdivision_num_points=64)
        x = jnp.zeros((1, 64, 64, 1))
        _, out = _init_and_apply(model, x, train=True)
        assert set(out) >= {"sem_logits", "cnt_logits", "sem_points",
                            "cnt_points"}
        assert out["cnt_logits"].shape == (1, 64, 64, 1)


class TestStemAndTopkVariants:
    def test_s2d_stem_matches_plain_stem(self, monkeypatch):
        """SpaceToDepthStem is the same layer as the plain 3x3/s2 stem:
        identical param tree, outputs equal to float tolerance (the
        packed conv reduces in a different order)."""
        import os

        import jax

        from empanada_tpu.models.encoders.regnet import regnety_200mf

        model = regnety_200mf()
        x = np.random.default_rng(0).normal(
            0, 1, (2, 64, 64, 1)).astype(np.float32)

        monkeypatch.setenv("EMPANADA_S2D_STEM", "")
        v_plain = model.init(jax.random.key(0), x, train=False)
        y_plain = model.apply(v_plain, x, train=False)

        monkeypatch.setenv("EMPANADA_S2D_STEM", "1")
        v_s2d = model.init(jax.random.key(0), x, train=False)
        flat_a = jax.tree_util.tree_leaves(v_plain)
        flat_b = jax.tree_util.tree_leaves(v_s2d)
        assert [a.shape for a in flat_a] == [b.shape for b in flat_b]
        # SAME weights through the s2d path (checkpoint compatibility)
        y_s2d = model.apply(v_plain, x, train=False)

        for a, b in zip(y_plain, y_s2d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        os.environ.pop("EMPANADA_S2D_STEM", None)

    def test_approx_topk_env_gate(self, monkeypatch):
        """EMPANADA_APPROX_TOPK selects approx_max_k; indices must be a
        high-recall subset of the exact top-k on the same scores (on CPU
        the lowering is exact, so this pins wiring, not recall)."""
        import jax.numpy as jnp

        from empanada_tpu.models.point_rend import (
            get_uncertain_point_coords_on_grid,
        )

        unc = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (1, 32, 32, 1)).astype(np.float32))
        monkeypatch.setenv("EMPANADA_APPROX_TOPK", "0")
        exact_idx, exact_coords = get_uncertain_point_coords_on_grid(
            unc, 64)
        monkeypatch.setenv("EMPANADA_APPROX_TOPK", "1")
        approx_idx, approx_coords = get_uncertain_point_coords_on_grid(
            unc, 64)
        assert exact_idx.shape == approx_idx.shape
        recall = len(set(np.asarray(approx_idx[0]).tolist())
                     & set(np.asarray(exact_idx[0]).tolist())) / 64
        assert recall >= 0.9, recall


class TestLanePaddedGroupedConv:
    """Lane-padded grouped conv (blocks._lane_pad_grouped_conv): on the
    TPU runtime the misaligned fgc conv accumulates in bf16 off the MXU
    (measured ~25% RMS deviation, docs/performance.md); the padded form
    is the correctness+speed fix there. On CPU both paths are exact, so
    here we pin (a) numerical equality, (b) identical param trees."""

    def test_equals_plain_conv_and_same_params(self):
        import jax

        from empanada_tpu.models.blocks import ConvBNAct

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (2, 16, 16, 144)).astype(np.float32)
        plain = ConvBNAct(144, 3, groups=2, lane_pad=False)
        padded = ConvBNAct(144, 3, groups=2, lane_pad=True)
        v_plain = plain.init(jax.random.key(0), x, train=False)
        v_pad = padded.init(jax.random.key(0), x, train=False)

        flat_a = jax.tree_util.tree_flatten_with_path(v_plain)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(v_pad)[0]
        assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
        for (_, a), (_, b) in zip(flat_a, flat_b):
            assert a.shape == b.shape
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        out_plain = plain.apply(v_plain, x, train=False)
        out_pad = padded.apply(v_plain, x, train=False)
        np.testing.assert_allclose(np.asarray(out_pad),
                                   np.asarray(out_plain), atol=2e-5)

    def test_strided_and_odd_group_width(self):
        import jax

        from empanada_tpu.models.blocks import ConvBNAct

        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (1, 16, 16, 216)).astype(np.float32)  # cw=72
        plain = ConvBNAct(216, 3, stride=2, groups=3, lane_pad=False)
        padded = ConvBNAct(216, 3, stride=2, groups=3, lane_pad=True)
        v = plain.init(jax.random.key(0), x, train=False)
        a = plain.apply(v, x, train=False)
        b = padded.apply(v, x, train=False)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5)
