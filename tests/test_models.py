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
