"""Training-stack unit tests: loss semantics, optimizer decay masking,
OneCycle schedule, finetune freezing, checkpoint round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.losses import (
    BCLoss,
    PanopticLoss,
    bootstrap_ce,
    offset_l1,
    pointrend_loss,
)
from empanada_tpu.train.optim import (
    configure_optimizer,
    create_lr_schedule,
    decay_mask,
)
from empanada_tpu.train.trainer import finetune_trainable_mask


class TestLosses:
    def test_bootstrap_topk_math(self):
        """k=50% of 4 pixels with losses ~[20,20,0,0] -> mean of top2."""
        logits = jnp.asarray([20.0, 20.0, 20.0, 20.0]).reshape(1, 2, 2, 1)
        labels = jnp.asarray([0.0, 0.0, 1.0, 1.0]).reshape(1, 2, 2)
        full = bootstrap_ce(logits, labels, 1.0)
        half = bootstrap_ce(logits, labels, 0.5)
        assert float(half) == pytest.approx(2 * float(full), rel=1e-3)

    def test_offset_l1_masked(self):
        out = jnp.ones((1, 4, 4, 2))
        tgt = jnp.zeros((1, 4, 4, 2))
        w = jnp.zeros((1, 4, 4, 1)).at[0, 0, 0, 0].set(1.0)
        # only the single weighted pixel counts: |1-0| * 2ch / 1
        assert float(offset_l1(out, tgt, w)) == pytest.approx(2.0)
        assert float(offset_l1(out, tgt, jnp.zeros((1, 4, 4, 1)))) == 0.0

    def test_pointrend_loss_samples_labels(self):
        # labels = 1 in left half; points in left half with +logits -> ~0
        labels = jnp.zeros((1, 8, 8)).at[:, :, :4].set(1.0)
        coords = jnp.asarray([[[0.2, 0.5], [0.1, 0.2]]])  # (x, y) left
        logits = jnp.full((1, 2, 1), 20.0)
        assert float(pointrend_loss(logits, coords, labels)) < 1e-6
        # points in right half (label 0) with +logits -> large
        coords_r = jnp.asarray([[[0.9, 0.5], [0.8, 0.2]]])
        assert float(pointrend_loss(logits, coords_r, labels)) > 10

    def test_panoptic_loss_weights(self):
        N, H, W = 1, 8, 8
        out = {"sem_logits": jnp.zeros((N, H, W, 1)),
               "ctr_hmp": jnp.ones((N, H, W, 1)),
               "offsets": jnp.zeros((N, H, W, 2))}
        tgt = {"sem": jnp.zeros((N, H, W)),
               "ctr_hmp": jnp.zeros((N, H, W, 1)),
               "offsets": jnp.zeros((N, H, W, 2))}
        total, aux = PanopticLoss(mse_weight=200)(out, tgt)
        # mse term = 1.0 * 200 dominates
        assert float(aux["mse"]) == pytest.approx(1.0)
        assert float(total) == pytest.approx(
            200.0 + float(aux["ce"]), rel=1e-3)

    def test_bc_loss_keys(self):
        N, H, W = 1, 8, 8
        out = {"sem_logits": jnp.zeros((N, H, W, 1)),
               "cnt_logits": jnp.zeros((N, H, W, 1))}
        tgt = {"sem": jnp.zeros((N, H, W)), "cnt": jnp.zeros((N, H, W))}
        total, aux = BCLoss()(out, tgt)
        assert set(aux) == {"sem_ce", "cnt_ce", "total_loss"}


class TestOptim:
    def _params(self):
        return {
            "encoder_mod": {
                "stage1_block1": {"Conv_0": {"kernel": jnp.ones((3, 3, 1, 8))},
                                  "BatchNorm_0": {"scale": jnp.ones(8),
                                                  "bias": jnp.zeros(8)}},
                "stage4_block1": {"Conv_0": {"kernel": jnp.ones((3, 3, 8, 8))}},
            },
            "semantic_head": {"Conv_0": {"kernel": jnp.ones((1, 1, 8, 1)),
                                         "bias": jnp.zeros(1)}},
        }

    def test_decay_mask_excludes_bias_and_bn(self):
        from flax import traverse_util

        mask = traverse_util.flatten_dict(decay_mask(self._params()))
        assert mask[("encoder_mod", "stage1_block1", "Conv_0", "kernel")]
        assert not mask[("encoder_mod", "stage1_block1", "BatchNorm_0",
                         "scale")]
        assert not mask[("encoder_mod", "stage1_block1", "BatchNorm_0",
                         "bias")]
        assert not mask[("semantic_head", "Conv_0", "bias")]
        assert mask[("semantic_head", "Conv_0", "kernel")]

    def test_one_cycle_shape(self):
        sched = create_lr_schedule("OneCycleLR", steps_per_epoch=100,
                                   max_lr=0.01, epochs=10, pct_start=0.3)
        lrs = [float(sched(s)) for s in [0, 150, 300, 600, 999]]
        assert lrs[0] == pytest.approx(0.01 / 25, rel=1e-2)  # div_factor
        assert lrs[2] == pytest.approx(0.01, rel=1e-2)       # peak at 30%
        assert lrs[4] < 1e-5                                 # annealed
        assert all(np.isfinite(lrs))
        # tiny step counts stay finite (the optax NaN regression)
        tiny = create_lr_schedule("OneCycleLR", steps_per_epoch=1,
                                  max_lr=0.003, epochs=2)
        assert all(np.isfinite(float(tiny(s))) for s in range(4))

    def test_finetune_mask(self):
        from flax import traverse_util

        params = self._params()
        m_all = traverse_util.flatten_dict(
            finetune_trainable_mask(params, "all"))
        assert all(m_all.values())
        m_none = traverse_util.flatten_dict(
            finetune_trainable_mask(params, "none"))
        assert not m_none[("encoder_mod", "stage1_block1", "Conv_0",
                           "kernel")]
        assert m_none[("semantic_head", "Conv_0", "kernel")]
        m_s4 = traverse_util.flatten_dict(
            finetune_trainable_mask(params, "stage4"))
        assert not m_s4[("encoder_mod", "stage1_block1", "Conv_0", "kernel")]
        assert m_s4[("encoder_mod", "stage4_block1", "Conv_0", "kernel")]

    def test_frozen_params_dont_move(self):
        import optax

        from empanada_tpu.train.trainer import _freeze_wrap

        params = self._params()
        tx = configure_optimizer(params, "AdamW",
                                 create_lr_schedule("constant", 1, lr=0.1),
                                 weight_decay=0.01)
        tx = _freeze_wrap(tx, finetune_trainable_mask(params, "none"))
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        enc_upd = updates["encoder_mod"]["stage1_block1"]["Conv_0"]["kernel"]
        head_upd = updates["semantic_head"]["Conv_0"]["kernel"]
        assert float(jnp.abs(enc_upd).max()) == 0.0
        assert float(jnp.abs(head_upd).max()) > 0.0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from empanada_tpu.train.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        state = {"params": {"w": np.arange(6.0).reshape(2, 3)},
                 "step": np.asarray(7)}
        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, state, metadata={"epoch": 3, "arch": "X"})
        restored, meta = load_checkpoint(path)
        np.testing.assert_array_equal(restored["params"]["w"],
                                      state["params"]["w"])
        assert meta["epoch"] == 3 and meta["arch"] == "X"
