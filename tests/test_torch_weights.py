"""Golden parity tests: reference torch encoders vs flax encoders through
the structural weight converter. Loads the reference's torch-only encoder
modules as test oracles (never imported by library code)."""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/empanada/models/encoders/resnet.py"
REF_REGNET = "/root/reference/empanada/models/encoders/regnet.py"
REF_BLOCKS = "/root/reference/empanada/models/blocks.py"


def _load_ref_resnet():
    spec = importlib.util.spec_from_file_location("ref_resnet", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_ref_regnet():
    import types

    for pkg in ("empanada", "empanada.models", "empanada.models.encoders"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("empanada.models.blocks", REF_BLOCKS)
    return load("empanada.models.encoders.regnet", REF_REGNET)


class TestTorchToFlax:
    @pytest.mark.parametrize("name", ["resnet18", "resnet50"])
    def test_resnet_forward_parity(self, name):
        import jax

        from empanada_tpu.models.encoders import get_encoder
        from empanada_tpu.train.torch_weights import (
            convert_encoder_state_dict,
        )

        ref = _load_ref_resnet()
        tmodel = getattr(ref, name)(in_channels=1).eval()
        # randomize running stats so eval-mode BN is a real test
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)

        fmodel = get_encoder(name)
        x = np.random.default_rng(0).normal(
            0, 1, (1, 64, 64, 1)).astype(np.float32)
        variables = fmodel.init(jax.random.key(0), x, False)

        params, batch_stats, report = convert_encoder_state_dict(
            tmodel.state_dict(), variables["params"],
            variables["batch_stats"])
        assert not report["leftover"], report

        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_out = fmodel.apply(
            {"params": params, "batch_stats": batch_stats}, x, False)

        assert len(t_out) == len(f_out) == 5
        for i, (t, f) in enumerate(zip(t_out, f_out)):
            t_np = t.numpy().transpose(0, 2, 3, 1)
            # fp32 accumulation-order differences grow with activation
            # scale through 50 layers; bound the scale-normalized error
            scale = max(1.0, float(np.abs(t_np).max()))
            max_diff = float(np.abs(t_np - np.asarray(f)).max())
            assert max_diff <= 1e-5 * scale, \
                f"pyramid level {i}: {max_diff} vs scale {scale}"

    def test_regnety_forward_parity(self):
        """RegNetY-200MF (SE blocks) — the MitoNet backbone family —
        converted from the reference's own torch module."""
        import jax

        from empanada_tpu.models.encoders import get_encoder
        from empanada_tpu.train.torch_weights import (
            convert_encoder_state_dict,
        )

        ref = _load_ref_regnet()
        tmodel = ref.regnety_200mf().eval()
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)

        fmodel = get_encoder("regnety_200mf")
        x = np.random.default_rng(0).normal(
            0, 1, (1, 64, 64, 1)).astype(np.float32)
        variables = fmodel.init(jax.random.key(0), x, False)
        params, batch_stats, report = convert_encoder_state_dict(
            tmodel.state_dict(), variables["params"],
            variables["batch_stats"])
        assert not report["leftover"], report

        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_out = fmodel.apply(
            {"params": params, "batch_stats": batch_stats}, x, False)
        for i, (t, f) in enumerate(zip(t_out, f_out)):
            t_np = t.numpy().transpose(0, 2, 3, 1)
            scale = max(1.0, float(np.abs(t_np).max()))
            max_diff = float(np.abs(t_np - np.asarray(f)).max())
            assert max_diff <= 1e-5 * scale, (i, max_diff, scale)

    def test_full_panoptic_deeplab_parity(self):
        """Whole-model golden test: reference torch PanopticDeepLab
        (encoder + semantic/instance decoders + 3 heads) vs the flax
        model through the structural converter — outputs must agree to
        fp tolerance. This pins decoder/head wiring, ASPP, and the
        align_corners upsampling semantics."""
        import types

        import jax

        from empanada_tpu.models import create_model
        from empanada_tpu.train.torch_weights import (
            convert_encoder_state_dict,
        )

        R = "/root/reference/empanada/models"
        for pkg in ("empanada", "empanada.models",
                    "empanada.models.encoders", "empanada.models.decoders"):
            sys.modules.setdefault(pkg, types.ModuleType(pkg))

        def load(name, path):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        load("empanada.models.blocks", f"{R}/blocks.py")
        rn = load("empanada.models.encoders.resnet", f"{R}/encoders/resnet.py")
        rg = load("empanada.models.encoders.regnet", f"{R}/encoders/regnet.py")
        enc_pkg = sys.modules["empanada.models.encoders"]
        for mod in (rn, rg):
            for k in getattr(mod, "__all__", []):
                setattr(enc_pkg, k, getattr(mod, k))
        sys.modules["empanada.models"].encoders = enc_pkg
        load("empanada.models.decoders.aspp", f"{R}/decoders/aspp.py")
        dec = load("empanada.models.decoders.panoptic_deeplab",
                   f"{R}/decoders/panoptic_deeplab.py")
        sys.modules["empanada.models.decoders"].PanopticDeepLabDecoder = \
            dec.PanopticDeepLabDecoder
        load("empanada.models.heads", f"{R}/heads.py")
        load("empanada.models.point_rend", f"{R}/point_rend.py")
        pd = load("empanada.models.panoptic_deeplab",
                  f"{R}/panoptic_deeplab.py")

        tmodel = pd.PanopticDeepLab(
            encoder="resnet50", num_classes=1, stage4_stride=16,
            low_level_stages=[3, 2, 1],
            low_level_channels_project=[128, 64, 32],
            atrous_rates=[2, 4, 6], ins_decoder=True).eval()
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)

        fmodel = create_model("PanopticDeepLab", encoder="resnet50",
                              num_classes=1, ins_decoder=True)
        x = np.random.default_rng(0).normal(
            0, 1, (1, 64, 64, 1)).astype(np.float32)
        variables = fmodel.init(
            {"params": jax.random.key(0), "points": jax.random.key(1),
             "dropout": jax.random.key(2)}, x, train=False)
        params, batch_stats, report = convert_encoder_state_dict(
            tmodel.state_dict(), variables["params"],
            variables["batch_stats"])
        assert not report["leftover"], report

        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_out = fmodel.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False)
        for k in ("sem_logits", "ctr_hmp", "offsets"):
            t_np = t_out[k].numpy().transpose(0, 2, 3, 1)
            scale = max(1.0, float(np.abs(t_np).max()))
            max_diff = float(np.abs(t_np - np.asarray(f_out[k])).max())
            assert max_diff <= 1e-5 * scale, (k, max_diff, scale)

    @pytest.mark.slow
    def test_full_panoptic_bifpn_parity(self):
        """Whole-MitoNet-architecture golden test: reference torch
        PanopticBiFPN (regnet encoder + BiFPN with shared after-combine
        convs and fusion weights + transpose-conv ladder decoder + heads)
        vs the flax model through the converter."""
        import types

        import jax

        from empanada_tpu.models import create_model
        from empanada_tpu.train.torch_weights import (
            convert_encoder_state_dict,
        )

        R = "/root/reference/empanada/models"
        for pkg in ("empanada", "empanada.models",
                    "empanada.models.encoders", "empanada.models.decoders"):
            sys.modules.setdefault(pkg, types.ModuleType(pkg))

        def load(name, path):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        load("empanada.models.blocks", f"{R}/blocks.py")
        rn = load("empanada.models.encoders.resnet",
                  f"{R}/encoders/resnet.py")
        rg = load("empanada.models.encoders.regnet",
                  f"{R}/encoders/regnet.py")
        enc_pkg = sys.modules["empanada.models.encoders"]
        for mod in (rn, rg):
            for k in getattr(mod, "__all__", []):
                setattr(enc_pkg, k, getattr(mod, k))
        sys.modules["empanada.models"].encoders = enc_pkg
        load("empanada.models.decoders.aspp", f"{R}/decoders/aspp.py")
        dec = load("empanada.models.decoders.panoptic_deeplab",
                   f"{R}/decoders/panoptic_deeplab.py")
        bif = load("empanada.models.decoders.bifpn",
                   f"{R}/decoders/bifpn.py")
        dp = sys.modules["empanada.models.decoders"]
        dp.PanopticDeepLabDecoder = dec.PanopticDeepLabDecoder
        dp.BiFPN = bif.BiFPN
        dp.BiFPNDecoder = bif.BiFPNDecoder
        load("empanada.models.heads", f"{R}/heads.py")
        load("empanada.models.point_rend", f"{R}/point_rend.py")
        pb = load("empanada.models.panoptic_bifpn",
                  f"{R}/panoptic_bifpn.py")

        # the PR variant IS MitoNet: encoder + BiFPN + ladder decoder +
        # heads + the PointRend subdivision render, all exercised
        torch.manual_seed(0)
        tmodel = pb.PanopticBiFPNPR(encoder="regnety_200mf", num_classes=1,
                                    fpn_dim=96, fpn_layers=2).eval()
        with torch.no_grad():
            for m in tmodel.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.05)
                    m.running_var.uniform_(0.8, 1.2)
            for name, mod in tmodel.named_modules():
                if "point_head" in name and isinstance(mod, torch.nn.Conv1d):
                    torch.nn.init.normal_(mod.weight, std=0.3)

        fmodel = create_model("PanopticBiFPNPR", encoder="regnety_200mf",
                              num_classes=1, fpn_dim=96, fpn_layers=2)
        x = np.random.default_rng(0).normal(
            0, 1, (1, 128, 128, 1)).astype(np.float32)
        variables = fmodel.init(
            {"params": jax.random.key(0), "points": jax.random.key(1),
             "dropout": jax.random.key(2)}, x, train=False)
        params, batch_stats, report = convert_encoder_state_dict(
            tmodel.state_dict(), variables["params"],
            variables["batch_stats"])
        assert not report["leftover"], report

        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_out = fmodel.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False,
            render_steps=2, interpolate_ins=True)
        for k in ("sem_logits", "ctr_hmp", "offsets"):
            t_np = t_out[k].numpy().transpose(0, 2, 3, 1)
            scale = max(1.0, float(np.abs(t_np).max()))
            max_diff = float(np.abs(t_np - np.asarray(f_out[k])).max())
            assert max_diff <= 1e-5 * scale, (k, max_diff, scale)

    def test_encoder_pretraining_into_full_model(self, tmp_path):
        import jax

        from empanada_tpu.models import create_model
        from empanada_tpu.train.torch_weights import (
            load_encoder_pretraining,
        )

        ref = _load_ref_resnet()
        tmodel = ref.resnet18(in_channels=1)
        ckpt = {"state_dict": {f"module.{k}": v
                               for k, v in tmodel.state_dict().items()},
                "norms": [0.5, 0.2]}
        path = str(tmp_path / "cem.pth.tar")
        torch.save(ckpt, path)

        model = create_model("PanopticDeepLab", encoder="resnet18",
                             num_classes=1)
        x = np.zeros((1, 64, 64, 1), np.float32)
        variables = model.init(
            {"params": jax.random.key(0), "points": jax.random.key(1),
             "dropout": jax.random.key(2)}, x, train=False)
        # unfreeze the mutable dicts
        variables = {k: dict(v) if hasattr(v, "items") else v
                     for k, v in variables.items()}

        new_vars, norms = load_encoder_pretraining(variables, path)
        assert norms == {"mean": 0.5, "std": 0.2}
        # encoder stem kernel actually replaced
        got = np.asarray(
            new_vars["params"]["encoder_mod"]["stem"]["kernel"])
        want = tmodel.state_dict()["conv1.weight"].numpy() \
            .transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # model still runs
        out = model.apply(new_vars, x, train=False)
        assert out["sem_logits"].shape == (1, 64, 64, 1)


def _load_ref_full_tree():
    """Load the reference model package tree (idempotent) and return the
    panoptic_deeplab + panoptic_bifpn modules."""
    import types

    R = "/root/reference/empanada/models"
    for pkg in ("empanada", "empanada.models",
                "empanada.models.encoders", "empanada.models.decoders"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))

    def load(name, path):
        if name in sys.modules and hasattr(sys.modules[name], "__file__"):
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("empanada.models.blocks", f"{R}/blocks.py")
    rn = load("empanada.models.encoders.resnet", f"{R}/encoders/resnet.py")
    rg = load("empanada.models.encoders.regnet", f"{R}/encoders/regnet.py")
    enc_pkg = sys.modules["empanada.models.encoders"]
    for mod in (rn, rg):
        for k in getattr(mod, "__all__", []):
            setattr(enc_pkg, k, getattr(mod, k))
    sys.modules["empanada.models"].encoders = enc_pkg
    load("empanada.models.decoders.aspp", f"{R}/decoders/aspp.py")
    dec = load("empanada.models.decoders.panoptic_deeplab",
               f"{R}/decoders/panoptic_deeplab.py")
    bif = load("empanada.models.decoders.bifpn", f"{R}/decoders/bifpn.py")
    dp = sys.modules["empanada.models.decoders"]
    dp.PanopticDeepLabDecoder = dec.PanopticDeepLabDecoder
    dp.BiFPN = bif.BiFPN
    dp.BiFPNDecoder = bif.BiFPNDecoder
    load("empanada.models.heads", f"{R}/heads.py")
    load("empanada.models.point_rend", f"{R}/point_rend.py")
    pd = load("empanada.models.panoptic_deeplab", f"{R}/panoptic_deeplab.py")
    pb = load("empanada.models.panoptic_bifpn", f"{R}/panoptic_bifpn.py")
    return pd, pb


@pytest.mark.slow
class TestFlaxToTorch:
    def test_flax_to_torch_round_trip_bifpn(self):
        """Inverse converter on the full MitoNet architecture: flax
        values -> torch template must (a) load with strict=True, (b)
        round-trip back through the forward converter bit-exactly, and
        (c) produce a torch forward matching the flax forward. Exercises
        weight-shared BiFPN after-convs (aliases), fusion weights,
        transpose convs, and the PointRend Conv1d MLP."""
        import jax

        from empanada_tpu.models import create_model
        from empanada_tpu.train.torch_weights import (
            convert_encoder_state_dict,
            convert_flax_to_torch_state_dict,
        )

        _, pb = _load_ref_full_tree()
        torch.manual_seed(1)
        tmodel = pb.PanopticBiFPNPR(encoder="regnety_200mf", num_classes=1,
                                    fpn_dim=96, fpn_layers=2).eval()

        fmodel = create_model("PanopticBiFPNPR", encoder="regnety_200mf",
                              num_classes=1, fpn_dim=96, fpn_layers=2)
        x = np.random.default_rng(3).normal(
            0, 1, (1, 128, 128, 1)).astype(np.float32)
        variables = fmodel.init(
            {"params": jax.random.key(5), "points": jax.random.key(1),
             "dropout": jax.random.key(2)}, x, train=False)

        sd, report = convert_flax_to_torch_state_dict(
            tmodel.state_dict(), variables["params"],
            variables["batch_stats"])
        assert not report["leftover"], report
        tmodel.load_state_dict(sd, strict=True)

        # round trip back: forward-convert the new torch weights and
        # compare against the original flax trees exactly
        params2, stats2, rep2 = convert_encoder_state_dict(
            tmodel.state_dict(), variables["params"],
            variables["batch_stats"])
        assert not rep2["leftover"], rep2
        from flax import traverse_util
        for tree, tree2 in ((variables["params"], params2),
                            (variables["batch_stats"], stats2)):
            flat = traverse_util.flatten_dict(tree)
            flat2 = traverse_util.flatten_dict(tree2)
            assert set(flat) == set(flat2)
            for k in flat:
                np.testing.assert_array_equal(
                    np.asarray(flat[k], np.float32), flat2[k], err_msg=str(k))

        # forward parity: the exported torch model behaves like the flax
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_out = fmodel.apply(variables, x, train=False, render_steps=2,
                             interpolate_ins=True)
        for k in ("sem_logits", "ctr_hmp", "offsets"):
            t_np = t_out[k].numpy().transpose(0, 2, 3, 1)
            scale = max(1.0, float(np.abs(t_np).max()))
            max_diff = float(np.abs(t_np - np.asarray(f_out[k])).max())
            assert max_diff <= 1e-5 * scale, (k, max_diff, scale)


class TestPointRendParity:
    @pytest.mark.parametrize("steps,npts", [(1, 256), (2, 64)])
    def test_render_head_exact(self, steps, npts):
        """Isolated PointRendSemSegHead eval parity vs the reference
        torch module (converted weights): the subdivision render loop
        (upsample -> top-K uncertain -> point MLP -> scatter) must match
        exactly, including border-pixel sampling (grid_sample zero
        padding)."""
        import importlib.util as ilu
        import types

        import jax
        import jax.numpy as jnp

        from empanada_tpu.models.point_rend import PointRendSemSegHead
        from empanada_tpu.train.torch_weights import (
            convert_encoder_state_dict,
        )

        R = "/root/reference/empanada/models"
        for pkg in ("empanada", "empanada.models"):
            sys.modules.setdefault(pkg, types.ModuleType(pkg))

        def load(name, path):
            spec = ilu.spec_from_file_location(name, path)
            mod = ilu.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        load("empanada.models.blocks", f"{R}/blocks.py")
        pr = load("empanada.models.point_rend", f"{R}/point_rend.py")

        rng = np.random.default_rng(0)
        C, F = 1, 8
        coarse = rng.normal(0, 1, (1, 8, 8, C)).astype(np.float32)
        feats = rng.normal(0, 1, (1, 8, 8, F)).astype(np.float32)

        torch.manual_seed(1)
        thead = pr.PointRendSemSegHead(
            F, C, subdivision_steps=steps,
            subdivision_num_points=npts).eval()
        with torch.no_grad():
            for m in thead.modules():
                if isinstance(m, torch.nn.Conv1d):
                    torch.nn.init.normal_(m.weight, std=0.3)
                    torch.nn.init.normal_(m.bias, std=0.1)
        with torch.no_grad():
            want = thead(
                torch.from_numpy(coarse.transpose(0, 3, 1, 2)),
                torch.from_numpy(feats.transpose(0, 3, 1, 2))
            )["sem_seg_logits"].numpy().transpose(0, 2, 3, 1)

        fhead = PointRendSemSegHead(num_classes=C, subdivision_steps=steps,
                                    subdivision_num_points=npts)
        variables = fhead.init(
            {"params": jax.random.key(0), "points": jax.random.key(1)},
            jnp.asarray(coarse), jnp.asarray(feats), train=False)
        params, _, report = convert_encoder_state_dict(
            thead.state_dict(), variables["params"], {})
        assert not report["leftover"], report
        got = np.asarray(fhead.apply(
            {"params": params}, jnp.asarray(coarse), jnp.asarray(feats),
            train=False)["sem_seg_logits"])
        assert np.abs(want - got).max() < 1e-5
