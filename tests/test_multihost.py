"""REAL multi-process inference composition: two OS processes, each a
JAX distributed participant (gloo CPU collectives), z-shard an orthoplane
3D inference and rank 0's consensus must equal the single-process run
exactly (reference scripts/inference3d_multigpu.py:276-379 capability)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    from empanada_tpu.parallel import initialize_distributed
    if pid >= 0:
        initialize_distributed(f"127.0.0.1:{{port}}", 2, pid)

    import numpy as np
    from tests.synthetic import SyntheticModule
    from tests.test_multihost import blob_volume, canonical
    from empanada_tpu.parallel.multihost import multihost_run_inference3d

    vol = blob_volume()
    cons = multihost_run_inference3d(
        (SyntheticModule(), {{}}), vol, labels=[1], thing_list=[1],
        qlen=3, label_divisor=100, block_size=4, padding_factor=16,
        max_centers=64, min_size=4, min_span=1, pixel_vote_thr=2)
    if cons is not None:
        with open(out, "w") as f:
            json.dump(canonical(cons), f)
""")


def blob_volume():
    shape = (11, 33, 30)
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    mask = (((zz - 5) ** 2) / 9 + ((yy - 14) ** 2) / 49
            + ((xx - 16) ** 2) / 36) <= 1.0
    return mask.astype(np.float32)


def canonical(consensus):
    """Label-agnostic, order-stable dump of {class: tracker}."""
    out = {}
    for class_id, tracker in consensus.items():
        insts = []
        for attrs in tracker.instances.values():
            insts.append({
                "box": [int(v) for v in attrs["box"]],
                "starts": np.asarray(attrs["starts"]).tolist(),
                "runs": np.asarray(attrs["runs"]).tolist(),
            })
        insts.sort(key=lambda d: (d["box"], d["starts"][:1]))
        out[str(class_id)] = insts
    return out


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


TRAIN_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from empanada_tpu.parallel import initialize_distributed
    initialize_distributed(f"127.0.0.1:{{port}}", 2, pid)
    assert jax.device_count() == 8 and jax.process_count() == 2

    import numpy as np
    from tests.test_multihost import train_config, train_batch
    from empanada_tpu.parallel import create_mesh
    from empanada_tpu.train import Trainer

    mesh = create_mesh(8)
    trainer = Trainer(train_config(8), mesh=mesh, seed=0)
    trainer.init_state(steps_per_epoch=1, input_shape=(8, 64, 64, 1))
    trainer.train_step(train_batch(8), jax.random.key(1))
    params = jax.device_get(trainer.state.params)
    flat = np.concatenate([np.ravel(x) for x in
                           jax.tree_util.tree_leaves(params)])
    if pid == 0:
        np.save(out, flat)
""")


def train_config(batch_size):
    return {
        "DATASET": {"class_names": {1: "mito"}, "labels": [1],
                    "thing_list": [1],
                    "norms": {"mean": 0.5, "std": 0.15}},
        "MODEL": {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                  "num_classes": 1, "train_num_points": 16,
                  "subdivision_num_points": 32},
        "TRAIN": {
            "lr_schedule": "OneCycleLR",
            "schedule_params": {"max_lr": 3e-3, "epochs": 1},
            "optimizer": "AdamW", "optimizer_params": {"weight_decay": 0.1},
            "criterion": "PanopticLoss", "criterion_params": {},
            "batch_size": batch_size, "finetune_layer": "all",
        },
    }


def train_batch(n):
    rng = np.random.default_rng(0)
    return {
        "image": rng.normal(0, 1, (n, 64, 64, 1)).astype(np.float32),
        "sem": (rng.random((n, 64, 64)) > 0.5).astype(np.float32),
        "ctr_hmp": rng.random((n, 64, 64, 1)).astype(np.float32),
        "offsets": rng.normal(0, 4, (n, 64, 64, 2)).astype(np.float32),
    }


@pytest.mark.slow
def test_two_process_dp_training_matches_single(tmp_path):
    """REAL multi-process DP training: two OS processes x 4 CPU devices
    form one 8-device mesh; one jitted train step must produce the same
    post-AdamW params as a single-device step on the same global batch
    (the reference's DDP gradient-allreduce semantics, train.py:193-206,
    across PROCESS boundaries — collectives ride gloo here, ICI/DCN on
    real pods)."""
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER.format(repo=REPO))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    port = _free_port()
    out = tmp_path / "dp_params.npy"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid), str(out)],
            env=env)
        for pid in (0, 1)
    ]
    for p in procs:
        assert p.wait(timeout=900) == 0
    dp_flat = np.load(out)

    # single-device reference step on the same global batch, in-process
    import jax

    from empanada_tpu.parallel import create_mesh
    from empanada_tpu.train import Trainer

    trainer = Trainer(train_config(8), mesh=create_mesh(1), seed=0)
    trainer.init_state(steps_per_epoch=1, input_shape=(8, 64, 64, 1))
    trainer.train_step(train_batch(8), jax.random.key(1))
    single_flat = np.concatenate([
        np.ravel(x)
        for x in jax.tree_util.tree_leaves(
            jax.device_get(trainer.state.params))])

    assert dp_flat.shape == single_flat.shape
    # Adam sign-flips at fp-noise gradients bound per-coord discrepancy
    # by 2*lr (see __graft_entry__ dryrun); assert the same envelope
    assert np.max(np.abs(dp_flat - single_flat)) <= 1e-3


@pytest.mark.slow
def test_two_process_matches_single(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    # single-process reference (pid -1: no distributed init)
    single_out = tmp_path / "single.json"
    subprocess.run(
        [sys.executable, str(script), "0", "-1", str(single_out)],
        env=env, check=True, timeout=600)

    port = _free_port()
    multi_out = tmp_path / "multi.json"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid),
             str(multi_out if pid == 0 else tmp_path / "ignored.json")],
            env=env)
        for pid in (0, 1)
    ]
    for p in procs:
        assert p.wait(timeout=600) == 0

    with open(single_out) as f:
        want = json.load(f)
    with open(multi_out) as f:
        got = json.load(f)
    assert want["1"], "single-process run found no instances"
    assert got == want
