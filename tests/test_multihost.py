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
