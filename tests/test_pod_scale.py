"""Pod-scale dryruns: 16/32 virtual devices, 2D-mesh CLI eval, multi-process.

Each case runs in a subprocess because the virtual device count
(``xla_force_host_platform_device_count``) is fixed at backend
initialization — the in-process suite is pinned to 8 devices by conftest.
These validate that the sharding/collective design compiles and executes at
pod-like device counts, and that ``jax.distributed`` multi-process wiring
(the DCN analog) actually works — not just that the wrapper imports.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_devices: int):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.parametrize("n", [16, 32])
def test_dryrun_multichip_pod_counts(n):
    """Full train step + sharded top-k + candidate ranks + DP extraction
    compile and run at 16/32 devices (2D data x gallery mesh)."""
    r = subprocess.run(
        [sys.executable, "-c",
         f"import __graft_entry__ as g; g.dryrun_multichip({n})"],
        cwd=REPO, env=_env(n), capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert f"dryrun_multichip({n}) OK" in r.stdout, r.stdout[-2000:]
    assert "extract=DP-exact" in r.stdout


def test_cli_evaluate_sharded_2d_mesh_16(tmp_path):
    """`cli evaluate --sharded --mesh 4x4` on 16 virtual devices must
    reproduce the dense single-device mAP exactly (streaming rank path)."""
    gen = (
        "from irtpu.data.test_datasets import make_synthetic_dataset;"
        f"make_synthetic_dataset(r'{tmp_path}', name='podsynth', n_scenes=2,"
        "views_per_scene=3, n_distractors=2, image_hw=(64, 80), seed=3)"
    )
    r = subprocess.run(
        [sys.executable, "-c", gen],
        cwd=REPO, env=_env(16), capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    def run_eval(extra):
        cmd = [
            sys.executable, "-m",
            "image_retrieval_for_image_based_localization_tpu.cli", "evaluate",
            "--dataset", "podsynth", "--data-root", str(tmp_path),
            "--arch", "resnet18", "--pooling", "gem",
            "--image-size", "80", "--batch-size", "4",
        ] + extra
        r = subprocess.run(
            cmd, cwd=REPO, env=_env(16), capture_output=True, text=True,
            timeout=1200,
        )
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
        maps = [l for l in r.stdout.splitlines() if "mAP" in l]
        assert maps, r.stdout[-2000:]
        return maps[0]

    dense = run_eval([])
    sharded = run_eval(["--sharded", "--mesh", "4x4"])
    assert dense.split(":", 1)[1] == sharded.split(":", 1)[1], (dense, sharded)


def test_two_process_distributed_psum():
    """jax.distributed two-process run: coordinator + cross-process psum,
    then a ShardedIndex gallery sharded ACROSS the two processes queried
    through the flagship collective (all-gather merge + psum candidate
    ranks), asserting exact equality with single-device results — the
    multi-host/DCN code path end to end."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = _env(1)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "dist_worker.py"),
             str(port), str(pid)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        # 157s alone on this box; 600 tolerates a loaded machine (the
        # round-4 full-suite run hit TimeoutExpired at 300 while a TPU
        # training campaign shared the host)
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (pid, out[-3000:])
        assert f"DIST_OK pid={pid} procs=2 psum=3.0" in out, out[-2000:]
        assert f"SHARDED_QUERY_OK pid={pid}" in out, out[-2000:]
        assert f"SHARDED_ANN_OK pid={pid}" in out, out[-2000:]
        assert f"DIST_TRAIN_OK pid={pid}" in out, out[-2000:]
    # both processes saw the identical merged ranking
    sums = {o.split("idx_sum=")[1].split()[0] for o in outs if "idx_sum=" in o}
    assert len(sums) == 1, sums
