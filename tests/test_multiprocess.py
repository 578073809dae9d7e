"""Multi-host integration: 2 real OS processes == single-process results.

The reference is strictly single-process (/root/reference/main.py:25 —
device pick is cuda:<id>/cpu, no torch.distributed anywhere); multi-host
execution is a new subsystem of this framework (SURVEY §5.8). This test
launches TWO actual python processes over a localhost coordinator on the
CPU backend (2 virtual devices each -> a 4-device global mesh), drives the
REAL CLI (main.py: init_distributed -> global DP mesh -> per-process batch
feeding -> per-host eval partition -> rank-0 result writer), and asserts:

  * both processes exit cleanly;
  * only rank 0 writes its result file;
  * the full metrics payload equals a plain single-process run of the same
    config on the same dataset (the reference parity contract transfers
    unchanged to the multi-host path).

Runs MF (BASELINE config 1) for 3 epochs on a synthetic dataset written
through the real split pipeline.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_dataset(root: str):
    from coldrec_tpu.data.split import cold_start_split, write_split_dir
    from coldrec_tpu.data.synthetic import synthetic_interactions

    pairs = synthetic_interactions(150, 120, 3200, seed=41)
    res = cold_start_split(pairs, cold_object="item", seed=7)
    ddir = os.path.join(root, "data")
    write_split_dir(res, ddir, "demo", "item")
    rng = np.random.default_rng(3)
    np.save(
        os.path.join(ddir, "demo", "demo_item_content.npy"),
        rng.standard_normal((res.item_num, 12)).astype(np.float32),
    )
    return ddir


def _main_cmd(ddir: str, result_file: str) -> list:
    return [
        sys.executable, os.path.join(REPO, "main.py"),
        "--model", "MF", "--dataset", "demo", "--cold_object", "item",
        "--data_dir", ddir, "--epochs", "3", "--bs", "256",
        "--emb_size", "16", "--seed", "11", "--runs", "1",
        "--save_emb", "false", "--result_file", result_file,
        "--result_overwrite", "true",
    ]


def _env(n_local_devices: int, extra=None) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra:
        env.update(extra)
    return env


def _json_payload(result_file: str) -> dict:
    text = open(result_file, encoding="utf-8").read()
    marker = "--- JSON (machine-readable) ---"
    return json.loads(text.split(marker, 1)[1])


def test_two_process_run_matches_single_process(tmp_path):
    ddir = _write_dataset(str(tmp_path))

    # ---- single-process baseline (1 device, no mesh)
    base_file = str(tmp_path / "base.txt")
    r = subprocess.run(
        _main_cmd(ddir, base_file), env=_env(1), cwd=str(tmp_path),
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    # ---- 2 processes x 2 local devices = 4-device global DP mesh
    port = _free_port()
    files = [str(tmp_path / f"mp{i}.txt") for i in range(2)]
    procs = []
    for pid in range(2):
        extra = {
            "COLDREC_COORDINATOR": f"localhost:{port}",
            "COLDREC_NUM_PROCESSES": "2",
            "COLDREC_PROCESS_ID": str(pid),
        }
        procs.append(
            subprocess.Popen(
                _main_cmd(ddir, files[pid]), env=_env(2, extra),
                cwd=str(tmp_path), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]

    # rank-0 writer only
    assert os.path.isfile(files[0])
    assert not os.path.isfile(files[1])

    base = _json_payload(base_file)["metrics"]
    multi = _json_payload(files[0])["metrics"]
    for tn in base:
        for setting in base[tn]:
            for metric, v in base[tn][setting].items():
                mv = multi[tn][setting][metric]
                assert abs(mv["mean"] - v["mean"]) < 1e-9, (
                    tn, setting, metric, v, mv,
                )

    # the run really was multi-process: each process saw 4 global devices
    assert "Start round 0 running!" in outs[0]
