"""CLI end-to-end: split -> write dataset dir -> main.run -> result file."""
import json
import os

import numpy as np
import pytest

import main as cli_main
from coldrec_tpu.config import default_args, make_args
from coldrec_tpu.data.split import cold_start_split, write_split_dir
from coldrec_tpu.data.synthetic import synthetic_interactions


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    pairs = synthetic_interactions(90, 110, 2200, seed=41)
    res = cold_start_split(pairs, cold_object="item", seed=42)
    write_split_dir(res, str(root), "synthds", "item")
    rng = np.random.default_rng(0)
    np.save(
        os.path.join(root, "synthds", "synthds_item_content.npy"),
        rng.standard_normal((res.item_num, 8)).astype(np.float32),
    )
    return str(root)


def test_cli_run_mf(dataset_dir, tmp_path):
    result_file = str(tmp_path / "result.txt")
    args = make_args(
        [
            "--model", "MF", "--dataset", "synthds", "--cold_object", "item",
            "--data_dir", dataset_dir, "--emb_dir", str(tmp_path / "emb"),
            "--epochs", "2", "--bs", "256", "--emb_size", "8",
            "--result_file", result_file, "--runs", "2",
        ]
    )
    payload = cli_main.run(args)
    assert payload["method"] == "MF"
    assert "10" in payload["metrics"] and "20" in payload["metrics"]
    # two runs aggregated
    assert os.path.exists(result_file)
    text = open(result_file).read()
    assert "=== ColdRec Run Result ===" in text
    assert "--- JSON (machine-readable) ---" in text
    blob = text.split("--- JSON (machine-readable) ---")[1]
    parsed = json.loads(blob)
    assert parsed["efficiency"]["seconds_per_completed_epoch_mean"] > 0


def test_model_specific_flags_parse(dataset_dir):
    args = make_args(["--model", "SimGCL", "--cl_rate", "0.3", "--tau", "0.1"])
    assert args.cl_rate == 0.3 and args.tau == 0.1
    args = make_args(["--model", "VBPR", "--p_emb", "0.01,0.001"])
    assert args.p_emb == [0.01, 0.001]


def test_overrides_applied():
    args = default_args(model="AGNN")
    assert args.lr == 5e-4 and args.epochs == 20  # set_defaults parity
    args = default_args(model="FSGNN")
    assert args.lr == 0.005 and args.reg == 0.0005


def test_random_search_backend(dataset_dir, tmp_path, monkeypatch):
    import param_search

    monkeypatch.chdir(tmp_path)
    args = default_args(
        model="MF", dataset="synthds", cold_object="item",
        data_dir=dataset_dir, emb_dir=str(tmp_path / "emb"),
        epochs=1, bs=256, emb_size=8, save_emb=False,
    )
    best = param_search.random_search(args, n_trials=2, param_dir=str(tmp_path / "param"))
    assert best is not None and np.isfinite(best["value"])
    slug = param_search.search_result_slug(args)
    assert os.path.exists(tmp_path / "param" / f"{slug}.pkl")
    # resumability: journal has 2 lines; rerun adds nothing
    journal = tmp_path / "param" / f"search_{slug}.jsonl"
    n_before = len(open(journal).readlines())
    param_search.random_search(args, n_trials=2, param_dir=str(tmp_path / "param"))
    assert len(open(journal).readlines()) == n_before


def test_tpe_sampler_concentrates_on_good_region():
    """TPE-lite: after a history where lr=1e-3 scores high, the sampler
    should draw lr=1e-3 far more often than uniform; floats concentrate
    around the good cluster in log space."""
    import math
    import random

    import param_search

    choices = [1e-4, 5e-3, 1e-3, 5e-2, 1e-2]
    history = []
    for t in range(40):
        lr = choices[t % len(choices)]
        reg = math.exp(random.Random(t).uniform(math.log(1e-8), math.log(1e-4)))
        value = (1.0 if lr == 1e-3 else 0.1) + (0.5 if reg < 1e-6 else 0.0)
        history.append(
            {"trial": t, "params": {"lr": lr, "ssl_reg": reg}, "value": value}
        )

    rng = random.Random(0)
    hits = sum(
        param_search.TPETrial(rng, history).suggest_categorical("lr", choices)
        == 1e-3
        for _ in range(300)
    )
    assert hits > 150, hits  # uniform would give ~60/300

    small = sum(
        param_search.TPETrial(rng, history).suggest_float(
            "ssl_reg", 1e-8, 1e-4, log=True
        )
        < 1e-6
        for _ in range(300)
    )
    assert small > 150, small  # uniform-in-log would give ~100/300

    # never leaves the bounds
    for _ in range(200):
        v = param_search.TPETrial(rng, history).suggest_float(
            "ssl_reg", 1e-8, 1e-4, log=True
        )
        assert 1e-8 <= v <= 1e-4

    # unknown param / empty history degrade to uniform without error
    empty = param_search.TPETrial(rng, [])
    assert empty.suggest_categorical("lr", choices) in choices
    assert 1 <= empty.suggest_int("layers", 1, 3) <= 3
