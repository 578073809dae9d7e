"""Scoped sys.path access to the PyTorch reference for torch-oracle tests.

The oracle tests (test_*_torch_oracle.py) import the live reference
(/root/reference: model/*.py, util/utils.py) to pin our math against it.
Round 2 did this with bare ``sys.path.insert(0, REF)`` calls that were never
undone, so a later ``import param_search`` in test_cli.py resolved to
/root/reference/param_search.py (which hard-imports optuna) instead of
/root/repo/param_search.py — 2 failures in the one-invocation full suite.

``ReferenceEnv`` makes the pollution scoped: ``install()`` writes the faiss
shim (the image has no faiss; parity_check.FAISS_SHIM is an exact functional
replacement) and prepends [shim, /root/reference] to sys.path; ``uninstall()``
removes exactly those entries and purges every sys.modules entry whose
__file__ lives under either directory, so the next module that imports
``model``/``util``/``faiss``/``param_search`` re-resolves from a clean path.

Use via the module-scoped ``ref_env`` fixture in conftest.py.
"""
import os
import sys
import tempfile

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")


class ReferenceEnv:
    """Reversible installer for the reference checkout + faiss shim."""

    def __init__(self):
        self._inserted = []
        self._shim_dir = None

    def install(self):
        if TOOLS not in sys.path:  # parity_check lives in tools/ (first-party)
            sys.path.insert(0, TOOLS)
            self._inserted.append(TOOLS)
        from parity_check import FAISS_SHIM

        self._shim_dir = tempfile.mkdtemp(prefix="ref_faiss_shim_")
        with open(os.path.join(self._shim_dir, "faiss.py"), "w") as f:
            f.write(FAISS_SHIM)
        for p in (self._shim_dir, REF):
            sys.path.insert(0, p)
            self._inserted.append(p)
        return self

    def uninstall(self):
        roots = [r for r in (REF, self._shim_dir) if r]
        for name, mod in list(sys.modules.items()):
            f = getattr(mod, "__file__", None)
            if f and any(f.startswith(r + os.sep) or f == r for r in roots):
                del sys.modules[name]
        # package objects without __file__: namespace packages expose only
        # __path__ (which can be an exotic non-iterable, e.g. torch.classes
        # — guard accordingly).
        for name, mod in list(sys.modules.items()):
            try:
                paths = [str(p) for p in getattr(mod, "__path__", None) or []]
            except TypeError:
                continue
            if paths and any(
                any(p.startswith(r) for r in roots) for p in paths
            ):
                del sys.modules[name]
        for p in self._inserted:
            while p in sys.path:
                sys.path.remove(p)
        self._inserted = []
