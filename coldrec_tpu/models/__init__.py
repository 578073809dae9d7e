"""Model registry (reference: model/__init__.py:28-55 AVAILABLE_MODELS).

Lazy imports keep startup light; ``AVAILABLE_MODELS[name]`` resolves to the
trainer class.
"""
from __future__ import annotations

import importlib
from typing import Dict

_MODEL_MODULES: Dict[str, str] = {
    # warm CF backbones
    "MF": "mf",
    "NGCF": "ngcf",
    "LightGCN": "lightgcn",
    "NCL": "ncl",
    "SimGCL": "simgcl",
    "XSimGCL": "xsimgcl",
    # cold-start models
    "KNN": "knn",
    "DeepMusic": "deepmusic",
    "DUIF": "duif",
    "VBPR": "vbpr",
    "AMR": "amr",
    "DropoutNet": "dropoutnet",
    "MTPR": "mtpr",
    "LARA": "lara",
    "Heater": "heater",
    "MetaEmbedding": "metaembedding",
    "CLCRec": "clcrec",
    "GAR": "gar",
    "GoRec": "gorec",
    "CCFCRec": "ccfcrec",
    "ALDI": "aldi",
    "AGNN": "agnn",
    "USIM": "usim",
    "CGRC": "cgrc",
    "FSGNN": "fsgnn",
    "M2VAE": "m2vae",
}


class _LazyRegistry(dict):
    def __contains__(self, name):
        return name in _MODEL_MODULES

    def get(self, name, default=None):
        try:
            return self[name]
        except KeyError:
            return default

    def __missing__(self, name):
        if name not in _MODEL_MODULES:
            raise KeyError(name)
        mod = importlib.import_module(
            f"coldrec_tpu.models.{_MODEL_MODULES[name]}"
        )
        cls = getattr(mod, name)
        self[name] = cls
        return cls

    def keys(self):
        return _MODEL_MODULES.keys()


AVAILABLE_MODELS = _LazyRegistry()


def model_factory(config):
    """Instantiate a trainer by config.args.model (reference main.py:60-80)."""
    name = config.args.model
    if name not in _MODEL_MODULES:
        raise ValueError(
            f"Invalid model name: {name}. "
            f"Available models: {list(_MODEL_MODULES.keys())}"
        )
    return AVAILABLE_MODELS[name](config)
