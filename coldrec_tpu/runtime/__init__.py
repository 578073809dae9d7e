from .trainer import BaseColdStartTrainer, Config
from .checkpoints import save_embeddings, load_embeddings
from .serving import RetrievalServer

__all__ = [
    "BaseColdStartTrainer", "Config", "save_embeddings",
    "load_embeddings", "RetrievalServer",
]
