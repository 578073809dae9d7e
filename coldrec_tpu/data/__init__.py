from .loader import load_interaction_csv, load_split_dir
from .builder import ColdStartDataset

__all__ = ["load_interaction_csv", "load_split_dir", "ColdStartDataset"]
