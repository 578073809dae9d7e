from .losses import (
    bpr_loss,
    l2_reg_loss,
    mse_loss,
    triplet_loss,
    batch_softmax_loss,
    info_nce,
)
from .spmm import SparseGraph, spmm

__all__ = [
    "bpr_loss",
    "l2_reg_loss",
    "mse_loss",
    "triplet_loss",
    "batch_softmax_loss",
    "info_nce",
    "SparseGraph",
    "spmm",
]
