from .metrics import ranking_evaluation, ranking_metrics
from .seeding import set_seed

__all__ = ["ranking_evaluation", "ranking_metrics", "set_seed"]
