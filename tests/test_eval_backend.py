"""--eval_backend pallas produces the same rec lists as the XLA path."""
import numpy as np

from coldrec_tpu.config import default_args
from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.models import model_factory
from coldrec_tpu.runtime.trainer import Config


def test_pallas_backend_matches_xla():
    data, _ = synthetic_dataset(
        n_users=50, n_items=60, n_inter=900, cold_object="item", seed=111
    )

    def run(backend):
        args = default_args(
            model="MF", dataset="synth", epochs=2, bs=128, emb_size=8,
            early_stop=5, seed=5, save_emb=False, eval_backend=backend,
        )
        m = model_factory(Config(args, data))
        m.run()
        return m

    xla = run("xla")
    pal = run("pallas")
    # identical training (same seed), so identical tables; the two sweep
    # backends must return the same metrics
    assert pal.overall_test_results == xla.overall_test_results
    assert pal.cold_test_results == xla.cold_test_results
    assert pal.warm_test_results == xla.warm_test_results
