"""Experimental Pallas ELL SpMM vs the XLA ELL path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from coldrec_tpu.data.synthetic import synthetic_dataset
from coldrec_tpu.ops.pallas.spmm import spmm_ell_pallas_padded
from coldrec_tpu.ops.spmm import _ell_apply, build_ell


def test_pallas_ell_matches_xla(rng):
    data, _ = synthetic_dataset(n_users=70, n_items=50, n_inter=1000, seed=13)
    host = data.norm_adj
    ell = build_ell(host)
    x = jnp.asarray(
        rng.standard_normal((host.shape[0], 16)).astype(np.float32)
    )
    ref = _ell_apply(ell, x)
    got = spmm_ell_pallas_padded(
        x, ell.ell_cols, ell.ell_vals, tile_r=32, interpret=True
    )
    tail = jax.ops.segment_sum(
        x[ell.tail_cols] * ell.tail_vals[:, None],
        ell.tail_rows,
        num_segments=ell.n_rows,
        indices_are_sorted=True,
    )
    np.testing.assert_allclose(
        np.asarray(got + tail), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
