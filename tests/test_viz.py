"""Visualization smoke tests (Agg backend, figures written to tmp)."""

import numpy as np

from quantized_spectrum_cartography_tpu.utils import viz


def test_viz_figures(tmp_path):
    rng = np.random.default_rng(0)
    T_true = rng.uniform(0, 0.01, (8, 16, 16))
    T_hat = T_true + 0.001 * rng.normal(size=T_true.shape)
    S = rng.uniform(0, 0.1, (2, 16, 16))
    C = rng.uniform(0, 1, (2, 8))

    figs = {
        "panels": viz.plot_recovery_panels(T_true, T_hat, bands=(0, 4)),
        "panels_log": viz.plot_recovery_panels(T_true, T_hat, bands=(0,),
                                               log_offset=1e-10),
        "factors": viz.plot_factors(S, C, S_true=S, C_true=C),
        "conv": viz.plot_convergence({"nmse": np.geomspace(1, 0.1, 20)}),
        "hist": viz.plot_map_value_histogram(
            T_true, log_domain=True,
            boundaries=(-25.0, -12.0, -9.0, -7.0)),
        "grid": viz.plot_multiple(rng.uniform(0, 1, (5, 16, 16, 1)),
                                  cols=3, titles=list("abcde")),
    }
    for name, fig in figs.items():
        out = tmp_path / f"{name}.png"
        fig.savefig(str(out), dpi=60)
        assert out.stat().st_size > 1000, name
