"""Parity: 1-bit low-rank MLE on the reference fixture (onebitdata1.mat),
our JAX solver vs a faithful torch re-implementation of
backup/notebooks/onebit_lowrank.ipynb cell 1 semantics.

The reference is nondeterministic (fresh dither per run), so parity is
distributional: mean final NMSE over SEEDS runs, target |delta| <= 1e-2
(BASELINE.md north-star).  Runs on CPU (the reference is CPU-only).
"""

import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import torch

from quantized_spectrum_cartography_tpu.config import SolverConfig
from quantized_spectrum_cartography_tpu.data import load_onebit_fixture
from quantized_spectrum_cartography_tpu.ops.quantizer import dither_probit
from quantized_spectrum_cartography_tpu.solvers import recover_lowrank_mle

SEEDS = 3
MEAN, STD = 0.0005, 0.008     # onebit_lowrank.ipynb cell 1: mean_slf=0.0005
OUTER, INNER = 50, 10
L1, L2 = 0.0, 0.01
LR = 0.001

prob = load_onebit_fixture()
T_true_np = np.asarray(prob.T_true, np.float32)
R, I, J, K = prob.shape
t0 = time.time()


def torch_reference_run(seed):
    """onebit_lowrank.ipynb cell 1 semantics, vectorized reconstruction
    (loops replaced by einsum; identical math)."""
    torch.manual_seed(seed)
    T_true = torch.from_numpy(T_true_np)
    p = 0.5 * (1 + torch.erf((T_true - MEAN) / (STD * 1.414213)))
    T = torch.bernoulli(p)

    S = torch.nn.Parameter(0.01 * torch.randn(R, I, J))
    C = torch.nn.Parameter(0.01 * torch.rand(R, K))
    optS = torch.optim.Adam([S], lr=LR)
    optC = torch.optim.Adam([C], lr=LR)
    bce = torch.nn.BCELoss()

    def cost():
        T_hat = torch.einsum("rij,rk->kij", S, C)
        z = 0.5 * (1 + torch.erf((T_hat - MEAN) / (STD * 1.414213)))
        return (bce(z.clamp(1e-7, 1 - 1e-7), T)
                + L1 * torch.norm(S) + L2 * torch.norm(C))

    for i in range(OUTER):
        for _ in range(INNER):
            optS.zero_grad(); optC.zero_grad()
            c = cost(); c.backward(); optS.step()
        for _ in range(INNER):
            optS.zero_grad(); optC.zero_grad()
            c = cost(); c.backward(); optC.step()
        if (i + 1) % 5 == 0:
            with torch.no_grad():
                u, s, v = torch.svd(S)
                s[:, 10:] = 0
                S.copy_(u @ torch.diag_embed(s) @ v.transpose(-2, -1))
                C.clamp_(min=0)
    with torch.no_grad():
        T_hat = torch.einsum("rij,rk->kij", S, C)
        return float(torch.norm(T_hat - T_true) / torch.norm(T_true))


def jax_run(seed):
    key = jax.random.PRNGKey(seed)
    T_obs = dither_probit(key, prob.T_true - MEAN, STD)
    scfg = SolverConfig(max_iters=OUTER, s_inner_iters=INNER,
                        c_inner_iters=INNER, lr_s=LR, lr_c=LR,
                        projection_interval=5, rank_truncation=10,
                        projection_method="svd")  # parity: torch.svd semantics
    S0 = 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (R, I, J))
    C0 = 0.01 * jax.random.uniform(jax.random.fold_in(key, 2), (R, K))
    res = recover_lowrank_mle(T_obs, S0, C0, scfg, MEAN, STD,
                              l1=L1, l2=L2, T_true=prob.T_true)
    return float(res.nmses[-1])


torch_nmses = [torch_reference_run(s) for s in range(SEEDS)]
print(f"[{time.time()-t0:5.0f}s] torch reference NMSE: "
      f"{np.round(torch_nmses, 4).tolist()} mean {np.mean(torch_nmses):.4f}",
      flush=True)
jax_nmses = [jax_run(s) for s in range(SEEDS)]
print(f"[{time.time()-t0:5.0f}s] jax solver NMSE:      "
      f"{np.round(jax_nmses, 4).tolist()} mean {np.mean(jax_nmses):.4f}",
      flush=True)
delta = abs(float(np.mean(torch_nmses)) - float(np.mean(jax_nmses)))
print(f"PARITY delta = {delta:.4f} (target <= 0.01): "
      f"{'PASS' if delta <= 0.01 else 'FAIL'}", flush=True)
