"""Is NMSE ~0.79 a floor on the shipped fixture? (round-1 VERDICT weak #8)

Sweeps the torch reference re-implementation's OWN hyperparameters on
`onebitdata1.mat` — the sigma_probit grid the notebook itself sweeps
(onebit_lowrank.ipynb cell 1 sweeps sigma in {1e-5..0.04}), plus longer
runs and higher lr — and reports the best achievable NMSE.  If no
configuration materially beats the parity run's 0.79, the level is a
property of the 1-bit protocol on this fixture (T thresholded at
mean_slf destroys amplitude information), not of either implementation.

CPU-only (torch).  Writes FIXTURE_FLOOR.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import torch

from quantized_spectrum_cartography_tpu.data import load_onebit_fixture

MEAN = 0.0005
L1, L2 = 0.0, 0.01

prob = load_onebit_fixture()
T_true_np = np.asarray(prob.T_true, np.float32)
R, I, J, K = prob.shape
t0 = time.time()


def run(seed, std, outer, inner, lr, rank=10):
    torch.manual_seed(seed)
    T_true = torch.from_numpy(T_true_np)
    p = 0.5 * (1 + torch.erf((T_true - MEAN) / (std * 1.414213)))
    T = torch.bernoulli(p)
    S = torch.nn.Parameter(0.01 * torch.randn(R, I, J))
    C = torch.nn.Parameter(0.01 * torch.rand(R, K))
    optS = torch.optim.Adam([S], lr=lr)
    optC = torch.optim.Adam([C], lr=lr)
    bce = torch.nn.BCELoss()

    def cost():
        T_hat = torch.einsum("rij,rk->kij", S, C)
        z = 0.5 * (1 + torch.erf((T_hat - MEAN) / (std * 1.414213)))
        return (bce(z.clamp(1e-7, 1 - 1e-7), T)
                + L1 * torch.norm(S) + L2 * torch.norm(C))

    for i in range(outer):
        for _ in range(inner):
            optS.zero_grad(); optC.zero_grad()
            c = cost(); c.backward(); optS.step()
        for _ in range(inner):
            optS.zero_grad(); optC.zero_grad()
            c = cost(); c.backward(); optC.step()
        if (i + 1) % 5 == 0:
            with torch.no_grad():
                u, s, v = torch.svd(S)
                s[:, rank:] = 0
                S.copy_(u @ torch.diag_embed(s) @ v.transpose(-2, -1))
                C.clamp_(min=0)
    with torch.no_grad():
        T_hat = torch.einsum("rij,rk->kij", S, C)
        return float(torch.norm(T_hat - T_true) / torch.norm(T_true))


GRID = [
    # (std, outer, inner, lr) — std grid is the notebook's own sweep
    (1e-5, 50, 10, 1e-3), (1e-3, 50, 10, 1e-3), (0.008, 50, 10, 1e-3),
    (0.02, 50, 10, 1e-3), (0.04, 50, 10, 1e-3),
    (0.008, 200, 10, 1e-3),            # 4x iterations
    (0.008, 50, 10, 1e-2),             # 10x lr
    (0.02, 200, 10, 1e-2),             # both
]

rows = []
for std, outer, inner, lr in GRID:
    nm = [run(s, std, outer, inner, lr) for s in range(2)]
    rows.append({"std": std, "outer": outer, "lr": lr,
                 "nmse_mean": float(np.mean(nm)),
                 "nmse": [round(v, 4) for v in nm]})
    print(f"[{time.time()-t0:5.0f}s] std={std} outer={outer} lr={lr}: "
          f"NMSE {np.round(nm, 4).tolist()}", flush=True)

best = min(rows, key=lambda r: r["nmse_mean"])
out = {"rows": rows, "best": best,
       "parity_level": 0.7929,
       "floor_confirmed": bool(best["nmse_mean"] > 0.7929 - 0.05)}
with open("/root/repo/FIXTURE_FLOOR.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({"best": best, "floor_confirmed": out["floor_confirmed"]}),
      flush=True)
print("DONE", flush=True)
