"""Headline-algorithm parity: torch re-run of qmc.ipynb cell 1 vs our solver.

Round-1 pinned parity only for the 1-bit low-rank path
(tools/fixture_parity.py).  This harness applies the same methodology to
the reference's FLAGSHIP algorithm — 2-bit (4-bin) log-domain probit MLE
with a deep generative prior, alternating Adam, randomized z search
(`/root/reference/qmc/qmc.ipynb` cell 1; likelihood
`/root/reference/qmc/quantization_model_log.py:23-41`).

Methodology:
- The torch side is a from-scratch faithful re-implementation of the cell-1
  semantics (zero-start C, randn Z, Adam lr .005/.01, lambda_c=lambda_s=100,
  4-bin log boundaries, sigma=5, f=0.1 Bernoulli entry mask, maxIter=500,
  z search at i==1 with 200 global draws + 200 "local" draws — including the
  reference's stale-`temp_out` bug, which makes the local phase a no-op:
  the local criterion re-scores the LAST global candidate's output, so it
  never beats the running min).
- The prior is OUR canonical VAE decoder on BOTH sides (the reference's
  SNGAN checkpoint is stripped from its repo), bridged into torch autograd
  via a custom Function whose forward/backward call the jitted JAX decode
  and its VJP.  Identical prior by construction — the comparison isolates
  the solver.
- Observations Y and mask are generated once in JAX and shared bit-for-bit.
- Parity is distributional: >= --seeds problem instances; report
  NMSE / NMSE_LOG mean for both sides and the deltas.

    python tools/headline_parity.py --seeds 3 --iters 500 --out HEADLINE_PARITY.json
"""

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import torch

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.metrics import nmse, nmse_log
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import (
    generate_map, sample_entry_mask)
from quantized_spectrum_cartography_tpu.solvers import recover_mle_gan
from quantized_spectrum_cartography_tpu.solvers.vae_prior import load_vae_prior

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


# --------------------------------------------------------------------------
# torch <- JAX generator bridge: same prior on both sides by construction
# --------------------------------------------------------------------------

def make_torch_generator(gen_jax, z_dim):
    fwd = jax.jit(gen_jax)

    def vjp_fn(z, ct):
        _, pull = jax.vjp(gen_jax, z)
        return pull(ct)[0]

    bwd = jax.jit(vjp_fn)

    class _Gen(torch.autograd.Function):
        @staticmethod
        def forward(ctx, z):
            z_np = z.detach().cpu().numpy().astype(np.float32)
            ctx.save_for_backward(z)
            out = np.asarray(fwd(jnp.asarray(z_np)))
            return torch.from_numpy(out)

        @staticmethod
        def backward(ctx, grad_out):
            (z,) = ctx.saved_tensors
            g = np.asarray(bwd(
                jnp.asarray(z.detach().cpu().numpy().astype(np.float32)),
                jnp.asarray(grad_out.detach().cpu().numpy()
                            .astype(np.float32))))
            return torch.from_numpy(g)

    def generator(z):
        # reference generators emit [R, 1, I, J]; our gen emits [R, I, J]
        return _Gen.apply(z).unsqueeze(1)

    return generator


# --------------------------------------------------------------------------
# faithful torch re-implementation of qmc.ipynb cell 1 (the reference side)
# --------------------------------------------------------------------------

def torch_prob_probit(Y, X_hat, bb, noise_std):
    """P(Y|X) = Phi((U - X)/sigma) - Phi((W - X)/sigma); log-domain variant
    keeps the raw finite outer boundaries (quantization_model_log.py:23-41
    leaves the +-1e5 clamp commented out)."""
    W = bb[Y]
    U = bb[Y + 1]
    def F(y):
        return 0.5 * (1.0 + torch.erf(y / (noise_std * 1.414213)))
    return F(U - X_hat) - F(W - X_hat)


def torch_get_tensor(S, C):
    """sum_r S[r,0] outer C[r] -> [K, I, J] (quantization_model_log.py:80-96)."""
    return torch.einsum("rij,rk->kij", S[:, 0], C)


def run_torch_reference(Y_np, mask_np, T_true_np, generator, z_dim,
                        sigma, offset, bb_list, iters, seed):
    torch.manual_seed(seed)
    R, K = 2, Y_np.shape[0]
    bb = torch.tensor(bb_list, dtype=torch.float32)
    Y = torch.from_numpy(Y_np).long().unsqueeze(1)          # [K,1,I,J]
    Wx = torch.from_numpy(mask_np).float().unsqueeze(1)
    T_true = torch.from_numpy(T_true_np).float()

    Z = torch.randn((R, z_dim), dtype=torch.float32)
    C = torch.zeros((R, K), dtype=torch.float32)
    C.requires_grad = True
    Z.requires_grad = True
    optC = torch.optim.Adam([C], lr=0.005)
    optZ = torch.optim.Adam([Z], lr=0.01)

    lam_c = lam_s = 100.0

    def nll_of(T_hat):
        x = torch.log(T_hat.unsqueeze(1) + offset)
        return -torch.sum(Wx * torch.log(torch_prob_probit(Y, x, bb, sigma)))

    with torch.no_grad():
        S = generator(Z)

    nmses = np.zeros(iters)
    for i in range(iters):
        # C-step on detached S
        Sc = S.detach().clone()
        optC.zero_grad()
        cost = (nll_of(torch_get_tensor(Sc, C))
                + lam_c * torch.norm(C, "fro") + lam_s * torch.norm(Z, "fro"))
        cost.backward()
        optC.step()
        with torch.no_grad():
            C[C < 0] = 0

        # randomized z re-init at i==1 (cell 1): 200 global draws scored by
        # the likelihood; then 200 "local" draws whose criterion re-uses the
        # stale temp_out — reproduced faithfully (it is a no-op by
        # construction, see module docstring)
        if i == 1:
            with torch.no_grad():
                min_crit = torch.tensor(9999999.0)
                temp_out = None
                for _ in range(200):
                    temp = torch.randn((R, z_dim), dtype=torch.float32)
                    temp_out = generator(temp)
                    crit = (nll_of(torch_get_tensor(temp_out, C))
                            + lam_c * torch.norm(C, "fro")
                            + lam_s * torch.norm(temp_out, "fro"))
                    if crit < min_crit:
                        Z.data = temp.clone()
                        min_crit = crit
                for _ in range(200):
                    temp = 0.2 * torch.randn((R, z_dim)) + Z
                    crit = (nll_of(torch_get_tensor(temp_out, C))
                            + lam_c * torch.norm(C, "fro")
                            + lam_s * torch.norm(temp_out, "fro"))
                    if crit < min_crit:
                        Z.data = temp.clone()
                        min_crit = crit

        # S-step through the frozen generator
        optZ.zero_grad()
        S = generator(Z)
        cost = (nll_of(torch_get_tensor(S, C))
                + lam_c * torch.norm(C, "fro") + lam_s * torch.norm(Z, "fro"))
        cost.backward()
        optZ.step()

        with torch.no_grad():
            nmses[i] = float(
                torch.norm(torch_get_tensor(S, C) - T_true, "fro")
                / torch.norm(T_true, "fro"))

    with torch.no_grad():
        T_hat = torch_get_tensor(generator(Z), C).numpy()
    return T_hat, nmses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--prior", type=str,
                    default=os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                        "checkpoints/vae_best/final"))
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    gen, z_dim, _ = load_vae_prior(args.prior)
    torch_gen = make_torch_generator(gen, z_dim)
    log(f"prior loaded (latent {z_dim})")

    SIGMA = 5.0
    bb_list = [float(v) for v in B.QUANTIZATION_BOUNDARIES_4_BINS]
    offset = B.LOG_OFFSET_4
    qcfg = QuantizerConfig(boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                           noise_std=SIGMA, log_offset=offset)
    scfg = SolverConfig(max_iters=args.iters, z_dim=z_dim,
                        z_search_global=200, z_search_local=200)
    pcfg = PhysicsConfig()

    rows = []
    for s in range(args.seeds):
        T_true, _, _, _ = generate_map(jax.random.PRNGKey(100 + s), pcfg)
        T_true = jnp.maximum(T_true, 0.0)
        Y = quantize_log(jax.random.PRNGKey(200 + s), T_true, SIGMA,
                         jnp.asarray(np.array(bb_list)), offset)
        mask = sample_entry_mask(jax.random.PRNGKey(300 + s), Y.shape, 0.1)

        t_ref = time.time()
        T_hat_t, nm_t = run_torch_reference(
            np.asarray(Y), np.asarray(mask), np.asarray(T_true), torch_gen,
            z_dim, SIGMA, offset, bb_list, args.iters, seed=s)
        t_ref = time.time() - t_ref

        t_jax = time.time()
        res = recover_mle_gan(jax.random.PRNGKey(400 + s), Y, mask, gen,
                              scfg, qcfg, T_true=T_true)
        jax.block_until_ready(res.T_hat)
        t_jax = time.time() - t_jax

        row = {
            "seed": s,
            "torch_nmse": float(nmse(jnp.asarray(T_hat_t), T_true)),
            "jax_nmse": float(nmse(res.T_hat, T_true)),
            "torch_nmse_log": float(nmse_log(jnp.asarray(T_hat_t), T_true,
                                             offset)),
            "jax_nmse_log": float(nmse_log(res.T_hat, T_true, offset)),
            "torch_sec": round(t_ref, 1),
            "jax_sec": round(t_jax, 1),
        }
        rows.append(row)
        log(json.dumps(row))

    agg = {
        "config": "2-bit (4-bin log) probit MLE + deep prior, f=0.1, "
                  f"sigma=5, lambda=100, {args.iters} iters, "
                  f"{args.seeds} seeds",
        "torch_nmse_mean": float(np.mean([r["torch_nmse"] for r in rows])),
        "jax_nmse_mean": float(np.mean([r["jax_nmse"] for r in rows])),
        "torch_nmse_log_mean": float(np.mean([r["torch_nmse_log"]
                                              for r in rows])),
        "jax_nmse_log_mean": float(np.mean([r["jax_nmse_log"]
                                            for r in rows])),
        "per_seed": rows,
    }
    agg["delta_nmse"] = agg["jax_nmse_mean"] - agg["torch_nmse_mean"]
    agg["delta_nmse_log"] = (agg["jax_nmse_log_mean"]
                             - agg["torch_nmse_log_mean"])
    agg["parity"] = ("PASS" if agg["delta_nmse_log"] <= 1e-2 else "FAIL")
    log(json.dumps({k: v for k, v in agg.items() if k != "per_seed"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(agg, f, indent=1)


if __name__ == "__main__":
    main()
