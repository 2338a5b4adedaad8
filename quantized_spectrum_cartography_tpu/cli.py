"""Command-line interface: qsc simulate | recover | train-prior | sweep | bench.

The reference has no CLI at all — control flow lives in notebook cells and
MATLAB scripts (SURVEY.md section 1).  Usage:

    python -m quantized_spectrum_cartography_tpu.cli simulate --out maps.npz
    python -m quantized_spectrum_cartography_tpu.cli recover --solver lowrank \
        --fixture /root/reference/qmc/onebitdata1.mat
    python -m quantized_spectrum_cartography_tpu.cli train-prior --kind gan
    python -m quantized_spectrum_cartography_tpu.cli sweep --fractions 0.05 0.1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _cmd_simulate(args):
    import jax
    from quantized_spectrum_cartography_tpu.config import PhysicsConfig
    from quantized_spectrum_cartography_tpu.physics import generate_map_batch

    cfg = PhysicsConfig(num_emitters=args.emitters,
                        shadow_sigma=args.shadow_sigma,
                        decorrelation_distance=args.xc,
                        psd_basis=args.basis)
    T, S, C, peaks = generate_map_batch(
        jax.random.PRNGKey(args.seed), cfg, args.batch)
    np.savez(args.out, T=np.asarray(T), S=np.asarray(S), C=np.asarray(C),
             peaks=np.asarray(peaks))
    print(f"wrote {args.batch} maps to {args.out} "
          f"(T {tuple(T.shape)}, S {tuple(S.shape)}, C {tuple(C.shape)})")


def _cmd_recover(args):
    import jax
    import jax.numpy as jnp
    from quantized_spectrum_cartography_tpu.config import (
        PhysicsConfig, QuantizerConfig, SolverConfig)
    from quantized_spectrum_cartography_tpu.data import load_onebit_fixture
    from quantized_spectrum_cartography_tpu.ops import boundaries as B
    from quantized_spectrum_cartography_tpu.ops.quantizer import (
        dither_probit, quantize_log)
    from quantized_spectrum_cartography_tpu.physics import (
        generate_onebit_problem, sample_entry_mask)
    from quantized_spectrum_cartography_tpu.solvers import (
        recover_lowrank_mle)

    file_cfg = None
    if args.config:
        from quantized_spectrum_cartography_tpu.config import (
            load_config_file)
        file_cfg = load_config_file(args.config)

    key = jax.random.PRNGKey(file_cfg.seed if file_cfg else args.seed)
    pcfg = file_cfg.physics if file_cfg else PhysicsConfig()
    if args.fixture:
        prob = load_onebit_fixture(args.fixture)
    else:
        prob = generate_onebit_problem(
            key, pcfg,
            sample_fraction=(file_cfg.solver.sample_fraction
                             if file_cfg else args.fraction))
    R, I, J, K = prob.shape

    if args.solver == "lowrank":
        T_obs = dither_probit(
            jax.random.fold_in(key, 1), prob.T_true - prob.mean_slf, args.std)
        scfg = file_cfg.solver if file_cfg else SolverConfig(
            max_iters=args.iters, s_inner_iters=5,
            c_inner_iters=5, lr_s=0.001, lr_c=0.001)
        S0 = jnp.zeros((R, I, J))
        C0 = jnp.full((R, K), 0.01)
        res = recover_lowrank_mle(T_obs, S0, C0, scfg, prob.mean_slf,
                                  args.std, T_true=prob.T_true)
    elif args.solver in ("mle-gan", "dowjons"):
        from quantized_spectrum_cartography_tpu.solvers import (
            recover_dowjons, recover_mle_gan)

        gen, z_dim = _load_prior(args, key)
        if file_cfg and file_cfg.quantizer.num_bins > 0:
            qcfg = file_cfg.quantizer
        else:
            qcfg = QuantizerConfig(
                boundaries=B.QUANTIZATION_BOUNDARIES_4_BINS,
                noise_std=args.std if args.std > 0.1 else 5.0,
                log_offset=B.LOG_OFFSET_4)
        Y = quantize_log(jax.random.fold_in(key, 2), prob.T_true,
                         qcfg.noise_std,
                         jnp.asarray(np.array(qcfg.boundaries)),
                         qcfg.log_offset)
        mask = sample_entry_mask(jax.random.fold_in(key, 3),
                                 Y.shape, args.fraction)
        scfg = (dataclasses.replace(file_cfg.solver, z_dim=z_dim)
                if file_cfg else SolverConfig(max_iters=args.iters,
                                              z_dim=z_dim))
        fn = recover_mle_gan if args.solver == "mle-gan" else recover_dowjons
        res = fn(jax.random.fold_in(key, 4), Y, mask, gen, scfg, qcfg,
                 num_emitters=R, T_true=prob.T_true)
    else:
        raise SystemExit(f"unknown solver {args.solver}")

    out = {"solver": args.solver,
           "final_cost": float(res.costs[-1]),
           "final_nmse": float(res.nmses[-1]),
           "iters": int(res.costs.shape[0])}
    print(json.dumps(out))
    if args.out:
        np.savez(args.out, S=np.asarray(res.S), C=np.asarray(res.C),
                 T_hat=np.asarray(res.T_hat), nmses=np.asarray(res.nmses),
                 costs=np.asarray(res.costs),
                 T_true=np.asarray(prob.T_true),
                 S_true=np.asarray(prob.S_true),
                 C_true=np.asarray(prob.C_true))


def _load_prior(args, key):
    """Build the deep-prior generator fn from --prior-kind/--prior-checkpoint.

    'gan' loads a Generator256 checkpoint (training/gan_trainer.py layout);
    'vae' a VAE checkpoint whose decoder becomes G (the better-scoring
    prior: completion NMSE_S ~0.20 vs ~0.50 for the SNGAN at equal budget).
    """
    import jax
    import jax.numpy as jnp
    from quantized_spectrum_cartography_tpu.solvers import make_generator_apply
    from quantized_spectrum_cartography_tpu.training import load_checkpoint

    kind = getattr(args, "prior_kind", "vae")
    if kind == "gan":
        from quantized_spectrum_cartography_tpu.models import Generator256

        g = Generator256()
        if args.prior_checkpoint:
            state = load_checkpoint(args.prior_checkpoint)
            scale = float(state.pop("scale", 1.0))
            gvars = {"params": state["params"],
                     "batch_stats": state["batch_stats"]}
        else:
            print("warning: no --prior-checkpoint; using untrained prior",
                  file=sys.stderr)
            gvars = g.init(key, jnp.zeros((1, 256)), train=False)
            scale = 1.0
        raw = make_generator_apply(g, gvars)
        return ((lambda Z: raw(Z) / scale) if scale != 1.0 else raw), 256

    if kind == "vae":
        from quantized_spectrum_cartography_tpu.models import VAE

        path = args.prior_checkpoint or "checkpoints/vae_best/final"
        state = load_checkpoint(path)
        latent = int(state.pop("latent_dim", 64))
        beta = float(state.pop("beta", 0.5))
        amp = float(state.pop("amp", 0.26))
        vae = VAE(latent_dim=latent, beta=beta)

        def gen(Z):
            out = vae.apply(state, Z, train=False, method=VAE.decode)
            return out[..., 0] * amp

        return gen, latent
    raise SystemExit(f"unknown prior kind {kind}")


def _cmd_train_prior(args):
    import jax
    from quantized_spectrum_cartography_tpu.training import (
        AETrainConfig, GANTrainConfig, VAETrainConfig,
        train_ae, train_gan, train_vae)

    key = jax.random.PRNGKey(args.seed)
    if args.kind == "gan":
        cfg = GANTrainConfig(steps=args.steps, z_dim=args.z_dim,
                             batch_size=args.batch)
        train_gan(key, cfg, checkpoint_dir=args.checkpoint_dir)
    elif args.kind == "ae":
        train_ae(key, AETrainConfig(steps=args.steps, batch_size=args.batch),
                 checkpoint_dir=args.checkpoint_dir)
    elif args.kind == "vae":
        train_vae(key, VAETrainConfig(steps=args.steps,
                                      batch_size=args.batch),
                  checkpoint_dir=args.checkpoint_dir)
    elif args.kind == "aae":
        from quantized_spectrum_cartography_tpu.training.aae_trainer import (
            AAETrainConfig, train_aae)
        train_aae(key, AAETrainConfig(steps=args.steps, z_dim=args.z_dim,
                                      batch_size=args.batch),
                  checkpoint_dir=args.checkpoint_dir)
    else:
        raise SystemExit(f"unknown prior kind {args.kind}")


def _cmd_sweep(args):
    import jax
    import jax.numpy as jnp
    from quantized_spectrum_cartography_tpu.baselines import (
        run_sweep, tps_complete)
    from quantized_spectrum_cartography_tpu.baselines.spa import nmf_spa

    def tps_method(key, prob, f):
        idx = jnp.argwhere(prob.Om)
        T_obs = prob.T_true * prob.Om[None].astype(jnp.float32)
        return {"T_hat": tps_complete(T_obs, prob.Om, idx)}

    def spa_method(key, prob, f):
        K_, I_, J_ = prob.T_true.shape
        C_hat, S_flat = nmf_spa(prob.T_true.reshape(K_, -1),
                                prob.S_true.shape[0])
        S_hat = S_flat.reshape(-1, I_, J_)
        return {"T_hat": jnp.einsum("rij,rk->kij", S_hat, C_hat),
                "S_hat": S_hat, "C_hat": C_hat}

    results = run_sweep({"tps": tps_method, "nmf_spa": spa_method},
                        fractions=args.fractions,
                        num_examples=args.examples)
    print(json.dumps(results, indent=2))


def _cmd_conditions(args):
    """The full joint_opt_ae.m evaluation protocol: condition grid over
    one axis, reference metrics (SRE/NAE/miss/false), any registered
    methods.  Deep methods activate when checkpoints are supplied."""
    from quantized_spectrum_cartography_tpu.baselines import (
        condition_grid,
        run_conditions,
        standard_methods,
    )

    kwargs = {}
    if args.ae_checkpoint:
        from quantized_spectrum_cartography_tpu.models import Autoencoder
        from quantized_spectrum_cartography_tpu.training import load_checkpoint
        from quantized_spectrum_cartography_tpu.training.ae_trainer import (
            make_ae_completer,
            make_ae_input_fn,
            make_ae_latent_fns,
        )

        state = dict(load_checkpoint(args.ae_checkpoint))
        scale = float(state.pop("scale"))
        # activation is an architecture choice, not a parameter — a wrong
        # one loads silently and degrades completions, so it is a flag
        ae = Autoencoder(activation=args.ae_activation)
        kwargs["ae_complete"] = make_ae_completer(ae, state, scale)
        kwargs["ae_input_apply"] = make_ae_input_fn(ae, state, scale)
        kwargs["ae_latent_fns"] = make_ae_latent_fns(ae, state, scale)
    if args.vae_checkpoint:
        from quantized_spectrum_cartography_tpu.solvers.vae_prior import (
            load_vae_prior,
        )

        gen, z_dim, _ = load_vae_prior(args.vae_checkpoint)
        kwargs["gen_apply"] = gen
        kwargs["z_dim"] = z_dim

    methods = standard_methods(**kwargs)
    if args.methods:
        missing = [m for m in args.methods if m not in methods]
        if missing:
            raise SystemExit(
                f"methods {missing} unavailable (registered: "
                f"{sorted(methods)}; deep methods need --ae-checkpoint / "
                f"--vae-checkpoint)")
        methods = {m: methods[m] for m in args.methods}
    conds = condition_grid(args.axis)
    out = run_conditions(methods, conds, num_examples=args.examples,
                         seed=args.seed,
                         log_fn=print if args.verbose else None)
    print(json.dumps(out, indent=2))


def _cmd_report(args):
    import os

    from quantized_spectrum_cartography_tpu.utils import viz

    data = np.load(args.recovery)
    os.makedirs(args.out_dir, exist_ok=True)
    written = []

    def save(fig, name):
        path = os.path.join(args.out_dir, name)
        fig.savefig(path, dpi=args.dpi)
        written.append(path)

    bands = tuple(args.bands)
    save(viz.plot_recovery_panels(data["T_true"], data["T_hat"],
                                  bands=bands), "panels.png")
    save(viz.plot_recovery_panels(data["T_true"], data["T_hat"],
                                  bands=bands, log_offset=1e-10),
         "panels_log.png")
    save(viz.plot_factors(data["S"], data["C"],
                          S_true=data.get("S_true"),
                          C_true=data.get("C_true")), "factors.png")
    save(viz.plot_convergence({"nmse": data["nmses"]}), "nmse.png")
    save(viz.plot_convergence({"cost": data["costs"]}, ylabel="cost",
                              logy=False), "cost.png")
    save(viz.plot_map_value_histogram(data["T_true"], log_domain=True),
         "hist_log.png")
    print(json.dumps({"written": written}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="qsc")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("simulate", help="generate synthetic radio maps")
    ps.add_argument("--out", default="maps.npz")
    ps.add_argument("--batch", type=int, default=16)
    ps.add_argument("--emitters", type=int, default=2)
    ps.add_argument("--shadow-sigma", type=float, default=4.0)
    ps.add_argument("--xc", type=float, default=90.0)
    ps.add_argument("--basis", choices=["g", "s"], default="g")
    ps.add_argument("--seed", type=int, default=0)
    ps.set_defaults(fn=_cmd_simulate)

    pr = sub.add_parser("recover", help="run a recovery solver")
    pr.add_argument("--solver", choices=["lowrank", "mle-gan", "dowjons"],
                    default="lowrank")
    pr.add_argument("--fixture", default=None,
                    help=".mat fixture path (else simulate)")
    pr.add_argument("--fraction", type=float, default=0.1)
    pr.add_argument("--std", type=float, default=0.008)
    pr.add_argument("--iters", type=int, default=100)
    pr.add_argument("--prior-checkpoint", default=None)
    pr.add_argument("--prior-kind", choices=["gan", "vae"], default="vae")
    pr.add_argument("--out", default=None)
    pr.add_argument("--seed", type=int, default=0)
    pr.add_argument("--config", default=None,
                    help="INI/JSON config file ([physics] [quantizer] "
                         "[solver] sections); overrides the flag defaults")
    pr.set_defaults(fn=_cmd_recover)

    pt = sub.add_parser("train-prior", help="train GAN/AE/VAE prior")
    pt.add_argument("--kind", choices=["gan", "ae", "vae", "aae"],
                    default="gan")
    pt.add_argument("--steps", type=int, default=20000)
    pt.add_argument("--batch", type=int, default=64)
    pt.add_argument("--z-dim", type=int, default=256)
    pt.add_argument("--checkpoint-dir", default="checkpoints/prior")
    pt.add_argument("--seed", type=int, default=0)
    pt.set_defaults(fn=_cmd_train_prior)

    pp = sub.add_parser("report", help="render figures from a recovery "
                                       "(.npz from `recover --out`)")
    pp.add_argument("--recovery", required=True)
    pp.add_argument("--out-dir", default="report")
    pp.add_argument("--bands", type=int, nargs="+", default=[0, 24, 48])
    pp.add_argument("--dpi", type=int, default=110)
    pp.set_defaults(fn=_cmd_report)

    pw = sub.add_parser("sweep", help="baseline evaluation sweep")
    pw.add_argument("--fractions", type=float, nargs="+", default=[0.05, 0.1])
    pw.add_argument("--examples", type=int, default=3)
    pw.set_defaults(fn=_cmd_sweep)

    pc = sub.add_parser(
        "conditions", help="full joint_opt_ae.m condition-grid protocol")
    pc.add_argument("--axis", default=None,
                    choices=[None, "fraction", "num_emitters",
                             "shadow_sigma", "xc", "snr"],
                    help="reference sweep axis (default: base condition only)")
    pc.add_argument("--examples", type=int, default=1)
    pc.add_argument("--seed", type=int, default=0)
    pc.add_argument("--methods", nargs="+", default=None,
                    help="subset of registered methods (default: all)")
    pc.add_argument("--ae-checkpoint", default=None,
                    help="completion-AE checkpoint -> deepcomp/nasdac/dowjons_ae")
    pc.add_argument("--ae-activation", default="selu",
                    help="activation the AE was trained with "
                    "(AETrainConfig.activation; not stored in the checkpoint)")
    pc.add_argument("--vae-checkpoint", default=None,
                    help="VAE prior checkpoint -> dowjons")
    pc.add_argument("--verbose", action="store_true")
    pc.set_defaults(fn=_cmd_conditions)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
