"""Standard method registry from the committed checkpoints.

One-call construction of the five published methods
(`backup/algorithms/joint_opt_ae.m:570-655`): TPS and BTD need no trained
model; DeepComp and Nasdac use the completion autoencoder
(`checkpoints/ae_completion`, trained by `training/ae_trainer.py` — the
reference ships its AE as a stripped checkpoint, `deep_comp.py:14-16`);
DowJons uses the deep generative prior (`checkpoints/vae_peak_z256`,
the round-4 softplus-head z256 VAE — see VAE_HEADS.json; the reference
used an SNGAN generator, `qmc/qmc_utils.py:22-33` — asymmetry disclosed
in RESULTS.md).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
AE_CKPT = os.path.join(REPO_ROOT, "checkpoints", "ae_completion", "final")
VAE_CKPT = os.path.join(REPO_ROOT, "checkpoints", "vae_peak_z256")


def load_pretrained_methods(
    ae_ckpt: str = AE_CKPT,
    vae_ckpt: str = VAE_CKPT,
    only: Optional[tuple] = None,
    **standard_kwargs,
) -> Dict:
    """Build `standard_methods` with the committed AE completer and VAE
    prior.  `only` restricts the returned registry (e.g. the
    miss-detection protocol needs just deepcomp/nasdac/dowjons)."""
    from quantized_spectrum_cartography_tpu.baselines.harness import (
        standard_methods)
    from quantized_spectrum_cartography_tpu.models import Autoencoder
    from quantized_spectrum_cartography_tpu.solvers.vae_prior import (
        load_vae_prior)
    from quantized_spectrum_cartography_tpu.training import load_checkpoint
    from quantized_spectrum_cartography_tpu.training.ae_trainer import (
        make_ae_completer, make_ae_latent_fns)

    state = dict(load_checkpoint(ae_ckpt))
    scale = float(state.pop("scale"))
    ae_model = Autoencoder(activation="selu")
    ae_complete = make_ae_completer(ae_model, state, scale)
    ae_latent_fns = make_ae_latent_fns(ae_model, state, scale)
    gen, z_dim, _ = load_vae_prior(vae_ckpt)
    methods = standard_methods(gen_apply=gen, z_dim=z_dim,
                               ae_complete=ae_complete,
                               ae_latent_fns=ae_latent_fns,
                               **standard_kwargs)
    if only is not None:
        # strict: a name that doesn't resolve raises instead of being
        # silently dropped — after the round-5 alias cleanup ("dowjons"
        # replaced the "dowjons_gan" key) a stale `only` spelling would
        # otherwise yield an empty registry and an empty artifact
        unknown = [m for m in only if m not in methods]
        if unknown:
            raise KeyError(
                f"unknown method(s) {unknown}; registered: "
                f"{sorted(methods)} (note: the selected dowjons variant "
                f"is registered under the canonical name 'dowjons')")
        methods = {k: v for k, v in methods.items() if k in only}
    return methods
