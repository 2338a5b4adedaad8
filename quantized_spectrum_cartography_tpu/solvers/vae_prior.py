"""VAE-decoder deep prior: construction, encoder-init, checkpoint glue.

The reference exclusively uses an SNGAN prior (qmc.ipynb) but its VAE code
(deep_prior/networks/vae.py) trains the same family of decoders.  In this
framework the VAE decoder is the *better* prior for inversion-based
recovery (measured prior-completion NMSE_S ~0.20 vs ~0.50 for the SNGAN
at equal budget): smooth latent geometry + an encoder that provides
amortized initialization, replacing the reference's 400+200 randomized z
search with one forward pass.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from quantized_spectrum_cartography_tpu.models import VAE

DEFAULT_AMP = 0.26   # mean SLF peak of simulator maps; the VAE trains on
                     # peak-normalized targets (data/datasets.py)

# decoder head stored in checkpoints as an int (Orbax round-trips arrays,
# not strings); order must match models/ae.Decoder.head options
HEAD_CODES = ("sigmoid", "softplus", "scaled_sigmoid")


def make_vae_generator(
    variables,
    latent_dim: int = 64,
    beta: float = 0.5,
    amp: float = DEFAULT_AMP,
    head: str = "sigmoid",
    dec_width: int = 16,
    refine_width: int = 0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Decoder as G: Z [N, latent] -> SLFs [N, I, J] at SLF amplitude."""
    vae = VAE(latent_dim=latent_dim, beta=beta, head=head,
              dec_width=dec_width, refine_width=refine_width)

    def gen(Z):
        out = vae.apply(variables, Z, train=False, method=VAE.decode)
        return out[..., 0] * amp

    return gen


def encoder_init(
    variables,
    mask: jnp.ndarray,
    observed: jnp.ndarray,
    latent_dim: int = 64,
    beta: float = 0.5,
    amp: float = DEFAULT_AMP,
) -> jnp.ndarray:
    """Amortized latent init: encode (mask || masked map / amp) -> mean.

    Replaces randomized_search for VAE priors; input convention matches
    the training batches (mask channel + peak-normalized map channel).
    observed may be [I, J] or [R, I, J]; returns z [1 or R, latent].
    """
    vae = VAE(latent_dim=latent_dim, beta=beta)
    obs = observed if observed.ndim == 3 else observed[None]
    m = jnp.broadcast_to(mask, obs.shape)
    inp = jnp.stack([m, obs * m / amp], axis=-1)
    mean, _ = vae.apply(variables, inp, train=False, method=VAE.encode)
    return mean


def load_vae_prior(path: str) -> Tuple[Callable, int, dict]:
    """Load a checkpoint written by tools/ or training/vae_trainer and
    return (gen_fn, latent_dim, variables)."""
    from quantized_spectrum_cartography_tpu.training import load_checkpoint

    state = dict(load_checkpoint(path))
    latent = int(state.pop("latent_dim", 64))
    beta = float(state.pop("beta", 0.5))
    amp = float(state.pop("amp", DEFAULT_AMP))
    head = HEAD_CODES[int(state.pop("head_code", 0))]
    dec_width = int(state.pop("dec_width", 16))
    refine_width = int(state.pop("refine_width", 0))
    gen = make_vae_generator(state, latent, beta, amp, head, dec_width,
                             refine_width)
    return gen, latent, state
