"""TPU-native quantized spectrum cartography framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`shresthasagar/quantized_spectrum_cartography` (reference mounted at
/root/reference): recovery of radio-frequency power maps T = sum_r S_r o c_r
from heavily quantized (1..8 bit) sparse measurements via probit/logistic
maximum likelihood, low-rank factorization and deep (GAN / DIP / AE) priors.

Layout
------
- ``ops``       quantizer, likelihood, rank-R reconstruction, metrics, Pallas kernels
- ``physics``   synthetic radio-map simulator (path loss, correlated shadowing, PSDs)
- ``data``      fixtures (.mat loader) and dataset pipelines
- ``models``    deep prior networks (generators, DIP decoder, AEs, VAE, discriminators)
- ``training``  prior-training pipelines (SNGAN / AE / VAE) + Orbax checkpoints
- ``solvers``   jitted recovery loops (MLE-GAN, DowJons, low-rank MLE, DIP, GAN inversion)
- ``baselines`` classical algorithms (SPA/NMF, NNLS, TPS) + evaluation harness
- ``parallel``  device mesh, sharded batched recovery, host-side scheduler
"""

__version__ = "0.1.0"

from quantized_spectrum_cartography_tpu import config as config  # noqa: F401
