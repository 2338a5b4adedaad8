"""Multi-bit (2/4/8-level) quantized likelihood sweep over a batch of 64
maps (BASELINE.json config 3): batched ordinal-MLE low-rank recovery at
each bit depth, reporting NMSE statistics and throughput."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

t0 = time.time()
print("backend:", jax.default_backend(), flush=True)

from quantized_spectrum_cartography_tpu.config import (
    PhysicsConfig, QuantizerConfig, SolverConfig)
from quantized_spectrum_cartography_tpu.ops import boundaries as B
from quantized_spectrum_cartography_tpu.ops.likelihood import (
    gather_bin_bounds, log_prob_probit_bounds, masked_nll)
from quantized_spectrum_cartography_tpu.ops.lowrank import (
    get_tensor, project_nonneg, project_rank, safe_fro)
from quantized_spectrum_cartography_tpu.ops.metrics import nmse
from quantized_spectrum_cartography_tpu.ops.quantizer import quantize_log
from quantized_spectrum_cartography_tpu.physics import generate_map_batch
import optax

BATCH = 64
PCFG = PhysicsConfig()

CONFIGS = {
    "2-level (1-bit log)": (B.QUANTIZATION_BOUNDARIES_4_BINS_LOG[:1]
                            + (B.QUANTIZATION_BOUNDARIES_4_BINS_LOG[2],)
                            + (B.QUANTIZATION_BOUNDARIES_4_BINS_LOG[-1],),
                            B.LOG_OFFSET_4, 1.287),
    "4-level (2-bit)": (B.QUANTIZATION_BOUNDARIES_4_BINS_LOG,
                        B.LOG_OFFSET_4, 1.287),
    "8-level (3-bit adj)": (B.QUANTIZATION_BOUNDARIES_7_ADJUSTED,
                            B.LOG_OFFSET_7_ADJUSTED, 0.5),
}

T, S_true, C_true, _ = generate_map_batch(jax.random.PRNGKey(0), PCFG, BATCH)
print(f"[{time.time()-t0:5.0f}s] generated {BATCH} maps", flush=True)


def batched_ordinal_mle(Y, bb, offset, sigma, mask, T_true,
                        iters=300, lr=0.02, R=2):
    """Batched free-factor ordinal MLE (multi-bit analogue of the 1-bit
    low-rank solver): Adam on (S, C) of the masked bin likelihood with
    periodic nonneg/rank projection."""
    Bn, K, I, J = Y.shape
    Wb, Ub = jax.vmap(lambda y: gather_bin_bounds(y, bb))(Y)
    opt = optax.adam(lr)

    def one_loss(S, C, Wb, Ub, m):
        x = jnp.log(jnp.maximum(get_tensor(S, C), 0.0) + offset)
        return (masked_nll(log_prob_probit_bounds(Wb, Ub, x, sigma), m)
                + 0.01 * safe_fro(C))

    def loss(params):
        S, C = params
        return jnp.sum(jax.vmap(one_loss)(S, C, Wb, Ub, mask))

    S0 = 0.01 * jnp.abs(jax.random.normal(jax.random.PRNGKey(1),
                                          (Bn, R, I, J)))
    C0 = 0.01 * jnp.ones((Bn, R, K))
    params = (S0, C0)
    state = opt.init(params)

    def step(carry, i):
        params, state = carry
        l, g = jax.value_and_grad(loss)(params)
        up, state = opt.update(g, state, params)
        S, C = optax.apply_updates(params, up)
        S, C = jax.lax.cond(
            (i + 1) % 25 == 0,
            lambda sc: (project_nonneg(project_rank(sc[0], 10)),
                        project_nonneg(sc[1])),
            lambda sc: sc, (S, C))
        return ((S, C), state), l

    (params, _), losses = jax.lax.scan(step, (params, state),
                                       jnp.arange(iters))
    S, C = params
    T_hat = jax.vmap(get_tensor)(S, C)
    errs = jax.vmap(nmse)(T_hat, T_true)
    return errs, losses


solver = jax.jit(batched_ordinal_mle, static_argnames=())

for name, (bb_t, offset, sigma) in CONFIGS.items():
    bb = jnp.asarray(np.array(bb_t), jnp.float32)
    Y = jax.vmap(lambda t, k: quantize_log(k, t, sigma, bb, offset))(
        T, jax.random.split(jax.random.PRNGKey(2), BATCH))
    mask = jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.1, Y.shape).astype(jnp.float32)
    t1 = time.time()
    errs, losses = batched_ordinal_mle(Y, bb, offset, sigma, mask, T)
    errs = np.asarray(jax.device_get(errs))
    dt = time.time() - t1
    print(f"[{time.time()-t0:5.0f}s] {name}: NMSE mean {errs.mean():.4f} "
          f"median {np.median(errs):.4f} p10 {np.percentile(errs,10):.4f} "
          f"| {BATCH/dt:.1f} maps/s (incl compile)", flush=True)

print("DONE", flush=True)
