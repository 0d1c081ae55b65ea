"""Full-step gradient equivalence: Pallas attention path vs XLA path.

Computes the contrastive-pass and MAE-pass parameter gradients of the full
ViT-B model at B=4 under both attention implementations and reports the
global gradient cosine + norms. Measured on v5e (round 2):
contrastive 0.999937, MAE 0.999962, norms matching to 4 digits — the custom
kernels' gradients are equivalent to XLA autodiff at bf16 noise level.
"""

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from avsiam_tpu.configs import CAVMAEConfig, OptimizerConfig, PretrainConfig
from avsiam_tpu.models import CAVMAEPretrain
from avsiam_tpu.train.pretrain import init_state

B = 4
rng = jax.random.PRNGKey(0)
a = jax.random.normal(rng, (B, 1024, 128), jnp.float32)
v = jax.random.normal(rng, (B, 3, 224, 224), jnp.float32)

grads = {}
for attn in ("auto", "xla"):
    mcfg = CAVMAEConfig(dtype=jnp.bfloat16, attn_impl=attn, mmixed_impl="exact")
    cfg = PretrainConfig(model=mcfg, opt=OptimizerConfig(lr=2e-4), batch_size=B)
    model = CAVMAEPretrain(mcfg)
    state = init_state(rng, model, cfg, (a, v))

    def loss(params, con):
        out = model.apply({"params": params}, a, v, 0.25, 0.25,
                          mae_loss_weight=1.0 - con, contrast_loss_weight=con,
                          rngs={"mask": jax.random.PRNGKey(1),
                                "perm": jax.random.PRNGKey(2)})
        return out[0]

    g1 = jax.jit(jax.grad(lambda p: loss(p, 1.0)))(state.params)
    g2 = jax.jit(jax.grad(lambda p: loss(p, 0.0)))(state.params)
    grads[attn] = (jax.device_get(g1), jax.device_get(g2))

for pi, name in ((0, "contrastive"), (1, "mae")):
    worst = (1.0, "")
    flat_a, _ = jax.flatten_util.ravel_pytree(grads["auto"][pi])
    flat_x, _ = jax.flatten_util.ravel_pytree(grads["xla"][pi])
    ca = np.asarray(flat_a, np.float64); cx = np.asarray(flat_x, np.float64)
    cos = ca @ cx / (np.linalg.norm(ca) * np.linalg.norm(cx) + 1e-30)
    print(f"{name}: global grad cosine(auto-pallas, xla) = {cos:.6f}  "
          f"|auto|={np.linalg.norm(ca):.4f} |xla|={np.linalg.norm(cx):.4f}")
