"""Dissect the pretrain step: time each stage of the two-pass step as its own
jitted program on the real chip, to locate the gap between the step's
effective FLOP rate and the chip's measured GEMM rate.

Usage: python scripts/dissect.py [stage ...]
Stages: p1fwd p1grad p2fwd p2grad adam mask attn attn_dec embed
(default: all). One process can time several stages; each compile through the
tunnel costs 1-5 min, so prefer a few stages per invocation.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

from avsiam_tpu.configs import CAVMAEConfig, OptimizerConfig, PretrainConfig
from avsiam_tpu.models import CAVMAEPretrain
from avsiam_tpu.train import param_groups as pg
from avsiam_tpu.train.pretrain import init_state, make_optimizers

B = 32


def timeit(name, fn, *args, iters=10, fetch=lambda out: out):
    out = fn(*args)
    float(jax.device_get(jnp.sum(fetch(out)).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        # fetch EVERY iteration: through the axon tunnel only a host fetch
        # proves execution (CLAUDE.md); unfetched dispatches may be deferred,
        # which would time ~1 execution instead of iters
        float(jax.device_get(jnp.sum(fetch(out)).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:28s}: {dt:8.2f} ms")
    return dt


def main():
    stages = sys.argv[1:] or ["p1fwd", "p1grad", "p2fwd", "p2grad", "adam",
                              "mask", "attn", "attn_dec", "embed"]
    model_cfg = CAVMAEConfig(dtype=jnp.bfloat16, attn_impl="pallas",
                             mmixed_impl="exact")
    cfg = PretrainConfig(model=model_cfg, opt=OptimizerConfig(lr=2e-4),
                         batch_size=B)
    model = CAVMAEPretrain(model_cfg)
    rng = jax.random.PRNGKey(0)
    vit = model_cfg.vit
    a = jax.random.normal(rng, (B, vit.audio_length, vit.mel_bins), jnp.float32)
    v = jax.random.normal(rng, (B, 3, vit.img_size, vit.img_size), jnp.float32)

    need_state = any(s in stages for s in
                     ("p1fwd", "p1grad", "p2fwd", "p2grad", "adam",
                      "dec", "mae_enc", "embed"))
    if need_state:
        state = init_state(rng, model, cfg, (a, v))
        params = state.params

        def loss_pass(params, mae_w, con_w):
            out = model.apply({"params": params}, a, v, 0.25, 0.25,
                              mae_loss_weight=mae_w,
                              contrast_loss_weight=con_w,
                              rngs={"mask": rng, "perm": rng})
            return out[0]

        if "p1fwd" in stages:
            f = jax.jit(functools.partial(loss_pass, mae_w=0.0, con_w=1.0))
            timeit("pass1 fwd (contrastive)", f, params)
        if "p1grad" in stages:
            f = jax.jit(jax.value_and_grad(
                functools.partial(loss_pass, mae_w=0.0, con_w=1.0)))
            timeit("pass1 value+grad", f, params, fetch=lambda o: o[0])
        if "p2fwd" in stages:
            f = jax.jit(functools.partial(loss_pass, mae_w=1.0, con_w=0.0))
            timeit("pass2 fwd (MAE)", f, params)
        if "p2grad" in stages:
            f = jax.jit(jax.value_and_grad(
                functools.partial(loss_pass, mae_w=1.0, con_w=0.0)))
            timeit("pass2 value+grad", f, params, fetch=lambda o: o[0])
        if "adam" in stages:
            tx1, tx2 = make_optimizers(cfg)
            grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)

            @jax.jit
            def adam2(state, grads):
                u1, o1 = tx1.update(grads, state.opt1, state.params)
                p1 = jax.tree_util.tree_map(
                    lambda p, u: p - 2e-4 * u, state.params, u1)
                u2, o2 = tx2.update(grads, state.opt2, p1)
                p2 = jax.tree_util.tree_map(lambda p, u: p - 2e-4 * u, p1, u2)
                return state._replace(params=p2, opt1=o1, opt2=o2)

            timeit("2x masked Adam (updates)", adam2, state, grads,
                   fetch=lambda s: s.params["vit"]["pos_embed"])

    if "dec" in stages and need_state:
        Dv = model_cfg.vit.dim
        x_in = jax.random.normal(rng, (B, 177, Dv), jnp.bfloat16)
        ra = jnp.tile(jnp.arange(512)[None], (B, 1))
        rv = jnp.tile(jnp.arange(196)[None], (B, 1))

        def dec_loss(params, x):
            def run(m, x):
                pa, pv = m.decoder(x, ra, rv, 128, 49)
                return (jnp.sum(pa.astype(jnp.float32)) +
                        jnp.sum(pv.astype(jnp.float32)))
            return model.apply({"params": params}, x, method=run)

        f = jax.jit(jax.grad(dec_loss, argnums=(0, 1)))
        timeit("decoder grad (177 kept)", f, params, x_in,
               fetch=lambda o: o[1])

    if "mae_enc" in stages and need_state:
        def enc_loss(params):
            def run(m):
                x, *_ = m.forward_encoder(a, v, 0.75, 0.75)
                return jnp.sum(x.astype(jnp.float32))
            return model.apply({"params": params}, method=run,
                               rngs={"mask": rng})
        f = jax.jit(jax.grad(enc_loss))
        timeit("MAE encoder grad", f, params,
               fetch=lambda o: o["vit"]["pos_embed"])

    if "restore" in stages:
        ids = jnp.tile(jnp.arange(708)[None], (B, 1))
        xx = jax.random.normal(rng, (B, 708, 512), jnp.bfloat16)

        def rest_loss(x):
            y = jnp.take_along_axis(x, ids[:, :, None], axis=1)
            return jnp.sum(y.astype(jnp.float32))

        f = jax.jit(jax.grad(rest_loss))
        timeit("take_along_axis 708x512 f+b", f, xx)

    if "mask" in stages:
        from avsiam_tpu.ops import masking as mk

        @jax.jit
        def masks(rng):
            toks = jnp.zeros((B, 512, 768), jnp.bfloat16)
            outs = []
            for i in range(10):
                r = jax.random.fold_in(rng, i)
                x, m, ids = mk.random_masking(r, toks, 128)
                outs.append(ids)
            return jnp.stack(outs)

        timeit("10x random_masking(512)", masks, rng)

    attn_stages = [s for s in stages if s.startswith("attn")]
    if attn_stages:
        from avsiam_tpu.ops.attention import pallas_attention, xla_attention

        shapes = {"attn": (B, 708, 12, 64), "attn_dec": (B, 708, 16, 32),
                  "attn_mid": (B, 512, 12, 64)}
        for s in attn_stages:
            base, _, variant = s.partition(":")
            shp = shapes[base]
            impl = xla_attention if variant == "xla" else pallas_attention

            def attn_loss(q, k, v, impl=impl):
                return jnp.sum(impl(q, k, v).astype(jnp.float32))

            q = jax.random.normal(rng, shp, jnp.bfloat16)
            f = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))
            timeit(f"{s} fwd+bwd {shp}", f, q, q, q, fetch=lambda o: o[0])

    if "embed" in stages:
        # patch embeds alone via the functional apply
        if need_state:
            @jax.jit
            def emb(params):
                def run(m):
                    ea = m.vit.embed_audio(a)
                    ev = m.vit.embed_video(v)
                    return jnp.sum(ea.astype(jnp.float32)) + jnp.sum(
                        ev.astype(jnp.float32))
                return model.apply({"params": params}, method=run)

            timeit("embed audio+video", emb, params)


if __name__ == "__main__":
    main()
