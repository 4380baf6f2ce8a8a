"""Ablation timings for the training step on the real TPU chip.

Usage: python tools/ablate_train.py <config> [batch]

Configs time pieces of the train step with the same on-device
fori_loop slope method as bench.py (see .claude/skills/verify/SKILL.md for
why host-side timing through the axon tunnel is unusable).  Each config is
its own process so compiles stay bounded; the persistent compile cache
makes repeats cheap.

Configs:
  full       — the real mixed-precision train step (bench.py parity check)
  fwd_loss   — forward(train=True) + compute_losses, no grad
  fwd_bwd    — value_and_grad, no optimizer update
  opt_only   — optimizer update with frozen grads
  loss11     — full step but loss only reads the '1/1' scale (XLA DCEs the
               other out-convs + bilinear upsamples: measures their cost)
  naive_dec  — full step with the s2d fast paths disabled (naive
               upsample/concat decoder): isolates s2d backward cost
  enc_only   — grad of mean(encoder features): encoder fwd+bwd only
"""

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 192, 640


def _time_loop(chain, args, n_lo, n_hi):
    import jax.numpy as jnp

    def run(n):
        t0 = time.perf_counter()
        probe = chain(*args, jnp.int32(n))
        _ = np.asarray(probe)
        return time.perf_counter() - t0

    run(1)
    run(n_lo)
    # median of three ~1-2 s windows — same jitter rationale as bench.py
    import statistics
    per_iter = statistics.median(
        (run(n_hi) - run(n_lo)) / (n_hi - n_lo) for _ in range(3))
    return max(per_iter, 1e-9)


def make_batch(batch):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    return {k: jnp.asarray(np.asarray(v), jnp.float32) for k, v in {
        "image": rng.rand(batch, H, W, 3),
        "depth": rng.rand(batch, H, W) * 20,
        "visible_ground": rng.rand(batch, H, W) > 0.5,
        "all_ground": rng.rand(batch, H, W) > 0.4,
        "ground_depth": rng.rand(batch, H, W) * 15,
        "depth_mask": rng.rand(batch, H, W) > 0.6,
        "moving_object_mask": np.zeros((batch, H, W))}.items()}


def main():
    config = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/fp_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    # A/B backend compiler knobs: FOOTPRINTS_XLA_OPTS="k=v,k=v" routes
    # through jit(compiler_options=...) — the tunnel's remote compiler
    # validates and applies these, while TPU flags in XLA_FLAGS are
    # rejected by the local (CPU-client) flag parser and fatal.  Patches
    # jax.jit so build_train_step's internal jit sees them too, but scoped
    # with try/finally so the override cannot leak beyond the ablation
    # (advisor r4: the process-wide patch was never undone).
    opts = os.environ.get("FOOTPRINTS_XLA_OPTS", "")
    jit_orig = None
    if opts:
        co = dict(kv.split("=", 1) for kv in opts.split(",") if kv)
        print(f"compiler_options: {co}", flush=True)
        jit_orig = jax.jit
        jax.jit = lambda *a, **k: jit_orig(
            *a, compiler_options={**co, **k.pop("compiler_options", {})}, **k)
    try:
        _run(config, batch)
    finally:
        if jit_orig is not None:
            jax.jit = jit_orig


def _run(config, batch):
    import jax
    import jax.numpy as jnp

    from footprints_tpu.models import FootprintNetwork
    from footprints_tpu.nn import layers, blocks
    from footprints_tpu.train import TrainStepConfig, init_train_state
    from footprints_tpu.train.step import build_train_step, make_optimizer
    from footprints_tpu.train.losses import compute_losses, LossConfig

    layers.set_default_precision("default")

    if config == "naive_dec":
        # force the naive composition everywhere
        orig_up = blocks.up_concat_block

        def naive_up(params, state, x, skip, **kw):
            kw["fast"] = False
            return orig_up(params, state, x, skip, **kw)

        def naive_tail(conv_params, conv_state, out_params, x, *, apply_sigmoid,
                       out_scale=1, use_elu=True, train=False):
            x = layers.upsample_nearest(x, 2)
            x, ns = blocks.conv_block(conv_params, conv_state, x,
                                      use_elu=use_elu, train=train)
            y = blocks.out_conv_block(out_params, x, scale=out_scale,
                                      apply_sigmoid=apply_sigmoid)
            return y, ns

        blocks.up_concat_block = naive_up
        blocks.decoder_tail = naive_tail

    net = FootprintNetwork(depth=34)
    b = make_batch(batch)
    cfg = TrainStepConfig(steps_per_epoch=1000, compute_dtype="bfloat16")
    ts = init_train_state(net, jax.random.PRNGKey(0), cfg)
    lcfg = LossConfig()

    def cast_params(params):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a is not None else None, params)

    if config in ("full", "naive_dec"):
        raw_step = build_train_step(net, cfg, mesh=False)

        @jax.jit
        def chain(ts, n):
            def body(_, carry):
                carry, _m = raw_step(carry, b)
                return carry
            carry = jax.lax.fori_loop(0, n, body, ts)
            return jax.tree.leaves(carry["params"])[0].ravel()[0]

        sec = _time_loop(chain, (ts,), 1, 25)

    elif config == "fwd_loss":
        @jax.jit
        def chain(ts, n):
            params, state = ts["params"], ts["state"]

            def body(_, acc):
                fp = cast_params(params)
                out, _ = net.apply(fp, state, (b["image"] + acc * 1e-9).astype(jnp.bfloat16), train=True)
                losses = compute_losses(out, b, lcfg)
                return losses["loss"]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        sec = _time_loop(chain, (ts,), 2, 30)

    elif config == "fwd_bwd":
        def loss_fn(params, state, image):
            fp = cast_params(params)
            out, _ = net.apply(fp, state, image.astype(jnp.bfloat16), train=True)
            return compute_losses(out, b, lcfg)["loss"]

        @jax.jit
        def chain(ts, n):
            params, state = ts["params"], ts["state"]

            def body(_, acc):
                g = jax.grad(loss_fn)(params, state, b["image"] + acc * 1e-9)
                return jax.tree.leaves(g)[0].ravel()[0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        sec = _time_loop(chain, (ts,), 1, 25)

    elif config == "opt_only":
        opt = make_optimizer(cfg)
        grads = jax.tree.map(lambda a: jnp.ones_like(a) * 1e-6, ts["params"])

        @jax.jit
        def chain(ts, n):
            def body(_, carry):
                params, opt_state = carry
                g = jax.tree.map(lambda a, p: a + p.ravel()[0] * 1e-12, grads, params)
                updates, opt_state = opt.update(g, opt_state, params)
                import optax
                params = optax.apply_updates(params, updates)
                return (params, opt_state)
            params, opt_state = jax.lax.fori_loop(0, n, body, (ts["params"], ts["opt_state"]))
            return jax.tree.leaves(params)[0].ravel()[0]

        sec = _time_loop(chain, (ts,), 4, 60)

    elif config == "loss11":
        opt = make_optimizer(cfg)

        def loss_fn(params, state, image):
            fp = cast_params(params)
            out, new_state = net.apply(fp, state, image.astype(jnp.bfloat16), train=True)
            losses = compute_losses({"1/1": out["1/1"]}, b, lcfg)
            return losses["loss"], new_state

        @jax.jit
        def chain(ts, n):
            def body(_, carry):
                params, state, opt_state = carry
                grads, new_state = jax.grad(loss_fn, has_aux=True)(params, state, b["image"])
                updates, opt_state = opt.update(grads, opt_state, params)
                import optax
                params = optax.apply_updates(params, updates)
                return (params, new_state, opt_state)
            params, state, opt_state = jax.lax.fori_loop(
                0, n, body, (ts["params"], ts["state"], ts["opt_state"]))
            return jax.tree.leaves(params)[0].ravel()[0]

        sec = _time_loop(chain, (ts,), 1, 25)

    elif config == "bwd_sgd":
        # grad + plain SGD update: params are a LOOP VARIABLE but no Adam,
        # no state threading, no metrics — isolates "params carried through
        # the loop" from everything else
        def loss_fn(params, image):
            fp = cast_params(params)
            out, _ = net.apply(fp, ts["state"], image.astype(jnp.bfloat16), train=True)
            return compute_losses(out, b, lcfg)["loss"]

        @jax.jit
        def chain(ts, n):
            def body(_, params):
                g = jax.grad(loss_fn)(params, b["image"])
                return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
            params = jax.lax.fori_loop(0, n, body, ts["params"])
            return jax.tree.leaves(params)[0].ravel()[0]

        sec = _time_loop(chain, (ts,), 1, 25)

    elif config == "bwd_adam":
        # grad + Adam update, carry (params, opt_state); still no BN-state
        # threading and no metrics dict
        opt = make_optimizer(cfg)

        def loss_fn(params, image):
            fp = cast_params(params)
            out, _ = net.apply(fp, ts["state"], image.astype(jnp.bfloat16), train=True)
            return compute_losses(out, b, lcfg)["loss"]

        @jax.jit
        def chain(ts, n):
            def body(_, carry):
                params, opt_state = carry
                g = jax.grad(loss_fn)(params, b["image"])
                updates, opt_state = opt.update(g, opt_state, params)
                import optax
                params = optax.apply_updates(params, updates)
                return (params, opt_state)
            params, _ = jax.lax.fori_loop(0, n, body, (ts["params"], ts["opt_state"]))
            return jax.tree.leaves(params)[0].ravel()[0]

        sec = _time_loop(chain, (ts,), 1, 25)

    elif config == "enc_only":
        from footprints_tpu.nn import resnet

        def loss_fn(params, state, image):
            fp = cast_params(params)
            feats, _ = resnet.encoder_apply(fp["encoder"], state["encoder"],
                                            image.astype(jnp.bfloat16), depth=34, train=True)
            return sum(jnp.mean(f.astype(jnp.float32)) for f in feats)

        @jax.jit
        def chain(ts, n):
            params, state = ts["params"], ts["state"]

            def body(_, acc):
                g = jax.grad(loss_fn)(params, state, b["image"] + acc * 1e-9)
                return jax.tree.leaves(g["encoder"])[0].ravel()[0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        sec = _time_loop(chain, (ts,), 2, 30)

    else:
        raise SystemExit(f"unknown config {config}")

    print(json.dumps({"config": config, "batch": batch,
                      "ms_per_step": round(sec * 1e3, 3),
                      "imgs_per_sec": round(batch / sec, 2)}))


if __name__ == "__main__":
    main()
