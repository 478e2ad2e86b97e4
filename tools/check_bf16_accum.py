"""Verify the shipped Pallas loss-backward configuration at flagship scale.

VERDICT round-2 weak #6: the backward input-grad kernel accumulates its
``dh`` scratch in bf16 (``rnnt_pallas.py`` scratch_shapes — an f32
accumulator exceeds the 16 MB scoped-VMEM limit), an accepted ~0.4%
gradient error, but the shipped configuration had only been compared to
XLA at small shapes.  This tool runs the comparison at the flagship's
actual loss shapes and (optionally) over a short training run:

Measured on the v5e (2026-08-17, B8/T'250/U40/H1024/V6268): worst
pallas grad rel-L2 error vs the true-f32 reference is 0.64% (d_gx);
the chunked-XLA path's own default-precision (bf16-MXU) error vs the
same reference is 0.37% — so the kernel's bf16 scratch adds ~0.5% in
quadrature on top of the bf16-matmul error every TPU path already has.
50-step flagship training curves from identical init/batch/keys track
within 0.1% for ~30 steps, then diverge chaotically (as any sub-ulp
perturbation does under momentum on a collapsing loss) while both
continue to the same loss band.

1. grad check — d(ax,gx,ay,gy,w2,b2) from loss_backend=pallas vs the
   chunked-XLA f32 path at B=8, T'=250 (1000 input frames / stride 4),
   U=40, H=1024, V=6268; reports per-tensor relative L2 error.
2. ``--steps N`` — N flagship train steps with each backend from the
   same init/batch/keys; reports the per-step loss curves side by side.

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/check_bf16_accum.py --steps 50
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import numpy as np

B, TP, U, H, V = 8, 250, 40, 1024, 6268


def rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30))


def grad_check(jax, jnp):
    from pika_tpu.ops.rnnt_loss import rnnt_loss_fused

    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(H)
    args = dict(
        ax=jnp.asarray(rng.standard_normal((B, TP, H)).astype(np.float32)),
        gx=jnp.asarray(rng.standard_normal((B, TP, H)).astype(np.float32)),
        ay=jnp.asarray(rng.standard_normal((B, U + 1, H)).astype(np.float32)),
        gy=jnp.asarray(rng.standard_normal((B, U + 1, H)).astype(np.float32)),
        w2=jnp.asarray((rng.standard_normal((H, V)) * scale).astype(np.float32)),
        b2=jnp.asarray(np.zeros((V,), np.float32)),
    )
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    t_len = jnp.asarray(np.full((B,), TP, np.int32))
    u_len = jnp.asarray(np.full((B,), U, np.int32))

    names = list(args)

    def loss_of(backend):
        def f(*leaves):
            kw = dict(zip(names, leaves))
            losses = rnnt_loss_fused(
                kw["ax"], kw["gx"], kw["ay"], kw["gy"], kw["w2"], kw["b2"],
                labels, t_len, u_len, 16, backend)
            return jnp.sum(losses) / (B * U)
        return jax.jit(jax.value_and_grad(f, argnums=tuple(range(len(names)))))

    leaves = [args[n] for n in names]
    l_p, g_p = loss_of("pallas")(*leaves)
    l_x, g_x = loss_of("xla")(*leaves)
    # high-precision reference: the chunked-XLA path with true-f32 matmuls
    # (3-pass bf16 on the MXU).  TPU XLA's DEFAULT f32 matmul is a single
    # bf16 multiply, so plain pallas-vs-xla compares two approximations;
    # errors below are each path's distance from this reference.
    with jax.default_matmul_precision("float32"):
        l_h, g_h = loss_of("xla")(*leaves)
    print(f"loss pallas={float(l_p):.6f} xla={float(l_x):.6f} "
          f"hp={float(l_h):.6f}")
    worst = 0.0
    g_p, g_x, g_h = jax.device_get((g_p, g_x, g_h))
    for n, gp, gx_, gh in zip(names, g_p, g_x, g_h):
        ep, ex = rel_l2(gp, gh), rel_l2(gx_, gh)
        worst = max(worst, ep)
        print(f"d_{n:3s} rel L2 err vs hp: pallas={ep:.4e} "
              f"xla-default={ex:.4e}")
    print(f"WORST pallas grad rel L2 err vs hp = {worst:.4e} "
          f"({'OK, within the measured 0.64% envelope' if worst < 1e-2 else 'REGRESSION: exceeds 1%'})")
    return worst


def curve_check(jax, jnp, n_steps):
    """Same init/batch/keys, train with each backend; loss curves should
    track within SGD-noise distance."""
    from pika_tpu.features import FbankConfig
    from pika_tpu.models import TransducerConfig, init_transducer
    from pika_tpu.train import (
        FeaturizerConfig, TrainState, make_featurizer, make_optimizer,
        make_train_step,
    )

    sr, seconds = 16000, 10.0
    max_samples = int(sr * seconds)
    featurizer = make_featurizer(FeaturizerConfig(
        fbank=FbankConfig(sample_frequency=sr, window_type="hamming",
                          dither=1.0, low_freq=40.0, high_freq=-200.0,
                          num_mel_bins=80),
        max_samples=max_samples, lctx=1, rctx=1, stride=1,
        spec_augment=False,  # keep the two runs' only delta the backend
    ))
    cfg = TransducerConfig(
        input_dim=240, vocab_size=V, hid_dim=1024,
        encoder_type="tdnn_transformer", decoder_type="rnn",
        enc_layers=9, dec_layers=2, embd_dim=100,
        tdnn_nhid=1024, tdnn_layers=9,
    )
    rng = np.random.default_rng(0)
    batch = {
        "wavs": jnp.asarray((rng.standard_normal((B, max_samples)) * 4000).astype(np.float32)),
        "wav_lens": jnp.asarray(np.full(B, max_samples, np.int32)),
        "labels": jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32)),
        "label_lens": jnp.asarray(np.full(B, U, np.int32)),
    }
    tx = make_optimizer("sgd", initial_lr=0.003, final_lr=0.0001,
                        total_batches=100000, momentum=0.9, grad_clip=3.0)
    curves = {}
    for backend in ("pallas", "xla"):
        model, variables = init_transducer(jax.random.PRNGKey(0), cfg,
                                           max_t=80, max_u=8)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats=variables.get("batch_stats"),
        )
        step_fn = make_train_step(model, tx, featurizer, loss_chunk=16,
                                  loss_backend=backend, donate=False)
        losses = []
        key = jax.random.PRNGKey(7)
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub)
            losses.append(float(metrics["loss"]) / (B * U))
            if (i + 1) % 10 == 0:
                print(f"  {backend} step {i + 1}: {losses[-1]:.4f}",
                      file=sys.stderr)
        curves[backend] = np.array(losses)
    p, x = curves["pallas"], curves["xla"]
    rel = np.abs(p - x) / np.abs(x)
    print(f"curve: {n_steps} steps, per-step |pallas-xla|/|xla| "
          f"mean={rel.mean():.2e} max={rel.max():.2e}")
    print("first/last 5 steps pallas:", np.round(p[:5], 4), np.round(p[-5:], 4))
    print("first/last 5 steps xla:   ", np.round(x[:5], 4), np.round(x[-5:], 4))
    return rel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=0,
                    help="also run an N-step training-curve comparison")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].platform}", file=sys.stderr)
    worst = grad_check(jax, jnp)
    if args.steps:
        curve_check(jax, jnp, args.steps)
    sys.exit(0 if worst < 1e-2 else 1)


if __name__ == "__main__":
    main()
