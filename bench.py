"""Benchmark: RNN-T training throughput (utterances/sec/chip) on the
flagship PIKA config — TDNN-Transformer encoder (9 layers, nhid 1024),
2-layer LSTM prediction net, vocab 6268, batch 8 × 10 s utterances —
running the FULL fused step: waveform → fbank → splice → CMVN →
SpecAugment → encoder/decoder/joint → fused RNN-T loss → SGD update,
as one XLA program on one chip.

Timing discipline (this PJRT transport does NOT reliably sync on
``block_until_ready`` and short-circuits repeated identical dispatches):
the N timed steps run inside ONE jitted ``lax.scan`` whose carry is the
TrainState — every step depends on the previous step's parameters, so no
step can be elided or overlapped away — and each repetition is ended by a
``float()`` host materialization of the final loss.  Two timed
repetitions are required to agree within 10% or the benchmark exits
non-zero.

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics (per-step ms, derived TFLOP/s, repetition spread) go to
stderr.  ``vs_baseline`` is null: the reference publishes no throughput
numbers (BASELINE.md), and its GPU stack cannot run here.
"""

import json
import sys
import time

import numpy as np

import os as _os

# BENCH_BATCH sweeps the train-step batch (VERDICT r2 weak #1: the
# reference's batch 8 is a 2017-era GPU constraint; a TPU-first framework
# should know its throughput-optimal batch).  The measured sweep
# (BASELINE.md round 3): 8/16/24/32 -> 79.8/82.5/84.2/84.9 utt/s; the
# headline default is the throughput-optimal 32.
BATCH = int(_os.environ.get("BENCH_BATCH", "32"))
# BENCH_RNG selects the dropout-RNG path; "auto" (default) matches the
# trainers' --rng_impl auto: TPU hardware RngBitGenerator on
# accelerators, threefry on CPU (see common.configure_rng).  threefry
# mask bits cost ~67 ms of the 372 ms batch-32 step (round-4 profile);
# rbg measured 95.4 vs 85.4 utt/s.  BENCH_RNG=threefry2x32 reproduces
# the round-3 configuration.
_RNG_IMPL = _os.environ.get("BENCH_RNG", "auto")
SECONDS = 10.0
SR = 16000
VOCAB = 6268
U_MAX = 40
N_STEPS = 10
N_REPS = 2
TOLERANCE = 0.10


def flop_model(t_frames: int, batch: int, u: int, pruned: int = 0) -> float:
    """Rough per-step training FLOPs for the flagship config (fwd ~= the
    matmul terms below; training ~= 3x fwd for fwd+bwd).  Dominant terms
    only — FFT, BatchNorm, softmax, elementwise are ignored, so this is a
    mild UNDERestimate; it exists to make implausible utt/s numbers
    self-evident, not to compute MFU precisely."""
    nhid = 1024
    t4 = t_frames // 4  # final TDNN layer has stride 4
    fwd = 0.0
    # 9 TDNN layers, kernel 3 in time: first maps 240->1024, rest 1024->1024;
    # the stride-4 layer only pays for t4 output frames.
    fwd += 2 * 3 * 240 * nhid * t_frames
    fwd += 2 * 3 * nhid * nhid * (7 * t_frames + t4)
    # 3 transformer layers (2 at full T, 1 at T/4): QKVO + scores + FFN(4x)
    for t in (t_frames, t_frames, t4):
        fwd += 2 * 4 * t * nhid * nhid          # q,k,v,o projections
        fwd += 2 * 2 * t * t * nhid             # scores + context
        fwd += 2 * 2 * t * nhid * (4 * nhid)    # ffn
    # 2-layer LSTM prediction net over U+1 symbols (8 matmuls of nhid^2/gate set)
    fwd += 2 * (u + 1) * 2 * 8 * nhid * nhid
    if pruned:
        # banded joint: vocab projection on s_range cells per frame, plus
        # the simple heads (H->V over T and U) and the exp-space
        # normalizer matmul (T x V x U)
        fwd += 2 * t4 * pruned * nhid * VOCAB
        fwd += 2 * (t4 + u + 1) * nhid * VOCAB
        fwd += 2 * t4 * (u + 1) * VOCAB
    else:
        # fused joint: per (t', u) position the vocab projection dominates
        fwd += 2 * t4 * (u + 1) * nhid * VOCAB
    fwd *= batch
    return 3.0 * fwd  # fwd + bwd


def wait_for_transport(budget_s: float = 1800.0, probe_timeout_s: float = 90.0):
    """The tunneled PJRT transport has multi-minute (observed: multi-hour)
    hang episodes that start/recover without local action.  Probe a trivial
    D2H in a SUBPROCESS (a wedged client call cannot be cancelled in-proc)
    and wait for recovery up to ``budget_s``, so a bench launched during an
    episode degrades to a late number instead of an infinite hang."""
    import subprocess
    import sys as _sys

    deadline = time.time() + budget_s
    probe = ("import jax, numpy as np, jax.numpy as jnp;"
             "print(float(np.asarray(jnp.arange(8.0)).sum()))")
    while True:
        try:
            r = subprocess.run([_sys.executable, "-c", probe],
                               timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(json.dumps({"metric": "train_throughput", "value": None,
                              "unit": "utt/s/chip", "vs_baseline": None,
                              "error": "device transport unreachable for "
                                       f"{budget_s:.0f}s"}))
            raise SystemExit(3)
        print("bench: device transport unresponsive; retrying", file=sys.stderr)
        time.sleep(30)


def main():
    import jax
    import jax.numpy as jnp

    rng_impl = _RNG_IMPL
    if rng_impl == "auto":
        rng_impl = "threefry2x32" if jax.default_backend() == "cpu" else "rbg"
    # unconditional: an explicit threefry pin must override any ambient
    # JAX_DEFAULT_PRNG_IMPL (ADVICE r4)
    jax.config.update("jax_default_prng_impl", rng_impl)

    from pika_tpu.features import FbankConfig
    from pika_tpu.models import TransducerConfig, init_transducer
    from pika_tpu.train import (
        FeaturizerConfig, TrainState, make_featurizer, make_optimizer,
        make_train_step,
    )

    max_samples = int(SR * SECONDS)

    fbank_cfg = FbankConfig(
        sample_frequency=SR, window_type="hamming", dither=1.0,
        low_freq=40.0, high_freq=-200.0, num_mel_bins=80,
    )
    featurizer = make_featurizer(
        FeaturizerConfig(
            fbank=fbank_cfg, max_samples=max_samples, lctx=1, rctx=1,
            stride=1, spec_augment=True,
        )
    )
    # BENCH_ATTN_CHUNK / BENCH_CHEAP_DROPOUT / BENCH_REMAT: attention-path
    # knobs.  BENCH_CHEAP_DROPOUT default "auto" matches the trainers'
    # --attn_cheap_dropout auto: the head-shared bits-threshold attention
    # dropout pairs with the hardware RNG on accelerators (unbiased;
    # measured 334.5 -> 312.5 ms/step at flagship batch 32); "0" forces
    # the per-head bernoulli path, "1" forces cheap.
    cheap_env = _os.environ.get("BENCH_CHEAP_DROPOUT", "auto")
    cheap = (rng_impl == "rbg") if cheap_env == "auto" else cheap_env == "1"
    # BENCH_PRUNED=N measures the pruned RNN-T objective (--pruned_loss_range
    # N in the trainers, ops/rnnt_pruned.py): the joint's B*T'*U*H*V output
    # projection — the loss slice that the round-4 profile showed at 97% of
    # its matmul roofline — shrinks to a per-frame band of N label
    # positions.  A different (industry-standard, k2-style) objective, so
    # it is a labeled row, not the default headline.
    pruned = int(_os.environ.get("BENCH_PRUNED", "0"))
    cfg = TransducerConfig(
        input_dim=240, vocab_size=VOCAB, hid_dim=1024,
        encoder_type="tdnn_transformer", decoder_type="rnn",
        enc_layers=9, dec_layers=2, embd_dim=100,
        tdnn_nhid=1024, tdnn_layers=9,
        attn_chunk=int(_os.environ.get("BENCH_ATTN_CHUNK", "0")),
        attn_cheap_dropout=cheap,
        remat=_os.environ.get("BENCH_REMAT", "") == "1",
        simple_joint=pruned > 0,
    )
    model, variables = init_transducer(jax.random.PRNGKey(0), cfg, max_t=80, max_u=8)
    tx = make_optimizer(
        "sgd", initial_lr=0.003, final_lr=0.0001, total_batches=100000,
        momentum=0.9, grad_clip=3.0,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
    )
    # loss_backend auto -> pallas on TPU.  BENCH_DTYPE=bfloat16 measures
    # mixed precision (bf16 activations, f32 master params/optimizer);
    # it is only ~1% faster here because JAX's default TPU matmul
    # precision already runs f32 matmuls as bf16 MXU multiplies with f32
    # accumulation, so bf16 compute saves activation bandwidth only
    # (measured 80.9 vs 79.8 utt/s) — f32 stays the headline.
    import os

    dtype_name = os.environ.get("BENCH_DTYPE", "float32")
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
    step_fn = make_train_step(model, tx, featurizer, loss_chunk=16, jit=False,
                              compute_dtype=compute_dtype,
                              pruned_range=pruned)

    rng = np.random.default_rng(0)
    batch = {
        "wavs": jnp.asarray((rng.standard_normal((BATCH, max_samples)) * 4000).astype(np.float32)),
        "wav_lens": jnp.asarray(np.full(BATCH, max_samples, np.int32)),
        "labels": jnp.asarray(rng.integers(1, VOCAB, (BATCH, U_MAX)).astype(np.int32)),
        "label_lens": jnp.asarray(np.full(BATCH, U_MAX, np.int32)),
    }

    def run_n(state, batch, key):
        """N train steps, dependency-chained through the TrainState carry."""
        def body(carry, _):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = step_fn(st, batch, sub)
            return (st, k), metrics["loss"]
        (state, _), losses = jax.lax.scan(
            body, (state, key), None, length=N_STEPS)
        return state, losses[-1]

    run_j = jax.jit(run_n, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, loss = run_j(state, batch, jax.random.PRNGKey(1))
    float(loss)  # host materialization = the only reliable sync here
    compile_s = time.perf_counter() - t0

    rep_times = []
    for rep in range(N_REPS):
        t0 = time.perf_counter()
        state, loss = run_j(state, batch, jax.random.PRNGKey(2 + rep))
        final_loss = float(loss)
        rep_times.append(time.perf_counter() - t0)

    spread = (max(rep_times) - min(rep_times)) / min(rep_times)
    step_ms = [t / N_STEPS * 1000 for t in rep_times]
    t_frames = 1 + (max_samples - 400) // 160  # Kaldi snip-edges frame count
    tflops = flop_model(t_frames, BATCH, U_MAX, pruned) / (min(rep_times) / N_STEPS) / 1e12
    print(
        f"bench: compile+warm {compile_s:.1f}s; "
        f"per-step ms per rep: {[f'{m:.1f}' for m in step_ms]}, "
        f"spread {spread * 100:.1f}%; "
        f"~{tflops:.1f} TFLOP/s (analytic matmul model, 3x-fwd training, "
        f"underestimates by ignoring FFT/norm/softmax); "
        f"final loss {final_loss:.1f}",
        file=sys.stderr,
    )
    if spread > TOLERANCE:
        print(
            f"bench: FAILED — timed repetitions disagree by "
            f"{spread * 100:.1f}% (> {TOLERANCE * 100:.0f}%): "
            f"{[f'{t:.3f}s' for t in rep_times]}; timing not trustworthy",
            file=sys.stderr,
        )
        sys.exit(1)

    utts_per_sec = BATCH * N_STEPS / min(rep_times)
    loss_tag = f", pruned loss s={pruned}" if pruned else ""
    print(json.dumps({
        "metric": "rnnt_train_utterances_per_sec_per_chip",
        "value": round(utts_per_sec, 3),
        "unit": f"utt/s (10s utts, batch {BATCH}, flagship TDNN-Transformer "
                f"RNN-T, fused wav->loss step, {dtype_name} compute"
                f"{loss_tag})",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    wait_for_transport()
    main()
