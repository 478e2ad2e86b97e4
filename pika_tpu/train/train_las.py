"""LAS rescorer training CLI — train_las_bmuf_otfaug equivalent.

Trains the forward rescorer; pass ``--reverse_labels`` for the backward
rescorer (README.md:81-84).  ``--shared_encoder_model`` freezes an RNN-T
bundle's encoder as the LAS input (train_las:512-518);
``--pretrain_decoder`` runs decoder-only LM pretraining.

Distribution matches the reference's launch surface (the reference runs
this trainer under ``torch.distributed.launch`` with NCCL + BmufTrainer,
egs/train_las_rescorer_bmuf_otfaug.sh): ``--dp_mode sync`` shards the
batch over the device mesh; the BMUF variants run ``--sync_period``
independent local steps per device then a block update.  Multi-host via
``--coordinator_address``.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pika_tpu.models.las import LASConfig, init_las
from pika_tpu.models.transducer import Transducer
from pika_tpu.parallel.bmuf import BMUFConfig, bmuf_init, make_bmuf_round
from pika_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicate_tree, replicated,
)
from pika_tpu.train import common
from pika_tpu.train.bundle import load_bundle, save_bundle
from pika_tpu.train.las_step import las_loss, make_las_train_step
from pika_tpu.train.step import TrainState, batch_inputs
from pika_tpu.data.loader import prefetch_iter
from pika_tpu.train.train_transducer import (
    _stack_batches, batch_stream, to_device_batch,
)
from pika_tpu.utils.logger import Logger


def build_parser():
    parser = argparse.ArgumentParser(description="LAS rescorer training")
    parser.add_argument("data_lst", type=str)
    parser.add_argument("log", type=str)
    parser.add_argument("output_dir", type=str)
    common.add_loader_args(parser)
    common.add_model_args(parser)
    common.add_train_args(parser)
    parser.add_argument("--padding_idx", type=int, default=-1)
    parser.add_argument("--global_attention", type=str, default="mlp",
                        choices=["dot", "general", "mlp"])
    parser.add_argument("--context_gate", type=str, default=None,
                        choices=[None, "source", "target", "both"])
    parser.add_argument("--coverage_attn", action="store_true",
                        help="coverage attention: attention keys see the "
                             "accumulated attention mass "
                             "(train_las_bmuf_otfaug.py:410-411, "
                             "global_attention.py:196-199)")
    parser.add_argument("--lambda_coverage", type=float, default=1.0,
                        help="parsed for flag parity "
                             "(train_las_bmuf_otfaug.py:412-413); the "
                             "reference parses this but never applies a "
                             "coverage penalty in its loss, and neither do "
                             "we (PARITY.md)")
    parser.add_argument("--use_downsampler", action="store_true")
    parser.add_argument("--downsampler_layers", type=int, default=1)
    parser.add_argument("--downsampler_rate", type=int, default=2)
    parser.add_argument("--sampling_decoder", action="store_true")
    parser.add_argument("--sampling_prob", type=float, default=0.0)
    parser.add_argument("--increase_sampling_prob_epoch", type=int, default=1000)
    parser.add_argument("--dec_loss_scale", type=float, default=1.0)
    parser.add_argument("--enc_loss_scale", type=float, default=0.0)
    parser.add_argument("--pretrain_decoder", action="store_true")
    parser.add_argument("--shared_encoder_model", type=str, default=None)
    common.add_utt_loader_args(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    from pika_tpu.utils.cache import enable_compilation_cache
    from pika_tpu.utils.platform import honor_platforms_env

    honor_platforms_env()
    enable_compilation_cache()
    proc_id, n_proc = common.maybe_distributed_init(args)
    # after distributed init: auto-resolving the RNG impl queries the
    # backend, which must not initialize XLA before initialize()
    common.configure_rng(args)
    is_main = proc_id == 0  # noqa: F841 — kept for symmetry; saves are collective
    if args.num_devices is None:
        # all visible devices, matching train_transducer and the
        # --num_devices help text (multi-host: the global device count)
        args.num_devices = jax.device_count()
    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    log_f = open(args.log.replace("WORKER-ID", str(proc_id)), "w")

    args.spec_augment = getattr(args, "spec_augment", False)
    if args.loader == "utt":
        if not args.ali_rspec:
            raise SystemExit("--loader utt requires --ali_rspec (ark:label.txt)")
        featurizer, input_dim = common.feats_featurizer_from_args(args)
    else:
        featurizer, input_dim, _ = common.featurizer_from_args(args)
    loader_cfg = common.loader_cfg_from_args(
        args, batch_size=args.batch_size * n_dev
    )

    shared = shared_vars = None
    las_input_dim = input_dim
    if args.shared_encoder_model:
        shared, shared_vars, _ = load_bundle(args.shared_encoder_model)
        las_input_dim = shared.config.hid_dim

    pad_idx = args.padding_idx if args.padding_idx >= 0 else args.output_dim
    cfg = LASConfig(
        input_dim=las_input_dim, output_dim=args.output_dim, pad_idx=pad_idx,
        rnn_size=args.rnn_size, enc_layers=args.enc_layers,
        dec_layers=args.dec_layers, embd_dim=args.embd_dim, brnn=args.brnn,
        dropout=args.dropout, attn_type=args.global_attention,
        coverage_attn=args.coverage_attn,
        context_gate=args.context_gate, use_downsampler=args.use_downsampler,
        downsampler_layers=args.downsampler_layers,
        downsampler_rate=args.downsampler_rate,
    )
    if args.init_model:
        model, variables, _ = load_bundle(args.init_model)
        cfg = model.config
    else:
        model, variables = init_las(jax.random.PRNGKey(args.seed), cfg)
    tx = common.optimizer_from_args(args)

    log_f.write(f"LAS training: devices {n_dev} ({args.dp_mode}), "
                f"processes {n_proc}\n")
    log_f.flush()

    key = jax.random.PRNGKey(args.seed)
    sampling_prob = args.sampling_prob

    def save_epoch(epoch, params):
        # every process calls: Orbax saves are collective (bundle.py)
        save_bundle(
            f"{args.output_dir}/model.epoch.{epoch}", "las", cfg,
            {"params": jax.device_get(params)},
            metadata={"epoch": epoch,
                      "reverse_labels": args.reverse_labels,
                      # what the rescorer consumes at decode time: the
                      # frozen transducer encoder's output (shared) or
                      # decode features (independent encoder) — recorded
                      # so eval_transducer dispatches on fact, not on a
                      # dim-equality heuristic (ADVICE r4)
                      "las_input": "enc" if args.shared_encoder_model
                                   else "feats"})

    if args.dp_mode == "sync":
        raw_step = make_las_train_step(
            model, tx, featurizer, shared, shared_vars,
            args.dec_loss_scale, args.enc_loss_scale, args.pretrain_decoder,
            jit=False,
        )
        rep, dsh = replicated(mesh), data_sharding(mesh)
        step = jax.jit(
            raw_step,
            in_shardings=(rep, dsh, rep, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            opt_state=tx.init(variables["params"]),
        )
        state = replicate_tree(state, mesh)

        for epoch in range(args.num_epochs):
            # scheduled-sampling ramp (train_las:185-190)
            if args.sampling_decoder and epoch >= args.increase_sampling_prob_epoch:
                sampling_prob = min(0.4, sampling_prob + 0.1)
            log_f.write(f"===> Epoch {epoch} (sampling_prob {sampling_prob}) <===\n")
            logger = Logger(log_f, args.log_per_n_frames, ["Loss"])
            pending = []
            t_epoch = time.perf_counter()
            n_utts = 0
            for dev_batch in prefetch_iter(
                    batch_stream(args, loader_cfg, epoch),
                    transform=lambda b: to_device_batch(b, dsh)):
                key, sub = jax.random.split(key)
                state, metrics = step(state, dev_batch, common.host_key(sub),
                                      np.float32(sampling_prob))
                pending.append(metrics)
                n_utts += loader_cfg.batch_size
                if len(pending) >= 8:
                    for m in pending:
                        logger.update_and_log(int(m["num_labels"]),
                                              [float(m["loss"])])
                    pending = []
            for m in pending:
                logger.update_and_log(int(m["num_labels"]), [float(m["loss"])])
            logger.summarize_and_log()
            dt = time.perf_counter() - t_epoch
            log_f.write(f"===> Epoch {epoch} wall {dt:.1f}s, {n_utts} utts, "
                        f"{n_utts / max(dt, 1e-9):.1f} utt/s <===\n")
            if ((epoch + 1) % max(args.save_interval, 1) == 0
                    or epoch == args.num_epochs - 1):
                save_epoch(epoch, state.params)
    else:
        # BMUF: the reference wraps this trainer in BmufTrainer too
        # (train_las_bmuf_otfaug.py:521).  sampling_prob rides in the batch
        # (per-utterance broadcast) so the round stays one compiled program
        # across the sampling ramp.
        def local_step(params, opt_state, extra, lbatch, lkey):
            del extra
            kf, kd = jax.random.split(lkey)
            sp = lbatch["sampling_prob"][0]
            lbatch = {k: v for k, v in lbatch.items() if k != "sampling_prob"}
            x, x_lens = batch_inputs(lbatch)
            feats, feat_lens = featurizer(kf, x, x_lens, True)
            if shared is not None:
                src = shared.apply(shared_vars, feats, feat_lens,
                                   method=Transducer.encode)
                src_lens = shared.apply(shared_vars, feat_lens,
                                        method=Transducer.encoder_out_len)
                src = jax.lax.stop_gradient(src)
            else:
                src, src_lens = feats, feat_lens

            def loss_fn(p):
                return las_loss(
                    model, p, src, src_lens, lbatch["labels"],
                    args.dec_loss_scale, args.enc_loss_scale,
                    args.pretrain_decoder, sp, kd,
                )

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["loss"] = loss
            return params, opt_state, None, metrics

        bcfg = BMUFConfig(
            variant=args.dp_mode,
            block_momentum=args.block_momentum, block_lr=args.block_lr,
            sync_period=args.sync_period,
        )
        bstate = replicate_tree(bmuf_init(variables["params"], bcfg), mesh)
        round_fn = make_bmuf_round(local_step, tx.init, bcfg, mesh)
        bsh = data_sharding(mesh, leading_unsharded=1)
        step_count = 0

        for epoch in range(args.num_epochs):
            if args.sampling_decoder and epoch >= args.increase_sampling_prob_epoch:
                sampling_prob = min(0.4, sampling_prob + 0.1)
            log_f.write(f"===> Epoch {epoch} (sampling_prob {sampling_prob}) <===\n")
            logger = Logger(log_f, args.log_per_n_frames, ["Loss"])
            t_epoch = time.perf_counter()
            n_utts = 0
            sp_now = sampling_prob  # freeze for the epoch's prefetch thread

            def group_rounds(stream, sp):
                pend = []
                for batch in stream:
                    batch = dict(batch)
                    batch["sampling_prob"] = np.full(
                        (loader_cfg.batch_size,), sp, np.float32)
                    pend.append(batch)
                    if len(pend) == args.sync_period:
                        yield pend
                        pend = []

            def stack_and_ship(pend):
                return {k: jax.device_put(v, bsh)
                        for k, v in _stack_batches(
                            pend, pad_values={"labels": pad_idx}).items()}

            # stack + H2D on the prefetch thread (overlaps device compute)
            for stacked in prefetch_iter(
                    group_rounds(batch_stream(args, loader_cfg, epoch), sp_now),
                    transform=stack_and_ship):
                key, sub = jax.random.split(key)
                bstate, _, ok, metrics = round_fn(
                    bstate, None, stacked, common.host_key(sub), step_count)
                step_count += args.sync_period
                n_utts += loader_cfg.batch_size * args.sync_period
                if not bool(ok):
                    log_f.write("NaN detected in BMUF sync — stopping\n")
                    sys.exit(1)
                logger.update_and_log(
                    int(np.asarray(metrics["num_labels"]).sum()),
                    [float(np.asarray(metrics["loss"]).sum())],
                )
            logger.summarize_and_log()
            dt = time.perf_counter() - t_epoch
            log_f.write(f"===> Epoch {epoch} wall {dt:.1f}s, {n_utts} utts, "
                        f"{n_utts / max(dt, 1e-9):.1f} utt/s <===\n")
            if ((epoch + 1) % max(args.save_interval, 1) == 0
                    or epoch == args.num_epochs - 1):
                save_epoch(epoch, bstate.params)

    log_f.write("Training Finished\n")
    log_f.close()


if __name__ == "__main__":
    main()
