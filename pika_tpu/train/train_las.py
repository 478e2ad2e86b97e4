"""LAS rescorer training CLI — train_las_bmuf_otfaug equivalent.

Trains the forward rescorer; pass ``--reverse_labels`` for the backward
rescorer (README.md:81-84).  ``--shared_encoder_model`` freezes an RNN-T
bundle's encoder as the LAS input (train_las:512-518);
``--pretrain_decoder`` runs decoder-only LM pretraining.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from pika_tpu.models.las import LASConfig, init_las
from pika_tpu.train import common
from pika_tpu.train.bundle import load_bundle, save_bundle
from pika_tpu.train.las_step import make_las_train_step
from pika_tpu.train.step import TrainState
from pika_tpu.data.loader import prefetch_iter
from pika_tpu.train.train_transducer import batch_stream, to_device_batch
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
    args.num_devices = args.num_devices or 1
    log_f = open(args.log.replace("WORKER-ID", "0"), "w")

    args.spec_augment = getattr(args, "spec_augment", False)
    if args.loader == "utt":
        if not args.ali_rspec:
            raise SystemExit("--loader utt requires --ali_rspec (ark:label.txt)")
        featurizer, input_dim = common.feats_featurizer_from_args(args)
    else:
        featurizer, input_dim, _ = common.featurizer_from_args(args)
    loader_cfg = common.loader_cfg_from_args(args)

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

    step = make_las_train_step(
        model, tx, featurizer, shared, shared_vars,
        args.dec_loss_scale, args.enc_loss_scale, args.pretrain_decoder,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
    )
    key = jax.random.PRNGKey(args.seed)
    sampling_prob = args.sampling_prob
    for epoch in range(args.num_epochs):
        # scheduled-sampling ramp (train_las:185-190)
        if args.sampling_decoder and epoch >= args.increase_sampling_prob_epoch:
            sampling_prob = min(0.4, sampling_prob + 0.1)
        log_f.write(f"===> Epoch {epoch} (sampling_prob {sampling_prob}) <===\n")
        logger = Logger(log_f, args.log_per_n_frames, ["Loss"])
        pending = []
        import time as _time

        t_epoch = _time.perf_counter()
        n_utts = 0
        for dev_batch in prefetch_iter(batch_stream(args, loader_cfg, epoch),
                                       transform=to_device_batch):
            key, sub = jax.random.split(key)
            state, metrics = step(state, dev_batch, sub,
                                  jnp.asarray(sampling_prob, jnp.float32))
            pending.append(metrics)
            n_utts += loader_cfg.batch_size
            if len(pending) >= 8:
                for m in pending:
                    logger.update_and_log(int(m["num_labels"]), [float(m["loss"])])
                pending = []
        for m in pending:
            logger.update_and_log(int(m["num_labels"]), [float(m["loss"])])
        logger.summarize_and_log()
        dt = _time.perf_counter() - t_epoch
        log_f.write(f"===> Epoch {epoch} wall {dt:.1f}s, {n_utts} utts, "
                    f"{n_utts / max(dt, 1e-9):.1f} utt/s <===\n")
        save_bundle(f"{args.output_dir}/model.epoch.{epoch}", "las", cfg,
                    {"params": jax.device_get(state.params)},
                    metadata={"epoch": epoch, "reverse_labels": args.reverse_labels})
    log_f.write("Training Finished\n")
    log_f.close()


if __name__ == "__main__":
    main()
