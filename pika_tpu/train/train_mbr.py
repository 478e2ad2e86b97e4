"""MBR training CLI — train_transducer_mbr_bmuf_otfaug equivalent.

Continues from an RNN-T bundle (``--init_model`` is required, matching
egs/train_transducer_mbr_bmuf_otfaug.sh:43) and fine-tunes with the
expected-edit-distance objective interpolated with ``--rnnt_scale`` × the
RNN-T loss.  Periodic temp checkpoints every ``--tmp_save_batches``
(reference: every 3000 batches, train_transducer_mbr:246-250).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from pika_tpu.decode.beam import BeamConfig
from pika_tpu.train import common
from pika_tpu.train.bundle import load_bundle, save_bundle
from pika_tpu.train.mbr import make_mbr_step
from pika_tpu.train.step import TrainState
from pika_tpu.data.loader import prefetch_iter
from pika_tpu.train.train_transducer import batch_stream, to_device_batch
from pika_tpu.utils.logger import Logger


def build_parser():
    parser = argparse.ArgumentParser(description="Transducer MBR training")
    parser.add_argument("data_lst", type=str)
    parser.add_argument("log", type=str)
    parser.add_argument("output_dir", type=str)
    common.add_loader_args(parser)
    common.add_model_args(parser)
    common.add_train_args(parser)
    parser.add_argument("--beam_size", type=int, default=4)
    parser.add_argument("--sm_scale", type=float, default=1.0)
    parser.add_argument("--rnnt_scale", type=float, default=0.0)
    parser.add_argument("--decode_max_symbols", type=int, default=220)
    parser.add_argument("--tmp_save_batches", type=int, default=3000)
    common.add_utt_loader_args(parser)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.init_model:
        raise SystemExit("MBR training requires --init_model (an RNN-T bundle)")
    args.num_devices = args.num_devices or 1
    log_f = open(args.log.replace("WORKER-ID", "0"), "w")

    if args.loader == "utt":
        if not args.ali_rspec:
            raise SystemExit("--loader utt requires --ali_rspec (ark:label.txt)")
        featurizer, input_dim = common.feats_featurizer_from_args(args)
    else:
        featurizer, input_dim, _ = common.featurizer_from_args(args)
    model, variables, _ = load_bundle(args.init_model)
    tx = common.optimizer_from_args(args)
    loader_cfg = common.loader_cfg_from_args(args)

    beam_cfg = BeamConfig(
        beam_size=args.beam_size, n_best=args.beam_size,
        sm_scale=args.sm_scale, max_symbols=args.decode_max_symbols,
        prune_dups=False,  # reference decodes with beam_prune=False (:87)
    )
    step = make_mbr_step(
        model, tx, featurizer, beam_cfg,
        rnnt_scale=args.rnnt_scale, sm_scale=args.sm_scale,
        loss_chunk=args.loss_chunk, loss_backend=args.loss_backend,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
    )

    def bundle_vars():
        v = {"params": jax.device_get(state.params)}
        if state.batch_stats is not None:
            v["batch_stats"] = jax.device_get(state.batch_stats)
        return v
    key = jax.random.PRNGKey(args.seed)
    num_done = 0
    import time as _time

    for epoch in range(args.num_epochs):
        log_f.write(f"===> Epoch {epoch} <===\n")
        logger = Logger(log_f, args.log_per_n_frames, ["MBR Loss", "RNNT Loss"])
        pending = []
        t_epoch = _time.perf_counter()
        n_utts = 0

        def drain():
            for m in pending:
                logger.update_and_log(
                    int(m["num_labels"]),
                    [float(m["mbr_loss"]), float(m["rnnt_loss"])],
                )
            pending.clear()

        for dev_batch in prefetch_iter(batch_stream(args, loader_cfg, epoch),
                                       transform=to_device_batch):
            key, sub = jax.random.split(key)
            state, metrics = step(state, dev_batch, sub)
            pending.append(metrics)
            n_utts += loader_cfg.batch_size
            if len(pending) >= 8:
                drain()
            num_done += 1
            if num_done % args.tmp_save_batches == 0:
                drain()
                save_bundle(f"{args.output_dir}/model.tmp", "transducer",
                            model.config, bundle_vars())
        drain()
        logger.summarize_and_log()
        dt = _time.perf_counter() - t_epoch
        log_f.write(f"===> Epoch {epoch} wall {dt:.1f}s, {n_utts} utts, "
                    f"{n_utts / max(dt, 1e-9):.1f} utt/s <===\n")
        save_bundle(f"{args.output_dir}/model.epoch.{epoch}", "transducer",
                    model.config, bundle_vars(), metadata={"epoch": epoch})
    log_f.write("Training Finished\n")
    log_f.close()


if __name__ == "__main__":
    main()
