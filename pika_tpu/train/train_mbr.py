"""MBR training CLI — train_transducer_mbr_bmuf_otfaug equivalent.

Continues from an RNN-T bundle (``--init_model`` is required, matching
egs/train_transducer_mbr_bmuf_otfaug.sh:43) and fine-tunes with the
expected-edit-distance objective interpolated with ``--rnnt_scale`` × the
RNN-T loss.  Periodic temp checkpoints every ``--tmp_save_batches``
(reference: every 3000 batches, train_transducer_mbr:246-250).

Distribution matches the reference's launch surface (the reference runs
this trainer under ``torch.distributed.launch`` with NCCL + BmufTrainer,
egs/train_transducer_mbr_bmuf_otfaug.sh:33-43): ``--dp_mode sync`` shards
the batch over the device mesh with per-step gradient pmean; the BMUF
variants run ``--sync_period`` independent local steps per device then a
block update.  Multi-host via ``--coordinator_address`` (all hosts run the
same command; the mesh spans the pod/DCN topology).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pika_tpu.decode.beam import BeamConfig, beam_search
from pika_tpu.models.transducer import Transducer
from pika_tpu.parallel.bmuf import BMUFConfig, bmuf_init, make_bmuf_round
from pika_tpu.parallel.dp import jit_dp
from pika_tpu.parallel.mesh import data_sharding, make_mesh, replicate_tree
from pika_tpu.train import common
from pika_tpu.train.bundle import load_bundle, save_bundle
from pika_tpu.train.mbr import make_mbr_step, mbr_losses
from pika_tpu.train.step import TrainState, batch_inputs
from pika_tpu.data.loader import prefetch_iter
from pika_tpu.train.train_transducer import (
    _stack_batches, batch_stream, to_device_batch,
)
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
    from pika_tpu.utils.cache import enable_compilation_cache
    from pika_tpu.utils.platform import honor_platforms_env

    honor_platforms_env()
    enable_compilation_cache()
    if not args.init_model:
        raise SystemExit("MBR training requires --init_model (an RNN-T bundle)")
    proc_id, n_proc = common.maybe_distributed_init(args)
    # after distributed init: auto-resolving the RNG impl queries the
    # backend, which must not initialize XLA before initialize()
    common.configure_rng(args)
    is_main = proc_id == 0  # noqa: F841 — kept for symmetry; saves are collective
    # single-device default preserves the one-chip flagship behavior; a
    # multi-host launch spans every device in the pod unless told otherwise
    if args.num_devices is None:
        # all visible devices, matching train_transducer and the
        # --num_devices help text (multi-host: the global device count)
        args.num_devices = jax.device_count()
    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    log_f = open(args.log.replace("WORKER-ID", str(proc_id)), "w")

    if args.loader == "utt":
        if not args.ali_rspec:
            raise SystemExit("--loader utt requires --ali_rspec (ark:label.txt)")
        featurizer, input_dim = common.feats_featurizer_from_args(args)
    else:
        featurizer, input_dim, _ = common.featurizer_from_args(args)
    model, variables, _ = load_bundle(args.init_model)
    tx = common.optimizer_from_args(args)
    loader_cfg = common.loader_cfg_from_args(
        args, batch_size=args.batch_size * n_dev
    )

    beam_cfg = BeamConfig(
        beam_size=args.beam_size, n_best=args.beam_size,
        sm_scale=args.sm_scale, max_symbols=args.decode_max_symbols,
        prune_dups=False,  # reference decodes with beam_prune=False (:87)
        mm_dtype="auto",   # CLI opts into bf16 decode matmuls on TPU
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
    )
    log_f.write(f"MBR fine-tuning: devices {n_dev} ({args.dp_mode}), "
                f"processes {n_proc}, beam {args.beam_size}\n")
    log_f.flush()

    key = jax.random.PRNGKey(args.seed)
    num_done = 0

    if args.dp_mode == "sync":
        raw_step = make_mbr_step(
            model, tx, featurizer, beam_cfg,
            rnnt_scale=args.rnnt_scale, sm_scale=args.sm_scale,
            loss_chunk=args.loss_chunk, loss_backend=args.loss_backend,
            jit=False,
        )
        step = jit_dp(raw_step, mesh)
        state = replicate_tree(state, mesh)
        dsh = data_sharding(mesh)

        def bundle_vars():
            v = {"params": jax.device_get(state.params)}
            if state.batch_stats is not None:
                v["batch_stats"] = jax.device_get(state.batch_stats)
            return v

        for epoch in range(args.num_epochs):
            log_f.write(f"===> Epoch {epoch} <===\n")
            logger = Logger(log_f, args.log_per_n_frames,
                            ["MBR Loss", "RNNT Loss"])
            pending = []
            t_epoch = time.perf_counter()
            n_utts = 0

            def drain():
                for m in pending:
                    logger.update_and_log(
                        int(m["num_labels"]),
                        [float(m["mbr_loss"]), float(m["rnnt_loss"])],
                    )
                pending.clear()

            for dev_batch in prefetch_iter(
                    batch_stream(args, loader_cfg, epoch),
                    transform=lambda b: to_device_batch(b, dsh)):
                key, sub = jax.random.split(key)
                state, metrics = step(state, dev_batch, common.host_key(sub))
                pending.append(metrics)
                n_utts += loader_cfg.batch_size
                if len(pending) >= 8:
                    drain()
                num_done += 1
                if num_done % args.tmp_save_batches == 0:
                    drain()
                    # every process calls: Orbax saves are collective
                    save_bundle(f"{args.output_dir}/model.tmp",
                                "transducer", model.config, bundle_vars())
            drain()
            logger.summarize_and_log()
            dt = time.perf_counter() - t_epoch
            log_f.write(f"===> Epoch {epoch} wall {dt:.1f}s, {n_utts} utts, "
                        f"{n_utts / max(dt, 1e-9):.1f} utt/s <===\n")
            if ((epoch + 1) % max(args.save_interval, 1) == 0
                    or epoch == args.num_epochs - 1):
                save_bundle(f"{args.output_dir}/model.epoch.{epoch}",
                            "transducer", model.config, bundle_vars(),
                            metadata={"epoch": epoch})
    else:
        # BMUF: sync_period independent local MBR steps per device, then a
        # block-momentum model update (reference: BmufTrainer around the
        # MBR loop, train_transducer_mbr_bmuf_otfaug.py:236-261)
        def local_step(params, opt_state, stats, lbatch, lkey):
            kf, kd = jax.random.split(lkey)
            x, x_lens = batch_inputs(lbatch)
            vs = {"params": params}
            if stats is not None:
                vs["batch_stats"] = stats
            # decode on clean features, eval mode (model.eval(), :113)
            feats_c, lens_c = featurizer(None, x, x_lens, False)
            enc_c = model.apply(vs, feats_c, lens_c, method=Transducer.encode)
            enc_lens_c = model.apply(vs, lens_c,
                                     method=Transducer.encoder_out_len)
            nbest = jax.lax.stop_gradient(
                beam_search(model, vs, enc_c, enc_lens_c, beam_cfg))
            feats, feat_lens = featurizer(kf, x, x_lens, True)

            def loss_fn(p):
                return mbr_losses(
                    model, p, feats, feat_lens,
                    lbatch["labels"], lbatch["label_lens"], nbest,
                    args.rnnt_scale, args.sm_scale, dropout_key=kd,
                    loss_chunk=args.loss_chunk,
                    loss_backend=args.loss_backend, batch_stats=stats,
                    blank=beam_cfg.blank,
                )

            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, new_stats, metrics

        bcfg = BMUFConfig(
            variant=args.dp_mode,
            block_momentum=args.block_momentum, block_lr=args.block_lr,
            sync_period=args.sync_period,
        )
        bstate = replicate_tree(bmuf_init(state.params, bcfg), mesh)
        bn_stats = state.batch_stats
        if bn_stats is not None:
            bn_stats = replicate_tree(bn_stats, mesh)
        round_fn = make_bmuf_round(local_step, tx.init, bcfg, mesh,
                                   reduce_extra=True)
        bsh = data_sharding(mesh, leading_unsharded=1)
        step_count = 0

        def bundle_vars():
            v = {"params": jax.device_get(bstate.params)}
            if bn_stats is not None:
                v["batch_stats"] = jax.device_get(bn_stats)
            return v

        for epoch in range(args.num_epochs):
            log_f.write(f"===> Epoch {epoch} <===\n")
            logger = Logger(log_f, args.log_per_n_frames,
                            ["MBR Loss", "RNNT Loss"])
            t_epoch = time.perf_counter()
            n_utts = 0

            def group_rounds(stream):
                pend = []
                for batch in stream:
                    pend.append(batch)
                    if len(pend) == args.sync_period:
                        yield pend
                        pend = []

            def stack_and_ship(pend):
                return {k: jax.device_put(v, bsh)
                        for k, v in _stack_batches(pend).items()}

            # stack + H2D on the prefetch thread: the next round's transfer
            # issues while the device runs the current round
            for stacked in prefetch_iter(
                    group_rounds(batch_stream(args, loader_cfg, epoch)),
                    transform=stack_and_ship):
                key, sub = jax.random.split(key)
                bstate, bn_stats, ok, metrics = round_fn(
                    bstate, bn_stats, stacked, common.host_key(sub),
                    step_count)
                step_count += args.sync_period
                n_utts += loader_cfg.batch_size * args.sync_period
                num_done += args.sync_period
                if not bool(ok):
                    log_f.write("NaN detected in BMUF sync — stopping\n")
                    sys.exit(1)
                logger.update_and_log(
                    int(np.asarray(metrics["num_labels"]).sum()),
                    [float(np.asarray(metrics["mbr_loss"]).sum()),
                     float(np.asarray(metrics["rnnt_loss"]).sum())],
                )
                if (num_done % args.tmp_save_batches) < args.sync_period:
                    # every process calls: Orbax saves are collective
                    save_bundle(f"{args.output_dir}/model.tmp",
                                "transducer", model.config, bundle_vars())
            logger.summarize_and_log()
            dt = time.perf_counter() - t_epoch
            log_f.write(f"===> Epoch {epoch} wall {dt:.1f}s, {n_utts} utts, "
                        f"{n_utts / max(dt, 1e-9):.1f} utt/s <===\n")
            if ((epoch + 1) % max(args.save_interval, 1) == 0
                    or epoch == args.num_epochs - 1):
                save_bundle(f"{args.output_dir}/model.epoch.{epoch}",
                            "transducer", model.config, bundle_vars(),
                            metadata={"epoch": epoch})

    log_f.write("Training Finished\n")
    log_f.close()


if __name__ == "__main__":
    main()
