"""RNN-T training CLI — train_transducer_bmuf_otfaug equivalent.

Usage mirrors the reference entry point (trainer/train_transducer_bmuf_otfaug.py):

    python -m pika_tpu.train.train_transducer DATA_LST LOG OUTPUT_DIR \
        --encoder_type transformer --decoder_type rnn --rnn_size 1024 ... \
        --dp_mode bmuf --sync_period 5 --block_momentum 0.9

One SPMD process drives the whole device mesh (replacing
torch.distributed.launch's process-per-GPU).  ``--dp_mode sync`` is
per-step data parallelism; ``bmuf``/``blockadam``/``bmufadam`` run the
corresponding block strategies with one collective per sync period.
"""

from __future__ import annotations

import argparse
import itertools
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pika_tpu.data.loader import dataloader, prefetch_iter
from pika_tpu.models.transducer import TransducerConfig, init_transducer
from pika_tpu.parallel import (
    BMUFConfig, bmuf_init, jit_dp, make_bmuf_round, make_mesh,
    replicate_tree, shard_batch,
)
from pika_tpu.train import common
from pika_tpu.train.bundle import load_bundle, save_bundle
from pika_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from pika_tpu.train.step import TrainState, make_train_step, transducer_loss
from pika_tpu.utils.logger import Logger


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Transducer training")
    parser.add_argument("data_lst", type=str,
                        help="list of mrk, seq, ali files for data")
    parser.add_argument("log", type=str, help="log file for the job")
    parser.add_argument("output_dir", type=str, help="path to save models")
    common.add_loader_args(parser)
    common.add_model_args(parser)
    common.add_train_args(parser)
    parser.add_argument("--valid_data_lst", type=str, default=None,
                        help="held-out data list; evaluated after each epoch")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the newest full-state checkpoint in "
                             "output_dir (params + optimizer state + epoch)")
    parser.add_argument("--save_every_n_batches", type=int, default=0,
                        help="periodic temp checkpoint (0 = per-epoch only)")
    common.add_utt_loader_args(parser)
    return parser


def make_model(args, input_dim):
    cfg = TransducerConfig(
        input_dim=input_dim,
        vocab_size=args.output_dim,
        hid_dim=args.rnn_size,
        encoder_type="tdnn_transformer" if args.encoder_type == "transformer" else "rnn",
        decoder_type="transformer" if args.decoder_type == "transformer" else "rnn",
        enc_layers=args.enc_layers,
        dec_layers=args.dec_layers,
        embd_dim=args.embd_dim,
        dropout=args.dropout,
        brnn=args.brnn,
        tdnn_nhid=args.tdnn_nhid,
        tdnn_layers=args.tdnn_layers,
        tdnn_transformer_dropout=args.tdnn_transformer_dropout,
        remat=getattr(args, "remat", False),
        attn_chunk=getattr(args, "attn_chunk", 0),
        attn_cheap_dropout=common.resolve_cheap_dropout(args),
        simple_joint=getattr(args, "pruned_loss_range", 0) > 0,
    )
    if args.init_model:
        model, variables, _ = load_bundle(args.init_model)
        return model, variables, model.config
    model, variables = init_transducer(jax.random.PRNGKey(args.seed), cfg)
    return model, variables, cfg


def feats_batch_stream(args, batch_size: int, epoch: int, shuffle=True,
                       required=True):
    """Precomputed-feature batches (--loader utt)."""
    from pika_tpu.data.feats_loader import FeatsLoaderConfig, feats_dataloader

    cfg = FeatsLoaderConfig(
        batch_size=batch_size, lctx=args.lctx, rctx=args.rctx,
        stride=args.stride, max_len=args.max_len,
        reverse_labels=args.reverse_labels, pad_label=args.padding_tgt,
        sos=args.SOS, eos=args.EOS,
        shuffle_buffer=args.buffer_size if shuffle else 0,
        seed=args.seed + 1000 * epoch,
    )
    n_yielded = n_dropped = 0
    for b in feats_dataloader(args.data_lst, args.ali_rspec, cfg):
        if len(b["uttids"]) == batch_size:
            n_yielded += 1
            yield b
        else:
            # SPMD sharding needs the batch axis divisible by the mesh —
            # ragged tail batches are dropped, but never silently
            n_dropped += len(b["uttids"])
    if n_dropped:
        print(f"feats_batch_stream: dropped {n_dropped} tail utterances "
              f"(< batch_size {batch_size})", file=sys.stderr)
    if n_yielded == 0 and required:
        raise RuntimeError(
            f"feats_batch_stream: epoch produced 0 full batches "
            f"(batch_size {batch_size}, {n_dropped} utterances dropped) — "
            f"is the corpus smaller than the global batch?")
    if n_yielded == 0:
        print(f"feats_batch_stream: 0 full batches (batch_size "
              f"{batch_size}); skipping", file=sys.stderr)


def batch_stream(args, loader_cfg, epoch: int, noise=None, rir=None,
                 required=True):
    """Merged stream over (possibly WORKER-ID-expanded) data lists."""
    import dataclasses as _dc

    if getattr(args, "loader", "otf") == "utt":
        yield from feats_batch_stream(args, loader_cfg.batch_size, epoch,
                                      shuffle=loader_cfg.augment,
                                      required=required)
        return

    if noise is None:
        noise = common.load_noise_segments(getattr(args, "noise_lst", None))
    if rir is None:
        rir = common.load_noise_segments(getattr(args, "rir_lst", None))
    lists = common.expand_worker_lists(args.data_lst, args.num_devices or jax.device_count())
    streams = []
    for i, lst in enumerate(lists):
        cfg_i = _dc.replace(loader_cfg, seed=loader_cfg.seed + 1000 * epoch + i)
        streams.append(dataloader(lst, cfg_i, noise=noise, rir=rir))
    expected = loader_cfg.batch_size
    n_yielded = n_dropped = 0
    for batches in itertools.zip_longest(*streams):
        for b in batches:
            # drop ragged tail batches: SPMD sharding needs the batch axis
            # divisible by the mesh (the reference's full_batch semantics)
            if b is not None and len(b["uttids"]) == expected:
                n_yielded += 1
                yield b
            elif b is not None:
                n_dropped += len(b["uttids"])
    if n_dropped:
        print(f"batch_stream: dropped {n_dropped} tail utterances "
              f"(< batch_size {expected})", file=sys.stderr)
    if n_yielded == 0 and required:
        raise RuntimeError(
            f"batch_stream: epoch produced 0 full batches (batch_size "
            f"{expected}, {n_dropped} utterances dropped) — is the corpus "
            f"smaller than the global batch?")
    if n_yielded == 0:
        print(f"batch_stream: 0 full batches (batch_size {expected}); "
              f"skipping", file=sys.stderr)


def _wavs_i16(key, v):
    """Loader waveforms are int16-scale integral floats: shipping int16 is
    lossless and halves H2D bytes (the transport is the CLI bottleneck —
    tools/diag_transport.py); the featurizer promotes back to float32 on
    device."""
    if key == "wavs":
        return np.clip(np.asarray(v), -32768, 32767).astype(np.int16)
    return v


def to_device_batch(batch, sharding=None):
    """Ship a host batch.  With ``sharding`` (a batch-axis NamedSharding)
    the put is mesh-aware — correct on one device and on a multi-host mesh
    (each process puts only its addressable shards)."""
    if sharding is not None:
        return {k: jax.device_put(_wavs_i16(k, v), sharding)
                for k, v in batch.items() if k != "uttids"}
    return {k: jnp.asarray(_wavs_i16(k, v))
            for k, v in batch.items() if k != "uttids"}


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
    is_main = proc_id == 0
    mesh = make_mesh(args.num_devices)
    n_dev = mesh.devices.size
    log_f = open(args.log.replace("WORKER-ID", str(proc_id)), "w")

    if args.loader == "utt":
        if not args.ali_rspec:
            sys.exit("--loader utt requires --ali_rspec (ark:label.txt)")
        featurizer, input_dim = common.feats_featurizer_from_args(args)
    else:
        featurizer, input_dim, _ = common.featurizer_from_args(args)
    model, variables, cfg = make_model(args, input_dim)
    tx = common.optimizer_from_args(args)
    loader_cfg = common.loader_cfg_from_args(
        args, batch_size=args.batch_size * n_dev
    )

    num_param = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    log_f.write("*" * 60 + "\n")
    log_f.write(
        f"model: transducer  input dim: {input_dim}\toutput dim: {args.output_dim}\n"
        f"hidden dim: {args.rnn_size}\tenc_layers: {args.enc_layers}\n"
        f"dec_layers: {args.dec_layers}\tdevices: {n_dev} ({args.dp_mode})\n"
        f"model size: {num_param / 1e6:.2f} M\n"
    )
    log_f.write("*" * 60 + "\n")
    log_f.flush()

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
    )
    start_epoch = 0
    ckpt_dir = f"{args.output_dir}/ckpt"
    if args.resume and args.dp_mode == "sync":
        try:
            state, meta = restore_checkpoint(ckpt_dir, target=state)
            start_epoch = int((meta or {}).get("epoch", -1)) + 1
            log_f.write(f"resumed from epoch {start_epoch - 1} "
                        f"(optimizer state included)\n")
        except FileNotFoundError:
            log_f.write("no checkpoint found; starting fresh\n")

    utt_box = [0]  # utterances consumed this epoch, for the epoch summary

    if args.dp_mode == "sync":
        import jax.numpy as _jnp

        from pika_tpu.parallel.mesh import data_sharding, replicated

        cdt = _jnp.bfloat16 if args.compute_dtype == "bfloat16" else None

        def build_step(p_scale):
            return make_train_step(model, tx, featurizer,
                                   loss_chunk=args.loss_chunk,
                                   loss_backend=args.loss_backend,
                                   compute_dtype=cdt, donate=True, jit=False,
                                   pruned_range=args.pruned_loss_range,
                                   simple_scale=args.simple_loss_scale,
                                   pruned_scale=p_scale)

        step = build_step(1.0)
        n_per_dispatch = max(1, args.steps_per_dispatch)

        # K train steps per dispatch: one H2D transfer + one XLA program
        # per group of same-shape batches.  The host→device transport has
        # a fixed per-transfer latency and contends with compute
        # (tools/diag_transport.py), so amortizing it across K steps is
        # the main end-to-end throughput lever.
        from pika_tpu.train.step import make_scanned_step

        multi_step = make_scanned_step(step)

        rep = replicated(mesh)
        dsh = data_sharding(mesh, leading_unsharded=1)

        def jit_multi(fn):
            return jax.jit(
                fn,
                in_shardings=(rep, {"batch": dsh, "apply": rep}, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )

        dp_step = jit_multi(multi_step)
        # k2-style pruned warmup: a separately compiled step with the
        # banded term at 0.1 for the first --pruned_warmup_epochs
        dp_step_warm = (
            jit_multi(make_scanned_step(build_step(0.1)))
            if args.pruned_loss_range > 0 and args.pruned_warmup_epochs > 0
            else dp_step)
        state = replicate_tree(state, mesh)

        def group_batches(stream):
            """Group host batches of identical bucket shape into runs of
            n_per_dispatch (shape-homogeneous groups keep the number of
            compiled programs at one per bucket shape)."""
            pend = {}
            data_key = "wavs" if args.loader == "otf" else "feats"
            for b in stream:
                shape = (b[data_key].shape[1], b["labels"].shape[1])
                g = pend.setdefault(shape, [])
                g.append(b)
                if len(g) == n_per_dispatch:
                    yield g, n_per_dispatch
                    pend[shape] = []
            for g in pend.values():
                if g:
                    yield g, len(g)

        def pack_group(item):
            """Stack a group on host, pad ragged tails, ship ONE transfer.
            Runs on the prefetch thread, so the transfer overlaps the
            device steps; t_ready (transfer COMPLETE — block_until_ready)
            feeds the per-epoch overlap stats that prove the H2D issued
            ahead of consumption."""
            import time as _time

            g, n_real = item
            g = list(g) + [g[-1]] * (n_per_dispatch - len(g))
            stacked = {
                k: np.stack([np.asarray(b[k]) for b in g])
                for k in g[0] if k != "uttids"
            }
            apply = np.arange(n_per_dispatch) < n_real
            dev = {
                "batch": {k: jax.device_put(_wavs_i16(k, v), dsh)
                          for k, v in stacked.items()},
                "apply": jax.device_put(apply, rep),
            }
            jax.block_until_ready(dev["batch"])
            return dev, n_real, _time.perf_counter()

        def run_epoch(epoch, state):
            logger = Logger(log_f, args.log_per_n_frames, ["Loss"])
            key = jax.random.PRNGKey(args.seed + epoch)
            pending = []  # device metrics; sync in windows so the device
                          # pipeline stays full (a per-batch float() would
                          # serialize host and device)

            def drain():
                for ms, n_real in pending:
                    labels = np.asarray(ms["num_labels"])
                    losses = np.asarray(ms["loss"])
                    for j in range(n_real):
                        loss_val = float(losses[j])
                        if loss_val != loss_val:  # NaN health check (bmuf.py:89-90)
                            log_f.write("NaN loss detected — stopping\n")
                            sys.exit(1)
                        logger.update_and_log(int(labels[j]), [loss_val])
                pending.clear()

            # host loading/augmentation, stacking and the H2D transfer run
            # in a prefetch thread so they overlap with the device steps
            stream = prefetch_iter(
                group_batches(batch_stream(args, loader_cfg, epoch)),
                transform=pack_group,
            )
            n_batches = 0
            import time as _time

            waits = []   # how long the consumer blocked per dispatch
            leads = []   # how long the transferred batch sat ready
            it = iter(stream)
            while True:
                t0w = _time.perf_counter()
                try:
                    dev, n_real, t_ready = next(it)
                except StopIteration:
                    break
                t1w = _time.perf_counter()
                waits.append(t1w - t0w)
                leads.append(t1w - t_ready)
                key, sub = jax.random.split(key)
                fn = (dp_step_warm if epoch < args.pruned_warmup_epochs
                      and args.pruned_loss_range > 0 else dp_step)
                state, metrics = fn(state, dev, common.host_key(sub))
                utt_box[0] += loader_cfg.batch_size * n_real
                n_batches += n_real
                pending.append((metrics, n_real))
                if len(pending) * n_per_dispatch >= 8:
                    drain()
            if leads:
                ahead = sum(1 for l in leads if l > 5e-3)
                log_f.write(
                    f"prefetch overlap: {ahead}/{len(leads)} dispatches "
                    f"H2D-complete before request; consumer wait total "
                    f"{sum(waits):.2f}s (max {max(waits):.2f}s)\n")
                if args.save_every_n_batches and n_batches % args.save_every_n_batches < n_real:
                    drain()
                    # every process calls: Orbax saves are collective
                    # (primary writes, the rest barrier — bundle.py)
                    save_bundle(f"{args.output_dir}/model.tmp", "transducer", cfg,
                                _variables_out(jax.device_get(state.params),
                                               jax.device_get(state.batch_stats)))
            drain()
            logger.summarize_and_log()
            return state

    else:
        bcfg = BMUFConfig(
            variant=args.dp_mode if args.dp_mode != "bmuf" else "bmuf",
            block_momentum=args.block_momentum, block_lr=args.block_lr,
            sync_period=args.sync_period,
        )
        bstate = replicate_tree(bmuf_init(state.params, bcfg), mesh)
        bn_stats = variables.get("batch_stats")
        if bn_stats is not None:
            bn_stats = replicate_tree(bn_stats, mesh)

        from pika_tpu.train.step import batch_inputs

        def build_local_step(p_scale):
            def local_step(params, opt_state, stats, lbatch, key):
                kf, kd = jax.random.split(key)
                x, x_lens = batch_inputs(lbatch)
                feats, feat_lens = featurizer(kf, x, x_lens, True)

                def loss_fn(p):
                    return transducer_loss(
                        model, p, stats, feats, feat_lens,
                        lbatch["labels"], lbatch["label_lens"], train=True,
                        dropout_key=kd, loss_chunk=args.loss_chunk,
                        loss_backend=args.loss_backend,
                        pruned_range=args.pruned_loss_range,
                        simple_scale=args.simple_loss_scale,
                        pruned_scale=p_scale,
                    )

                (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, new_stats, {
                    "loss": loss, "num_labels": lbatch["label_lens"].sum(),
                }
            return local_step

        round_fn = make_bmuf_round(build_local_step(1.0), tx.init, bcfg,
                                   mesh, reduce_extra=True)
        # k2-style pruned warmup round (banded term at 0.1)
        round_fn_warm = (
            make_bmuf_round(build_local_step(0.1), tx.init, bcfg, mesh,
                            reduce_extra=True)
            if args.pruned_loss_range > 0 and args.pruned_warmup_epochs > 0
            else round_fn)
        resumed_steps = None
        if args.resume:
            try:
                bundle = {"bstate": bstate, "stats": bn_stats, "steps": jnp.zeros((), jnp.int32)}
                bundle, meta = restore_checkpoint(ckpt_dir, target=bundle)
                bstate = replicate_tree(bundle["bstate"], mesh)
                bn_stats = (replicate_tree(bundle["stats"], mesh)
                            if bundle["stats"] is not None else None)
                start_epoch = int((meta or {}).get("epoch", -1)) + 1
                resumed_steps = int(np.asarray(bundle["steps"]))
                log_f.write(f"resumed BMUF state from epoch {start_epoch - 1} "
                            f"(step {resumed_steps})\n")
            except FileNotFoundError:
                log_f.write("no checkpoint found; starting fresh\n")

        stats_box = [bn_stats]
        # The LR/BMUF schedule step comes from the checkpoint when one was
        # restored: re-deriving it as epoch * num_batches_per_epoch drifts
        # when --num_batches_per_epoch changes between runs or the
        # checkpoint was saved off an epoch boundary.
        step_box = [resumed_steps if resumed_steps is not None
                    else start_epoch * args.num_batches_per_epoch]

        def run_epoch(epoch, bstate_):
            logger = Logger(log_f, args.log_per_n_frames, ["Loss"])
            key = jax.random.PRNGKey(args.seed + epoch)
            # stack the sync period on HOST and ship one transfer — feeding
            # device arrays into np.stack would round-trip them D2H.
            # device_put with an explicit (None, "data") sharding: correct
            # on one process AND on a multi-host mesh (each process puts
            # only its addressable shards of the global batch)
            from pika_tpu.parallel.mesh import data_sharding

            bsh = data_sharding(mesh, leading_unsharded=1)

            def group_rounds(stream):
                pending = []
                for batch in stream:
                    pending.append(batch)
                    if len(pending) == args.sync_period:
                        yield pending
                        pending = []

            def stack_and_ship(batches):
                stacked = _stack_batches(batches)
                return {k: jax.device_put(_wavs_i16(k, v), bsh)
                        for k, v in stacked.items()}

            # stacking AND the H2D device_put run on the prefetch thread
            # (size=3 rounds buffered) so the next round's transfer issues
            # while the device computes the current one — the same
            # double-buffering the sync path's pack_group has
            for stacked in prefetch_iter(
                    group_rounds(batch_stream(args, loader_cfg, epoch)),
                    transform=stack_and_ship):
                key, sub = jax.random.split(key)
                nonlocal_stats = stats_box[0]
                rf = (round_fn_warm if epoch < args.pruned_warmup_epochs
                      and args.pruned_loss_range > 0 else round_fn)
                bstate_, new_stats, ok, metrics = rf(
                    bstate_, nonlocal_stats, stacked,
                    common.host_key(sub), step_box[0]
                )
                stats_box[0] = new_stats
                step_box[0] += args.sync_period
                utt_box[0] += loader_cfg.batch_size * args.sync_period
                if not bool(ok):
                    log_f.write("NaN detected in BMUF sync — stopping\n")
                    sys.exit(1)
                logger.update_and_log(
                    int(np.asarray(metrics["num_labels"]).sum()),
                    [float(np.asarray(metrics["loss"]).sum())],
                )
            logger.summarize_and_log()
            return bstate_

    from pika_tpu.train.step import make_eval_step

    eval_step = make_eval_step(model, featurizer) if args.valid_data_lst else None

    def run_validation(params, batch_stats, epoch):
        if n_proc > 1:
            # the eval step is a plain local jit; global mesh arrays can't
            # feed it — bounce the (replicated) params through host numpy
            params = jax.device_get(params)
            batch_stats = (jax.device_get(batch_stats)
                           if batch_stats is not None else None)
        vstate = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                            opt_state=None, batch_stats=batch_stats)
        tot_loss = tot_labels = 0.0
        vargs_cfg = loader_cfg
        import dataclasses as _dc
        vargs_cfg = _dc.replace(loader_cfg, augment=False)
        import copy as _copy
        vargs = _copy.copy(args)
        vargs.data_lst = args.valid_data_lst
        # a valid set smaller than the global batch logs and skips — only
        # the TRAINING stream treats an empty epoch as fatal
        for batch in batch_stream(vargs, vargs_cfg, 0, required=False):
            m = eval_step(vstate, to_device_batch(batch))
            tot_loss += float(m["loss"])
            tot_labels += float(m["num_labels"])
        log_f.write(f"===> Epoch {epoch} valid loss/label: "
                    f"{tot_loss / max(tot_labels, 1.0):.4f} <===\n")
        log_f.flush()

    import threading as _threading
    import time as _time

    # Per-epoch saving runs in a background thread on a DEVICE-SIDE COPY of
    # the state: the D2H fetch of the full parameters (hundreds of MB) and
    # the file writes then overlap with the next epoch's compute instead of
    # stalling the training loop.  The copy (jnp.copy) makes this safe
    # against buffer donation by the next epoch's dispatches.
    saver_box = [None]

    def _spawn_saver(epoch, snap_state, snap_extra):
        # every process spawns the saver: Orbax saves are collective
        # (primary writes, the rest synchronize — see bundle.py); each
        # process runs the identical save sequence so barrier keys align
        if saver_box[0] is not None:
            saver_box[0].join()

        def saver():
            if args.dp_mode == "sync":
                host = jax.device_get(snap_state)
                params_out, stats_out = host.params, host.batch_stats
                save_checkpoint(ckpt_dir, epoch, host, metadata={"epoch": epoch})
            else:
                bst, stats, steps = snap_extra
                host_b = jax.device_get(bst)
                params_out = host_b.params
                stats_out = jax.device_get(stats) if stats is not None else None
                save_checkpoint(
                    ckpt_dir, epoch,
                    {"bstate": host_b, "stats": stats_out,
                     # host numpy, NOT jnp: a fresh jnp scalar is a
                     # process-local SingleDeviceSharding array, which
                     # Orbax refuses to serialize in a multi-host run
                     "steps": np.asarray(steps, np.int32)},
                    metadata={"epoch": epoch},
                )
            save_bundle(
                f"{args.output_dir}/model.epoch.{epoch}", "transducer", cfg,
                _variables_out(params_out, stats_out), metadata={"epoch": epoch},
            )

        if args.async_save:
            t = _threading.Thread(target=saver, daemon=False)
            t.start()
            saver_box[0] = t
        else:
            # on transports where D2H contends with compute (measured on
            # the axon tunnel: background fetches doubled epoch time), the
            # synchronous fetch between epochs is faster overall
            saver()

    _copy_tree = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)

    for epoch in range(start_epoch, args.num_epochs):
        log_f.write(f"===> Epoch {epoch} <===\n")
        log_f.flush()
        utt_box[0] = 0
        t_epoch = _time.perf_counter()
        snap = _copy_tree if args.async_save else (lambda x: x)
        # parameters only leave the device on saving epochs — with
        # --save_interval > 1 the full-state D2H fetch (hundreds of MB;
        # the dominant CLI overhead on slow transports) amortizes
        save_this = ((epoch + 1) % max(args.save_interval, 1) == 0
                     or epoch == args.num_epochs - 1)
        if args.dp_mode == "sync":
            state = run_epoch(epoch, state)
            float(state.step)  # host materialization = reliable device sync
            snap_state, snap_extra = (snap(state) if save_this else None), None
            val_params, val_stats = state.params, state.batch_stats
        else:
            bstate = run_epoch(epoch, bstate)
            float(jax.tree_util.tree_leaves(bstate.params)[0].ravel()[0])
            snap_state = None
            snap_extra = (snap(bstate),
                          snap(stats_box[0]) if stats_box[0] is not None else None,
                          step_box[0]) if save_this else None
            val_params, val_stats = bstate.params, stats_box[0]
        dt = _time.perf_counter() - t_epoch
        log_f.write(f"===> Epoch {epoch} wall {dt:.1f}s, {utt_box[0]} utts, "
                    f"{utt_box[0] / max(dt, 1e-9):.1f} utt/s <===\n")
        log_f.flush()
        if save_this:
            _spawn_saver(epoch, snap_state, snap_extra)
        if eval_step is not None:
            run_validation(val_params, val_stats, epoch)
    if saver_box[0] is not None:
        saver_box[0].join()
    log_f.write("Training Finished\n")
    log_f.close()


def _variables_out(params, batch_stats=None):
    out = {"params": params}
    if batch_stats is not None:
        out["batch_stats"] = batch_stats
    return out


def _stack_batches(batches, pad_values=None):
    """Stack a sync period of HOST batches, padding to the largest bucket.
    Returns numpy arrays — the caller ships them in one transfer.

    ``pad_values`` maps batch keys to the fill value used when widening a
    narrower bucket (default 0).  LAS targets MUST pad with the model's
    pad_idx: las_loss masks by ``targets != pad_idx``, so zero-fill would
    count padding as real token-0 targets."""
    keys = [k for k in batches[0] if k != "uttids"]
    out = {}
    for k in keys:
        arrs = [np.asarray(b[k]) for b in batches]
        if arrs[0].ndim >= 2:
            dim = max(a.shape[1] for a in arrs)
            fill = (pad_values or {}).get(k, 0)
            arrs = [
                np.pad(a, [(0, 0), (0, dim - a.shape[1])] + [(0, 0)] * (a.ndim - 2),
                       constant_values=fill)
                for a in arrs
            ]
        out[k] = np.stack(arrs)
    return out


if __name__ == "__main__":
    main()
