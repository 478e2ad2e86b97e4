"""Training: fused train/eval steps, LR schedules, checkpointing, CLIs."""

from pika_tpu.train.lr import exp_interp_schedule, clip_by_inf_norm, make_optimizer
from pika_tpu.train.step import (
    TrainState,
    FeaturizerConfig,
    make_featurizer,
    make_train_step,
    make_scanned_step,
    make_eval_step,
    transducer_loss,
)
from pika_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
from pika_tpu.train.mbr import make_mbr_step, mbr_losses
from pika_tpu.train.las_step import make_las_train_step, las_loss
