#!/bin/bash
# MBR fine-tuning recipe — train_transducer_mbr_bmuf_otfaug.sh equivalent.
# Continues from a trained RNN-T bundle (--init_model is required).

. $(dirname $0)/path.sh
set -e

data=data/train
exp=exp/transducer_mbr
init=exp/transducer/model.epoch.7
output_dim=6268

mkdir -p $exp
python -m pika_tpu.train.train_mbr \
  $data/data.lst $exp/train.log $exp \
  --feat_config $(dirname $0)/fbank.conf \
  --cmvn_stats $data/global_cmvn.stats \
  --init_model $init \
  --initial_lr 2e-5 --final_lr 5e-6 \
  --grad_clip 3.0 --momentum 0.9 \
  --num_epochs 1 --num_batches_per_epoch 20000 \
  --batch_size 4 --output_dim $output_dim \
  --lctx 1 --rctx 1 --stride 1 \
  --beam_size 4 --sm_scale 1.2 --rnnt_scale 0.02 \
  --spec_augment
