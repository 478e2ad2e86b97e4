#!/bin/bash
# LAS rescorer training recipe — train_las_rescorer_bmuf_otfaug.sh equivalent.
# Trains the forward rescorer on the frozen RNN-T encoder; add
# --reverse_labels for the backward rescorer.

. $(dirname $0)/path.sh
set -e

data=data/train
exp=exp/las_fw
shared=exp/transducer/model.epoch.7
output_dim=6269           # labels + EOS id (egs convention: SOS 0, EOS 6268)
padding_idx=6269

mkdir -p $exp
python -m pika_tpu.train.train_las \
  $data/data.lst $exp/train.log $exp \
  --feat_config $(dirname $0)/fbank.conf \
  --cmvn_stats $data/global_cmvn.stats \
  --shared_encoder_model $shared \
  --SOS 0 --EOS 6268 --padding_tgt $padding_idx --padding_idx $padding_idx \
  --output_dim $output_dim \
  --enc_layers 2 --dec_layers 2 --rnn_size 1024 --embd_dim 100 \
  --global_attention mlp \
  --optim adam --initial_lr 1e-4 --final_lr 1e-5 \
  --num_epochs 4 --num_batches_per_epoch 20000 \
  --batch_size 8 --lctx 1 --rctx 1 --stride 1 \
  --sampling_decoder --sampling_prob 0.1 --increase_sampling_prob_epoch 2
# For the backward rescorer: append --reverse_labels and write to exp/las_bw
