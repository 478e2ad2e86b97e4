#!/bin/bash
# RNN-T training recipe — the train_transducer_bmuf_otfaug.sh equivalent.
#
# Inputs (same data layout as the reference, egs/train_transducer_bmuf_otfaug.sh):
#   data/train/wav.scp    uttid → wav path (or pipe command)
#   data/train/label.txt  uttid → space-separated label ids (text int-vector ark)
# Everything else (archives, CMVN) is derived below.  One process drives
# the whole TPU mesh — no torch.distributed.launch.

. $(dirname $0)/path.sh
set -e

stage=0
data=data/train
exp=exp/transducer
output_dim=6268            # vocab incl. blank 0
num_devices=              # default: all visible chips

mkdir -p $exp

if [ $stage -le 0 ]; then
  echo "=== stage 0: wav.scp → mrk/seq archives ==="
  python -m pika_tpu.data.prep wav_to_seq $data/wav.scp \
      $data/train.mrk $data/train.seq > $data/shards.txt
  # build the data list: "mrk seq ark:label.txt" per shard
  awk -v lab="ark:$data/label.txt" '{print $1, $2, lab}' $data/shards.txt > $data/data.lst
fi

if [ $stage -le 1 ]; then
  echo "=== stage 1: global CMVN over the augmentation+fbank chain ==="
  python -m pika_tpu.data.prep compute_global_cmvn $data/data.lst \
      $data/global_cmvn.stats --feat_config $(dirname $0)/fbank.conf
fi

if [ $stage -le 2 ]; then
  echo "=== stage 2: RNN-T training (TDNN-Transformer encoder) ==="
  python -m pika_tpu.train.train_transducer \
    $data/data.lst $exp/train.log $exp \
    --feat_config $(dirname $0)/fbank.conf \
    --cmvn_stats $data/global_cmvn.stats \
    --initial_lr 0.003 --final_lr 0.0001 \
    --grad_clip 3.0 --momentum 0.9 \
    --num_epochs 8 --num_batches_per_epoch 20000 \
    --batch_size 8 \
    --encoder_type transformer --enc_layers 9 --tdnn_nhid 1024 \
    --decoder_type rnn --dec_layers 2 \
    --rnn_size 1024 --embd_dim 100 \
    --output_dim $output_dim \
    --lctx 1 --rctx 1 --stride 1 \
    --TU_limit 15000 \
    --spec_augment --max_freq_span 15 --max_time_span 35 \
    --dp_mode bmuf --sync_period 5 --block_momentum 0.9 --block_lr 1.0 \
    ${num_devices:+--num_devices $num_devices}
    # optional knobs:
    #   --noise_lst noise.lst --snr_range 10,30 --noise_prob 0.5
    #       on-the-fly noise mixing (multi-condition at prob < 1)
    #   --remat --attn_chunk 512
    #       long-utterance memory levers: rematerialized encoder layers +
    #       query-block chunked attention (60s inputs fit one 16GB chip)
    #   --compute_dtype bfloat16
    #       bf16 activations, f32 master params/optimizer
fi
