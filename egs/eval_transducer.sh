#!/bin/bash
# Batch decoding + scoring recipe — eval_transducer.sh equivalent.
# Decodes straight from wav.scp (features are computed on device);
# optional n-gram FST LM shallow fusion and LAS fw/bw rescoring.

. $(dirname $0)/path.sh
set -e

data=data/test
exp=exp/transducer
model=$exp/model.epoch.7
out=$exp/decode

mkdir -p $out
python -m pika_tpu.train.eval_transducer \
  $model $data/wav.scp $out/nbest.txt \
  --feat_config $(dirname $0)/fbank.conf \
  --cmvn_stats data/train/global_cmvn.stats \
  --symbols_map $data/char.txt \
  --ref_labels ark:$data/label.txt \
  --batch_size 8 --beam_size 8 --n_best 8 \
  --sm_scale 1.2 --output_scores \
  2> $out/score.log
  # shallow fusion:   --fst_lm lm.arpa --fst_lm_scale 0.3 --nonblk_reward 0.4
  #                   (--fst_cache_file auto persists the dense advance
  #                    cache next to the LM and skips the ~30 s host
  #                    build on later decode runs)
  # LAS rescoring:    --las_rescorer_model exp/las_fw/model.epoch.3 \
  #                   --las_rescorer_bw_model exp/las_bw/model.epoch.3 \
  #                   --SOS 0 --EOS 6268
cat $out/score.log
