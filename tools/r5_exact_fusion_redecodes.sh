#!/bin/bash
# Round-5: re-decode the grammar matrix's per-token TEST rows with the new
# default EXACT full-vocab selection (--fst_topm 0, dense cache) and record
# them next to the committed top-8 rows.  Scales follow the committed
# protocol (pt scale 1.2, tuned once on seed-1 dev).
# Usage: bash tools/r5_exact_fusion_redecodes.sh [wait_pid] > log 2>&1 &
cd "$(dirname $0)/.."
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=$PWD:$PYTHONPATH

if [ -n "$1" ]; then
    echo "### waiting for PID $1 — $(date -u)"
    while [ -e /proc/$1 ]; do sleep 15; done
fi

work=/tmp/pika_grammar
data=$work/data
conf=$work/fbank.conf
pt_scale=1.2
out=$work/RESULTS.exact_fusion
: > $out

for SEED in 1 2 3; do
  exp=$work/exp_seed$SEED
  model=$exp/model.epoch.159
  mbr_model=$exp/mbr/model.epoch.1
  decode_flags="--feat_config $conf --cmvn_stats $data/train/global_cmvn.stats
      --beam_size 4 --n_best 4 --max_symbols 16
      --feats_dim 40 --lctx 1 --rctx 1 --stride 1
      --batch_size 16 --max_wav_seconds 4.0 --output_scores"
  for pair in "base:$model" "mbr:$mbr_model"; do
    tag=${pair%%:*}; mdl=${pair#*:}
    o=$exp/decode_${tag}_fst_pt_exact.out
    if ! grep -qE "%WER" $o 2>/dev/null; then
      timeout 1500 python -m pika_tpu.train.eval_transducer \
          $mdl $data/test/wav.scp $exp/nbest_${tag}_fst_pt_exact.txt \
          --ref_labels ark:$data/test/label.txt \
          --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
          --fst_topm 0 \
          --symbols_map $data/char.txt $decode_flags > $o 2>&1 || true
    fi
    w=$(grep -oE "%WER [0-9.]+" $o | tail -1)
    echo "seed$SEED ${tag}_fst_pt_exact $w" | tee -a $out
  done
done
echo "### EXACT REDECODES DONE $(date -u)"
cat $out
