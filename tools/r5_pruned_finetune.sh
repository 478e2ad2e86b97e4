#!/bin/bash
# Round-5: the pruned-pretrain + full-loss-polish recipe, measured.
#
# Finding (BASELINE.md round-5 pruned section): training the grammar AM
# entirely with the pruned objective reaches full-loss quality on plain
# decoding (17.38 vs 17.19) but collapses N-best diversity — 4-best
# oracle 14.83% vs the full-loss model's 9.98% — because the gated joint
# is only ever trained on banded cells, so off-band scores are
# uncalibrated and the beam concentrates.  External-LM fusion is floored
# by that oracle (per-beam 15.12 vs 6.85).
#
# This script measures the standard remedy: a SHORT full-loss fine-tune
# (default 10 epochs = 6% of the 160-epoch budget) on top of the pruned
# checkpoint, then re-decodes the same stages.  If fusion quality
# recovers, the recommended production recipe is: bulk epochs at the
# pruned objective's 1.65x step throughput + a short full-loss tail.
# Also probes --sm_scale 0.5 on the PURE pruned model (dev) as the
# no-training mitigation: flatter AM scores -> more beam diversity.
#
# Usage: SEED=1 FT_EPOCHS=10 bash tools/r5_pruned_finetune.sh [workdir]
. $(dirname $0)/../egs/path.sh
set -e

work=${1:-/tmp/pika_grammar}
SEED=${SEED:-1}
FT_EPOCHS=${FT_EPOCHS:-10}
data=$work/data
dev=$work/dev
conf=$work/fbank.conf
pruned_exp=$work/exp_seed${SEED}_pruned
# first measured config (10 epochs, lr 2e-4) lives in _prunedft; other
# (FT_EPOCHS, FT_LR) points get their own dir
FT_LR=${FT_LR:-0.0002}
if [ "$FT_EPOCHS" = 10 ] && [ "$FT_LR" = 0.0002 ]; then
    exp=$work/exp_seed${SEED}_prunedft
else
    exp=$work/exp_seed${SEED}_prunedft${FT_EPOCHS}_$FT_LR
fi
mkdir -p $exp
results=$exp/RESULTS
: > $results

model_flags="--encoder_type transformer --enc_layers 9
    --tdnn_nhid 256 --tdnn_layers 9
    --decoder_type rnn --dec_layers 1 --rnn_size 256 --embd_dim 64
    --dropout 0.1 --tdnn_transformer_dropout 0.1 --output_dim 31
    --feats_dim 40 --lctx 1 --rctx 1 --stride 1 --num_workers 1
    --speed_rate 0.96,1.0,1.04 --gain_range 55,10
    --grad_clip 3.0 --momentum 0.9
    --num_batches_per_epoch 94 --batch_size 16 --max_wav_seconds 4.0
    --dp_mode sync --num_devices 1 --seed $SEED
    --rng_impl threefry2x32"

last=$((FT_EPOCHS - 1))
echo "### full-loss fine-tune, $FT_EPOCHS epochs from pruned epoch 159 — $(date -u)"
[ -d $exp/model.epoch.$last ] || timeout 3000 python -m pika_tpu.train.train_transducer \
    $data/train/data.lst $exp/train.log $exp \
    --feat_config $conf --cmvn_stats $data/train/global_cmvn.stats \
    --optim adam --initial_lr $FT_LR --final_lr 0.00005 \
    --num_epochs $FT_EPOCHS \
    --noise_lst $data/noise.lst --snr_range 10,30 \
    --init_model $pruned_exp/model.epoch.159 $model_flags

model=$exp/model.epoch.$last
decode_flags="--feat_config $conf --cmvn_stats $data/train/global_cmvn.stats
    --beam_size 4 --n_best 4 --max_symbols 16
    --feats_dim 40 --lctx 1 --rctx 1 --stride 1
    --batch_size 16 --max_wav_seconds 4.0 --output_scores"

wer_of () {
    local tag=$1; shift
    if ! grep -qE "%WER" $exp/decode_$tag.out 2>/dev/null; then
        timeout 1500 "$@" > $exp/decode_$tag.out 2>&1 || true
    fi
    grep -E "%WER" $exp/decode_$tag.out | tail -1 | sed "s/^/$tag /" >> $results
    tail -1 $results
}

echo "### decodes (tune-once scales, directly comparable to the matrix) — $(date -u)"
wer_of base python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest.txt \
    --ref_labels ark:$data/test/label.txt \
    --symbols_map $data/char.txt $decode_flags
wer_of base_fst python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_fst.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale 0.8 --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags
wer_of base_fst_pt python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_fst_pt.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale 1.2 --fst_per_token \
    --symbols_map $data/char.txt $decode_flags

echo "### 4-best oracle after fine-tune" | tee -a $results
python tools/nbest_oracle.py $exp/nbest.txt ark:$data/test/label.txt \
    $data/test/wav.scp 4 $data/char.txt 2>/dev/null | tail -1 | tee -a $results

[ -n "$SKIP_SM_PROBE" ] && { echo "### PRUNED FINETUNE DONE $(date -u)"; cat $results; exit 0; }
echo "### sm_scale 0.5 probe on the PURE pruned model (dev, no training)"
wer_of dev_sm05_fst python -m pika_tpu.train.eval_transducer \
    $pruned_exp/model.epoch.159 $dev/test/wav.scp $exp/nbest_dev_sm05_fst.txt \
    --ref_labels ark:$dev/test/label.txt --sm_scale 0.5 \
    --fst_lm $data/lm.arpa --fst_lm_scale 0.8 --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags
wer_of dev_sm05_pt python -m pika_tpu.train.eval_transducer \
    $pruned_exp/model.epoch.159 $dev/test/wav.scp $exp/nbest_dev_sm05_pt.txt \
    --ref_labels ark:$dev/test/label.txt --sm_scale 0.5 \
    --fst_lm $data/lm.arpa --fst_lm_scale 1.2 --fst_per_token \
    --symbols_map $data/char.txt $decode_flags

echo "### PRUNED FINETUNE DONE $(date -u)"
cat $results
