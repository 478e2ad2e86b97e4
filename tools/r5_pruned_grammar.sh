#!/bin/bash
# Round-5: quality evidence for the pruned RNN-T objective at grammar
# scale — train the seed-1 grammar AM with --pruned_loss_range 5 (same
# corpus, schedule, and 2-phase curriculum as the committed matrix) and
# decode the same stages, so the pruned column is directly comparable to
# the committed full-loss rows (BASELINE.md grammar matrix, seed 1:
# base 17.19 / per-beam 6.85 / per-token 4.15).
# Usage: bash tools/r5_pruned_grammar.sh [wait_pid] > log 2>&1 &
cd "$(dirname $0)/.."
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=$PWD:$PYTHONPATH

if [ -n "$1" ]; then
    echo "### waiting for PID $1 — $(date -u)"
    while [ -e /proc/$1 ]; do sleep 15; done
fi

SEED=${SEED:-1}
work=/tmp/pika_grammar
data=$work/data
conf=$work/fbank.conf
exp=$work/exp_seed${SEED}_pruned
mkdir -p $exp
results=$exp/RESULTS
: > $results

pruned_flags="--pruned_loss_range 5 --simple_loss_scale 0.5
    --pruned_warmup_epochs 5"
model_flags="--encoder_type transformer --enc_layers 9
    --tdnn_nhid 256 --tdnn_layers 9
    --decoder_type rnn --dec_layers 1 --rnn_size 256 --embd_dim 64
    --dropout 0.1 --tdnn_transformer_dropout 0.1 --output_dim 31
    --feats_dim 40 --lctx 1 --rctx 1 --stride 1 --num_workers 1
    --speed_rate 0.96,1.0,1.04 --gain_range 55,10
    --grad_clip 3.0 --momentum 0.9
    --num_batches_per_epoch 94 --batch_size 16 --max_wav_seconds 4.0
    --dp_mode sync --num_devices 1 --seed $SEED
    --rng_impl threefry2x32 $pruned_flags"

echo "### stage 3a (pruned): clean warm-up to epoch 20 — $(date -u)"
[ -d $exp/model.epoch.19 ] || timeout 3000 python -m pika_tpu.train.train_transducer \
    $data/train/data.lst $exp/train_warmup.log $exp \
    --feat_config $conf --cmvn_stats $data/train/global_cmvn.stats \
    --optim adam --initial_lr 0.001 --final_lr 0.0008 \
    --num_epochs 20 $model_flags

echo "### stage 3b (pruned): noise training to epoch 160 — $(date -u)"
[ -d $exp/model.epoch.159 ] || timeout 9000 python -m pika_tpu.train.train_transducer \
    $data/train/data.lst $exp/train.log $exp \
    --feat_config $conf --cmvn_stats $data/train/global_cmvn.stats \
    --optim adam --initial_lr 0.001 --final_lr 0.00005 \
    --num_epochs 160 \
    --noise_lst $data/noise.lst --snr_range 10,30 \
    --resume $model_flags

model=$exp/model.epoch.159
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

echo "### decodes — $(date -u)"
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

echo "### PRUNED GRAMMAR DONE $(date -u)"
cat $results
