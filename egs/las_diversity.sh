#!/bin/bash
# LAS-rescoring diversity experiment (round 4, VERDICT r3 item 1).
#
# The grammar recipe's LAS stages train the rescorer with
# --shared_encoder_model (the reference recipe's configuration,
# egs/train_las_rescorer.sh): the LAS reuses the frozen transducer
# encoder and only learns an attention decoder on top.  Measured
# outcome (seed 1): the dev scale sweep is monotonically WORSE with
# scale (6.45% at 0.05:0.05 -> 6.67% at 0.5:0.5), i.e. the rescorer's
# score adds no information the beam scores don't already carry — its
# acoustic evidence is the SAME encoder output, and its language
# evidence is the uniform training transcripts (the grammar-split
# design gives it nothing to learn about the test distribution).
# Dev-tuning honestly picks ~zero scale and LAS earns ~nothing
# (mbr 17.01 -> mbr_las 16.94; fused stages unchanged), while the
# pt-fused 4-best oracle (1.68%) shows ~2.3 points of rerank headroom
# going begging.
#
# Hypothesis: the failure is the shared encoder, not rescoring itself.
# This recipe trains an INDEPENDENT LAS (its own BLSTM encoder over
# fbank features — a different acoustic view than the TDNN-Transformer
# AM) and re-runs the same dev-tuned rescoring protocol on the
# pt-fused stack.  If diversity is what was missing, the ind-LAS rows
# capture part of the oracle headroom; either way the result decides
# the "LAS earns WER" question with data.
#
# Run AFTER egs/mini_grammar.sh seed 1 has completed in $work.
# Usage: bash egs/las_diversity.sh [workdir]   (default /tmp/pika_grammar)

. $(dirname $0)/path.sh
set -e

work=${1:-/tmp/pika_grammar}
SEED=${SEED:-1}
data=$work/data
dev=$work/dev
exp=$work/exp_seed$SEED
results=$work/RESULTS.las_ind.seed$SEED
: > $results

conf=$work/fbank.conf
model=$exp/model.epoch.159
mbr_model=$exp/mbr/model.epoch.1
[ -d $mbr_model ] || { echo "seed $SEED mbr model missing; run mini_grammar.sh first"; exit 1; }

aug_flags="--feats_dim 40 --lctx 1 --rctx 1 --stride 1
    --speed_rate 0.96,1.0,1.04 --gain_range 55,10
    --noise_lst $data/noise.lst --snr_range 10,30 --max_wav_seconds 4.0"

echo "=== stage 1: independent LAS fw/bw (own BLSTM encoder, 40 epochs) ==="
for d in fw bw; do
    rev=""; [ $d = bw ] && rev="--reverse_labels"
    mkdir -p $exp/las_ind_$d
    [ -d $exp/las_ind_$d/model.epoch.39 ] || python -m pika_tpu.train.train_las \
        $data/train/data.lst $exp/las_ind_$d/train.log $exp/las_ind_$d \
        --feat_config $conf --cmvn_stats $data/train/global_cmvn.stats \
        --SOS 0 --EOS 31 --padding_tgt 32 --padding_idx 32 --output_dim 32 \
        --enc_layers 3 --brnn --dec_layers 1 --rnn_size 256 --embd_dim 64 \
        --global_attention mlp --dropout 0.1 \
        --optim adam --initial_lr 3e-4 --final_lr 3e-5 \
        --num_epochs 40 --num_batches_per_epoch 94 --batch_size 16 \
        --sampling_decoder --sampling_prob 0.1 --increase_sampling_prob_epoch 20 \
        --seed $SEED $rev $aug_flags
done

las_flags="--las_rescorer_model $exp/las_ind_fw/model.epoch.39
    --las_rescorer_bw_model $exp/las_ind_bw/model.epoch.39 --SOS 0 --EOS 31"

decode_flags="--feat_config $conf --cmvn_stats $data/train/global_cmvn.stats
    --beam_size 4 --n_best 4 --max_symbols 16
    --feats_dim 40 --lctx 1 --rctx 1 --stride 1
    --batch_size 16 --max_wav_seconds 4.0 --output_scores"

# scales fixed by seed-1's mini_grammar dev tuning
pt_scale=${PT_SCALE:-1.2}

wer_of () {
    local tag=$1; shift
    if ! grep -qE "%WER" $exp/decode_$tag.out 2>/dev/null; then
        timeout 1500 "$@" > $exp/decode_$tag.out 2>&1 || true
    fi
    grep -E "%WER" $exp/decode_$tag.out | tail -1 | sed "s/^/$tag /" >> $results
    tail -1 $results
}

echo "=== stage 2: tune ind-LAS scales on DEV (pt-fused stack, one decode) ==="
if ! grep -q "chosen las_ind_scales" $exp/las_ind_sweep.note 2>/dev/null; then
    timeout 1500 python -m pika_tpu.train.eval_transducer \
        $mbr_model $dev/test/wav.scp $exp/nbest_dev_las_ind.txt \
        --ref_labels ark:$dev/test/label.txt $las_flags \
        --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
        --symbols_map $data/char.txt \
        --las_scale_sweep "0.0:0.0,0.05:0.05,0.1:0.1,0.2:0.2,0.3:0.3,0.5:0.5,0.3:0.7,0.7:0.3,1.0:1.0" \
        $decode_flags > $exp/decode_dev_las_ind.out 2>&1 || true
    pair=$(grep -E "^las_scales" $exp/decode_dev_las_ind.out \
           | awk '{print $4, $2}' | sort -g | head -1 | awk '{print $2}')
    [ -z "$pair" ] && { echo "dev sweep failed"; exit 1; }
    echo "chosen las_ind_scales $pair" > $exp/las_ind_sweep.note
    grep -E "^las_scales" $exp/decode_dev_las_ind.out >> $exp/las_ind_sweep.note || true
fi
pair=$(awk '/chosen las_ind_scales/{print $3}' $exp/las_ind_sweep.note)
fw_scale=${pair%%:*}; bw_scale=${pair##*:}
grep -E "^las_scales" $exp/las_ind_sweep.note | sed 's/^/dev /' >> $results || true
echo "chosen las_ind_scales fw $fw_scale bw $bw_scale" | tee -a $results

echo "=== stage 3: TEST — MBR + per-token fusion + independent LAS ==="
wer_of mbr_fst_pt_las_ind python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_mbr_fst_pt_las_ind.txt \
    --ref_labels ark:$data/test/label.txt $las_flags \
    --las_fw_score_scale $fw_scale --las_bw_score_scale $bw_scale \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags

echo "=== stage 4: TEST — plain MBR + independent LAS (no FST) ==="
wer_of mbr_las_ind python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_mbr_las_ind.txt \
    --ref_labels ark:$data/test/label.txt $las_flags \
    --las_fw_score_scale $fw_scale --las_bw_score_scale $bw_scale \
    $decode_flags

echo "=== RESULTS (las diversity, seed $SEED) ==="
cat $results
