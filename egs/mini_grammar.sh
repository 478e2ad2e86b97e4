#!/bin/bash
# Grammar-corpus quality recipe: makes the MBR / LAS-rescoring / FST-fusion
# stages measurable (VERDICT r2 item 3).  Same acoustics as
# egs/mini_synthetic.sh (formant tokens, unseen test speakers AND unseen
# test noise) but TEST/DEV transcripts are drawn from a sparse bigram
# grammar (6 successors per token out of 30, fixed grammar seed) while
# TRAIN transcripts stay uniform, and the bigram ARPA LM is estimated
# from grammar-sampled TEXT (no audio) — the realistic
# AM-on-broad-data / LM-on-domain-text split: the model CANNOT have
# learned the grammar internally, so external fusion/rescoring must
# carry the ~2.3 bits/token of LM signal.
#
# (A first variant trained ON grammar transcripts: the prediction net
# then absorbs the structure itself — baseline 3.76% WER at 5-15 dB,
# FST fusion still +0.25 abs [3.76->3.51], MBR/LAS flat at that floor.
# Recorded in BASELINE.md; this split design is the headline.)
#
# Methodology:
# - The corpus (train/test) and a separate DEV corpus (different corpus
#   seed: different speakers/noise draws, same grammar) are generated
#   once and shared by all training seeds.
# - fst_lm_scale is tuned on DEV only; the table reports TEST WER.
# - Run with SEED=1..3 to get the multi-seed spread; every stage's WER is
#   appended to $work/RESULTS.seed$SEED.
#
# Usage:  SEED=1 bash egs/mini_grammar.sh [workdir]   (default /tmp/pika_grammar)
# Full pipeline (MBR + LAS stages) is always on for this recipe.

. $(dirname $0)/path.sh
set -e

work=${1:-/tmp/pika_grammar}
SEED=${SEED:-1}
data=$work/data
dev=$work/dev
exp=$work/exp_seed$SEED
results=$work/RESULTS.seed$SEED
mkdir -p $exp
: > $results

conf=$work/fbank.conf
cat > $conf <<EOF
--window-type=hamming
--sample-frequency=16000
--dither=1.0
--low-freq=40
--high-freq=-200
--num-mel-bins=40
EOF

# guard on the LAST artifact of stages 0-2 (lm.arpa), not the first: a
# run killed mid-stage-2 must redo the block on restart
if [ ! -f $data/lm.arpa ]; then
    echo "=== stage 0: synthesize grammar corpus (1500 train / 400 test; dev 200) ==="
    # test SNR 5-15 dB — harder than the training augmentation range
    # (10-30): the baseline must make enough errors (~8-15% WER) for the
    # LM/rescoring stages to have correction headroom; at the
    # mini_synthetic 12-22 dB setting this grammar corpus decodes at
    # 2.6% WER and every stage delta drowns in quantization
    python tools/make_hard_corpus.py $data --train 1500 --test 400 \
        --grammar_branching 6 --grammar_split test --grammar_text 6000 \
        --test_snr 5,15
    # dev: same grammar, DIFFERENT corpus seed => unseen speakers/noise,
    # used only to tune fusion scales
    python tools/make_hard_corpus.py $dev --train 1 --test 200 --seed 4047 \
        --grammar_branching 6 --grammar_split test --test_snr 5,15

    echo "=== stage 1: wav.scp -> mrk/seq archives + data.lst ==="
    python -m pika_tpu.data.prep wav_to_seq $data/train/wav.scp \
        $data/train/train.mrk $data/train/train.seq > $data/train/shards.txt
    awk -v lab="ark:$data/train/label.txt" '{print $1, $2, lab}' \
        $data/train/shards.txt > $data/train/data.lst

    echo "=== stage 2: global CMVN + bigram ARPA LM from training transcripts ==="
    python -m pika_tpu.data.prep compute_global_cmvn $data/train/data.lst \
        $data/train/global_cmvn.stats --feat_config $conf
    # LM from grammar TEXT, not the (uniform) acoustic-training transcripts
    python tools/train_ngram.py ark:$data/grammar_text.txt $data/char.txt \
        $data/lm.arpa
fi

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

echo "=== stage 3a: RNN-T warm-up, clean augmentation (20 epochs, seed $SEED) ==="
[ -d $exp/model.epoch.19 ] || python -m pika_tpu.train.train_transducer \
    $data/train/data.lst $exp/train_warmup.log $exp \
    --feat_config $conf --cmvn_stats $data/train/global_cmvn.stats \
    --optim adam --initial_lr 0.001 --final_lr 0.0008 \
    --num_epochs 20 $model_flags

echo "=== stage 3b: RNN-T training with noise SNR 10-30 dB (resume, to epoch 160) ==="
[ -d $exp/model.epoch.159 ] || python -m pika_tpu.train.train_transducer \
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

wer_of () {  # wer_of TAG CMD... — run, grep the WER line, append to results
    # per-decode bound: the tunnel transport has rare multi-minute hang
    # episodes; a wedged decode must not eat the whole run.  A completed
    # decode (its .out has a %WER line) is reused on restart, so a
    # killed/rerun recipe only pays for the decodes it never finished.
    local tag=$1; shift
    if ! grep -qE "%WER" $exp/decode_$tag.out 2>/dev/null; then
        timeout 1500 "$@" > $exp/decode_$tag.out 2>&1 || true
    fi
    grep -E "%WER" $exp/decode_$tag.out | tail -1 | sed "s/^/$tag /" >> $results
    tail -1 $results
}

echo "=== stage 4: TEST decode — baseline beam ==="
wer_of base python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_base.txt \
    --ref_labels ark:$data/test/label.txt $decode_flags

echo "=== stage 4b: tune fst_lm_scale on DEV, decode TEST with FST fusion ==="
# FST_SCALE env: reuse a scale already dev-tuned by another seed —
# fixed hyperparameters across seeds make the reported spread pure
# training-seed variance (and skip ~5 dev decodes per extra seed)
if [ -n "$FST_SCALE" ]; then
    best_scale=$FST_SCALE
    echo "chosen fst_lm_scale $best_scale (reused, tuned by seed 1)" | tee -a $results
else
wer_of dev_base python -m pika_tpu.train.eval_transducer \
    $model $dev/test/wav.scp $exp/nbest_dev_base.txt \
    --ref_labels ark:$dev/test/label.txt $decode_flags
best_scale=""; best_wer=1e9
for s in 0.2 0.4 0.8 1.2; do
    if ! grep -qE "%WER" $exp/decode_devfst$s.out 2>/dev/null; then
        timeout 1500 python -m pika_tpu.train.eval_transducer \
            $model $dev/test/wav.scp $exp/nbest_dev_fst$s.txt \
            --ref_labels ark:$dev/test/label.txt \
            --fst_lm $data/lm.arpa --fst_lm_scale $s --fst_fusion per_beam \
            --symbols_map $data/char.txt \
            $decode_flags > $exp/decode_devfst$s.out 2>&1 || true
    fi
    w=$(grep -oE "%WER [0-9.]+" $exp/decode_devfst$s.out | awk '{print $2}' | tail -1)
    if [ -z "$w" ]; then
        # decode wedged past its timeout: drop the cached empty .out so a
        # restart retries it, and skip this scale rather than abort
        rm -f $exp/decode_devfst$s.out
        echo "dev fst_lm_scale $s -> decode failed; skipping" | tee -a $results
        continue
    fi
    echo "dev fst_lm_scale $s -> WER $w" | tee -a $results
    better=$(python -c "print(1 if $w < $best_wer else 0)")
    if [ "$better" = 1 ]; then best_wer=$w; best_scale=$s; fi
done
if [ -z "$best_scale" ]; then
    echo "no dev decode succeeded; cannot tune fst_lm_scale" | tee -a $results
    exit 1
fi
echo "chosen fst_lm_scale $best_scale (dev WER $best_wer)" | tee -a $results
fi
wer_of base_fst python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_fst.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $best_scale --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags

aug_flags="--feats_dim 40 --lctx 1 --rctx 1 --stride 1
    --speed_rate 0.96,1.0,1.04 --gain_range 55,10
    --noise_lst $data/noise.lst --snr_range 10,30 --max_wav_seconds 4.0
    --rng_impl threefry2x32"

echo "=== stage 5: MBR fine-tuning (seed $SEED) ==="
mkdir -p $exp/mbr
[ -d $exp/mbr/model.epoch.1 ] || python -m pika_tpu.train.train_mbr \
    $data/train/data.lst $exp/mbr/train.log $exp/mbr \
    --feat_config $conf --cmvn_stats $data/train/global_cmvn.stats \
    --init_model $model \
    --initial_lr 2e-5 --final_lr 5e-6 --grad_clip 3.0 --momentum 0.9 \
    --num_epochs 2 --num_batches_per_epoch 94 --batch_size 16 \
    --output_dim 31 --beam_size 4 --sm_scale 1.2 --rnnt_scale 0.02 \
    --seed $SEED $aug_flags
mbr_model=$exp/mbr/model.epoch.1

echo "=== stage 5b: TEST decode — MBR model (plain and +FST) ==="
wer_of mbr python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_mbr.txt \
    --ref_labels ark:$data/test/label.txt $decode_flags
wer_of mbr_fst python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_mbr_fst.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $best_scale --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags

echo "=== stage 6: LAS forward + backward rescorer training (seed $SEED) ==="
for d in fw bw; do
    rev=""; [ $d = bw ] && rev="--reverse_labels"
    mkdir -p $exp/las_$d
    [ -d $exp/las_$d/model.epoch.7 ] || python -m pika_tpu.train.train_las \
        $data/train/data.lst $exp/las_$d/train.log $exp/las_$d \
        --feat_config $conf --cmvn_stats $data/train/global_cmvn.stats \
        --shared_encoder_model $model \
        --SOS 0 --EOS 31 --padding_tgt 32 --padding_idx 32 --output_dim 32 \
        --enc_layers 1 --dec_layers 1 --rnn_size 128 --embd_dim 32 \
        --global_attention mlp \
        --optim adam --initial_lr 3e-4 --final_lr 5e-5 \
        --num_epochs 8 --num_batches_per_epoch 94 --batch_size 16 \
        --sampling_decoder --sampling_prob 0.1 --increase_sampling_prob_epoch 4 \
        --seed $SEED $rev $aug_flags
done

las_flags="--las_rescorer_model $exp/las_fw/model.epoch.7
    --las_rescorer_bw_model $exp/las_bw/model.epoch.7 --SOS 0 --EOS 31"

echo "=== stage 7a: tune LAS rescoring scales on DEV (one decode, sweep) ==="
# the reference hardcodes 1.0/0.3/0.7 (egs/local/nbest_rerank.py:53-58);
# here the fw:bw pair is tuned on the held-out dev corpus in the full-
# stack (FST-fused) context — one decode, every pair reranked in-process
if [ -n "$LAS_PAIR" ] && ! grep -q "chosen las_scales" $exp/las_sweep.note 2>/dev/null; then
    # reuse the fw:bw pair dev-tuned by seed 1 (see FST_SCALE note)
    echo "chosen las_scales $LAS_PAIR (reused, tuned by seed 1)" > $exp/las_sweep.note
fi
if ! grep -q "chosen las_scales" $exp/las_sweep.note 2>/dev/null; then
    timeout 1500 python -m pika_tpu.train.eval_transducer \
        $mbr_model $dev/test/wav.scp $exp/nbest_dev_las.txt \
        --ref_labels ark:$dev/test/label.txt $las_flags \
        --fst_lm $data/lm.arpa --fst_lm_scale $best_scale --fst_fusion per_beam \
        --symbols_map $data/char.txt \
        --las_scale_sweep "0.05:0.05,0.1:0.1,0.2:0.2,0.3:0.3,0.5:0.5,0.3:0.7,0.7:0.3,0.15:0.35" \
        $decode_flags > $exp/decode_dev_las.out 2>&1 || true
    pair=$(grep -E "^las_scales" $exp/decode_dev_las.out \
           | awk '{print $4, $2}' | sort -g | head -1 | awk '{print $2}')
    [ -z "$pair" ] && pair="0.3:0.7"
    echo "chosen las_scales $pair" > $exp/las_sweep.note
    grep -E "^las_scales" $exp/decode_dev_las.out >> $exp/las_sweep.note || true
fi
pair=$(awk '/chosen las_scales/{print $3}' $exp/las_sweep.note)
las_fw_scale=${pair%%:*}; las_bw_scale=${pair##*:}
echo "chosen las_scales fw $las_fw_scale bw $las_bw_scale" | tee -a $results

echo "=== stage 7: TEST decode — MBR + LAS fw/bw rescoring ==="
wer_of mbr_las python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_mbr_las.txt \
    --ref_labels ark:$data/test/label.txt $las_flags \
    --las_fw_score_scale $las_fw_scale --las_bw_score_scale $las_bw_scale \
    $decode_flags

echo "=== stage 8: TEST decode — full stack (MBR + LAS + FST fusion) ==="
wer_of mbr_las_fst python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_full.txt \
    --ref_labels ark:$data/test/label.txt $las_flags \
    --las_fw_score_scale $las_fw_scale --las_bw_score_scale $las_bw_scale \
    --fst_lm $data/lm.arpa --fst_lm_scale $best_scale --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags

echo "=== stage 9a: tune fst_lm_scale for PER-TOKEN fusion on DEV ==="
# per-candidate fusion changes the effective LM strength (the LM picks
# tokens, not just beams), so its scale is tuned separately
if [ -n "$PT_SCALE" ]; then
    pt_scale=$PT_SCALE
    echo "chosen pt fst_lm_scale $pt_scale (reused, tuned by seed 1)" | tee -a $results
else
pt_scale=""; pt_best=1e9
for s in 0.4 0.8 1.2 1.6; do
    if ! grep -qE "%WER" $exp/decode_devpt$s.out 2>/dev/null; then
        timeout 1500 python -m pika_tpu.train.eval_transducer \
            $model $dev/test/wav.scp $exp/nbest_dev_pt$s.txt \
            --ref_labels ark:$dev/test/label.txt \
            --fst_lm $data/lm.arpa --fst_lm_scale $s --fst_per_token \
            --symbols_map $data/char.txt \
            $decode_flags > $exp/decode_devpt$s.out 2>&1 || true
    fi
    w=$(grep -oE "%WER [0-9.]+" $exp/decode_devpt$s.out | awk '{print $2}' | tail -1)
    if [ -z "$w" ]; then
        rm -f $exp/decode_devpt$s.out
        echo "dev pt fst_lm_scale $s -> decode failed; skipping" | tee -a $results
        continue
    fi
    echo "dev pt fst_lm_scale $s -> WER $w" | tee -a $results
    better=$(python -c "print(1 if $w < $pt_best else 0)")
    if [ "$better" = 1 ]; then pt_best=$w; pt_scale=$s; fi
done
[ -z "$pt_scale" ] && pt_scale=$best_scale
echo "chosen pt fst_lm_scale $pt_scale (dev WER $pt_best)" | tee -a $results
fi

echo "=== stage 9: per-token fusion (--fst_per_token) decodes ==="
# per-candidate LM advance at selection time (a pika_tpu extension; the
# reference's own semantics is the per-beam prefix bias with winners-only
# advance, beam_transducer.py:93-97,136-159 = stages 4b-8 above)
wer_of base_fst_pt python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_fst_pt.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags
wer_of mbr_fst_pt python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_mbr_fst_pt.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags

echo "=== stage 10: FULL stack — MBR + per-token fusion + LAS rescoring ==="
wer_of mbr_fst_pt_las python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_mbr_fst_pt_las.txt \
    --ref_labels ark:$data/test/label.txt $las_flags \
    --las_fw_score_scale $las_fw_scale --las_bw_score_scale $las_bw_scale \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags

echo "=== RESULTS (seed $SEED) ==="
cat $results
