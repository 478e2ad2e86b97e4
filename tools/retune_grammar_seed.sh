#!/bin/bash
# Re-tune one grammar seed's fusion/rescoring scales on DEV independently
# (VERDICT r4 item 5): the committed matrix reuses seed-1's dev-tuned
# scales for seeds 2-3 (the tune-once deployment protocol); this script
# measures what per-seed tuning would change.  Appends to
# $work/RESULTS.seed$SEED.retune; reuses any decode_*.out already present
# (same caching discipline as egs/mini_grammar.sh).
#
# Usage: SEED=2 bash tools/retune_grammar_seed.sh [workdir]
. $(dirname $0)/../egs/path.sh
set -e

work=${1:-/tmp/pika_grammar}
SEED=${SEED:-2}
data=$work/data
dev=$work/dev
exp=$work/exp_seed$SEED
results=$work/RESULTS.seed$SEED.retune
: > $results

conf=$work/fbank.conf
model=$exp/model.epoch.159
mbr_model=$exp/mbr/model.epoch.1
las_flags="--las_rescorer_model $exp/las_fw/model.epoch.7
    --las_rescorer_bw_model $exp/las_bw/model.epoch.7 --SOS 0 --EOS 31"
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

echo "=== dev sweep: per-beam fst_lm_scale (seed $SEED's own) ==="
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
    [ -z "$w" ] && { rm -f $exp/decode_devfst$s.out; continue; }
    echo "dev fst_lm_scale $s -> WER $w" | tee -a $results
    better=$(python -c "print(1 if $w < $best_wer else 0)")
    [ "$better" = 1 ] && { best_wer=$w; best_scale=$s; }
done
echo "chosen fst_lm_scale $best_scale (dev WER $best_wer)" | tee -a $results

echo "=== dev sweep: per-token fst_lm_scale ==="
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
    [ -z "$w" ] && { rm -f $exp/decode_devpt$s.out; continue; }
    echo "dev pt fst_lm_scale $s -> WER $w" | tee -a $results
    better=$(python -c "print(1 if $w < $pt_best else 0)")
    [ "$better" = 1 ] && { pt_best=$w; pt_scale=$s; }
done
echo "chosen pt fst_lm_scale $pt_scale (dev WER $pt_best)" | tee -a $results

echo "=== dev sweep: shared-encoder LAS scales on the pt-fused stack ==="
if ! grep -q "chosen las_scales" $exp/las_retune.note 2>/dev/null; then
    timeout 1500 python -m pika_tpu.train.eval_transducer \
        $mbr_model $dev/test/wav.scp $exp/nbest_dev_las_rt.txt \
        --ref_labels ark:$dev/test/label.txt $las_flags \
        --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
        --symbols_map $data/char.txt \
        --las_scale_sweep "0.0:0.0,0.05:0.05,0.1:0.1,0.2:0.2,0.3:0.3,0.5:0.5,0.3:0.7,0.7:0.3" \
        $decode_flags > $exp/decode_dev_las_rt.out 2>&1 || true
    pair=$(grep -E "^las_scales" $exp/decode_dev_las_rt.out \
           | awk '{print $4, $2}' | sort -g | head -1 | awk '{print $2}')
    [ -z "$pair" ] && pair="0.05:0.05"
    echo "chosen las_scales $pair" > $exp/las_retune.note
    grep -E "^las_scales" $exp/decode_dev_las_rt.out >> $exp/las_retune.note || true
fi
pair=$(awk '/chosen las_scales/{print $3}' $exp/las_retune.note)
las_fw_scale=${pair%%:*}; las_bw_scale=${pair##*:}
grep -E "^las_scales" $exp/las_retune.note | sed 's/^/dev /' >> $results || true
echo "chosen las_scales fw $las_fw_scale bw $las_bw_scale" | tee -a $results

echo "=== TEST decodes with seed $SEED's OWN scales ==="
wer_of rt_base_fst python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_rt_fst.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $best_scale --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags
wer_of rt_mbr_fst python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_rt_mbr_fst.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $best_scale --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags
wer_of rt_base_fst_pt python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_rt_fst_pt.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags
wer_of rt_mbr_fst_pt python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_rt_mbr_fst_pt.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags
wer_of rt_mbr_fst_pt_las python -m pika_tpu.train.eval_transducer \
    $mbr_model $data/test/wav.scp $exp/nbest_rt_full.txt \
    --ref_labels ark:$data/test/label.txt $las_flags \
    --las_fw_score_scale $las_fw_scale --las_bw_score_scale $las_bw_scale \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags

echo "=== RETUNE RESULTS (seed $SEED) ==="
cat $results
