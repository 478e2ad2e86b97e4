#!/bin/bash
# Round-5: dev-retune the fusion scales for the PRUNED-objective grammar
# model (tools/r5_pruned_grammar.sh) and decode test with its OWN scales.
# Rationale: the tune-once protocol reuses seed-1's scales, but those were
# dev-tuned on the FULL-loss model; the pruned objective trains the joint
# only on banded cells, so its beam-score calibration (and therefore the
# optimal LM scale) can differ.  Appends to $exp/RESULTS (same caching
# discipline as egs/mini_grammar.sh: completed decode_*.out are reused).
#
# Usage: SEED=1 bash tools/r5_pruned_retune.sh [workdir] > log 2>&1 &
. $(dirname $0)/../egs/path.sh
set -e

work=${1:-/tmp/pika_grammar}
SEED=${SEED:-1}
data=$work/data
dev=$work/dev
exp=$work/exp_seed${SEED}_pruned
results=$exp/RESULTS
model=$exp/model.epoch.159

conf=$work/fbank.conf
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

echo "=== retry the tune-once per-beam test row (transport-stalled) ==="
wer_of base_fst python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_fst.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale 0.8 --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags

echo "=== dev sweep: per-beam fst_lm_scale (pruned model's own) ==="
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

echo "=== dev sweep: per-token fst_lm_scale (pruned model's own) ==="
pt_scale=""; pt_best=1e9
for s in 0.2 0.4 0.8 1.2 1.6; do
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

echo "=== test decodes with the pruned model's OWN dev-tuned scales ==="
wer_of base_fst_own python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_fst_own.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $best_scale --fst_fusion per_beam \
    --symbols_map $data/char.txt $decode_flags
wer_of base_fst_pt_own python -m pika_tpu.train.eval_transducer \
    $model $data/test/wav.scp $exp/nbest_fst_pt_own.txt \
    --ref_labels ark:$data/test/label.txt \
    --fst_lm $data/lm.arpa --fst_lm_scale $pt_scale --fst_per_token \
    --symbols_map $data/char.txt $decode_flags

echo "### PRUNED RETUNE DONE $(date -u)"
cat $results
