#!/bin/bash
# Round-4 driver: run egs/mini_grammar.sh for SEED=1..3 serially on the
# one real chip.  Stages 0-2 (corpus+LM) are shared; the recipe is
# restart-safe (completed stages/decodes are reused), so each seed gets
# up to 3 attempts — a transport-hang episode must not eat a seed the
# way it ate round 3's LAS stage.
cd /root/repo
work=${1:-/tmp/pika_grammar}
for s in 1 2 3; do
    # seeds 2-3 reuse the scales dev-tuned by seed 1: fixed
    # hyperparameters across seeds make the spread pure training-seed
    # variance and skip ~10 dev decodes per extra seed
    scales=""
    if [ $s -gt 1 ] && [ -f $work/RESULTS.seed1 ]; then
        fs=$(awk '/^chosen fst_lm_scale/{print $3}' $work/RESULTS.seed1 | tail -1)
        pt=$(awk '/^chosen pt fst_lm_scale/{print $4}' $work/RESULTS.seed1 | tail -1)
        lp=$(awk '/^chosen las_scales fw/{print $4":"$6}' $work/RESULTS.seed1 | tail -1)
        [ -n "$fs" ] && scales="FST_SCALE=$fs"
        [ -n "$pt" ] && scales="$scales PT_SCALE=$pt"
        [ -n "$lp" ] && scales="$scales LAS_PAIR=$lp"
        echo "seed $s reusing seed-1 scales: $scales"
    fi
    for attempt in 1 2 3; do
        echo "===== SEED $s attempt $attempt start $(date) ====="
        env SEED=$s $scales timeout 7200 bash egs/mini_grammar.sh $work 2>&1 | tail -40
        if grep -q "^mbr_fst_pt_las " $work/RESULTS.seed$s 2>/dev/null; then
            echo "===== SEED $s complete $(date) ====="
            break
        fi
        echo "===== SEED $s attempt $attempt incomplete; retrying ====="
    done
done
echo "ALL SEEDS DONE $(date)"
