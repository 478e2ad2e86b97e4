#!/bin/bash
# Round-4 driver: run egs/mini_grammar.sh for SEED=1..3 serially on the
# one real chip.  Stages 0-2 (corpus+LM) are shared; the recipe is
# restart-safe (completed stages/decodes are reused), so each seed gets
# up to 3 attempts — a transport-hang episode must not eat a seed the
# way it ate round 3's LAS stage.
cd /root/repo
work=${1:-/tmp/pika_grammar}
for s in 1 2 3; do
    for attempt in 1 2 3; do
        echo "===== SEED $s attempt $attempt start $(date) ====="
        SEED=$s timeout 7200 bash egs/mini_grammar.sh $work 2>&1 | tail -40
        if grep -q "^mbr_fst_pt_las " $work/RESULTS.seed$s 2>/dev/null; then
            echo "===== SEED $s complete $(date) ====="
            break
        fi
        echo "===== SEED $s attempt $attempt incomplete; retrying ====="
    done
done
echo "ALL SEEDS DONE $(date)"
