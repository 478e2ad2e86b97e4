#!/bin/bash
# Round-4 chip-window measurement suite (VERDICT r3 items 2-4): runs the
# moment the grammar matrix releases the chip.  Each job is bounded and
# logged; the analysis happens afterwards from the log.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
log=${1:-/tmp/chip_window.log}
run () {
    echo "### $* — $(date -u)" | tee -a $log
    timeout 1200 "$@" >> $log 2>&1
    echo "### exit $? $(date -u)" | tee -a $log
}

# item 2: train-step component profile at the throughput-optimal batch
run python tools/profile_step.py --batch 32
# dropout ablation: how much of the step is attention-prob dropout masks
run python tools/profile_step.py --batch 32 --dropout 0.0
# flash-attention core: parity + speed vs the einsum path
run python tools/check_flash_attn.py

# item 3: decode batch-scaling attribution (encoder vs while_loop)
run python tools/bench_decode.py --batch 8 --beam 8 --attribution
run python tools/bench_decode.py --batch 32 --beam 8 --attribution
run python tools/bench_decode.py --batch 64 --beam 8 --attribution

# item 4: RTF cost of the two fusion modes at the flagship decode shape
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_beam
run python tools/bench_decode.py --batch 32 --beam 8 --fst per_token

echo "CHIP WINDOW SUITE DONE $(date -u)" | tee -a $log
