#!/bin/bash
# Round-5 chain A: finish abs_h16 (resume from step 18000), then its
# quality report, the bf16-pair serving gate report, and the guarded pp
# random-init control. ONE TPU process at a time throughout.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/r5_chain.log
Q4=/tmp/prd_q4
echo "CHAIN_R5A_START $(date)" >> $LOG

# Wait for the TPU relay (probe every 2 min; generous timeout so a
# mid-acquire kill never extends the grant hold).
until timeout 600 python /tmp/tpu_probe.py > /tmp/r5_probe.log 2>&1; do
  echo "tpu_wait $(date)" >> $LOG
  sleep 120
done
echo "TPU_UP $(date)" >> $LOG

# --- 1) abs_h16: resume 18000 -> 20000; retry through relay drops ---
for attempt in 1 2 3; do
  if ls $Q4/run_abs_h16/checkpoints | grep -q '^20000$'; then break; fi
  timeout 7200 python -m protein_redesign_tpu.cli.train \
    --save_dir $Q4/run_abs_h16 \
    --trained_ckpt $Q4/run_abs_h16/checkpoints \
    --data_dir /tmp/prd_quality/data --cache_dir /tmp/prd_quality/data/cache \
    --training_mode --esm_dim 320 --single_dim 512 --pair_dim 64 \
    --num_blocks 4 --num_steps 1000 \
    --mask_prob 0.5 --batch_size 8 --buckets 256 --remat \
    --max_steps 20000 --lr_decay_steps 20000 \
    --val_every_steps 1000 --log_every_steps 100 \
    --checkpoint_top_k 3 --seed 0 --cache_device_batches \
    --head_dim 16 --num_heads 4 --seq_process absorbing \
    > /tmp/r5_train_abs_h16_a$attempt.log 2>&1
  echo "ABS_H16_ATTEMPT${attempt} rc=$? $(date)" >> $LOG
done
echo "R5_ABS_H16_TRAIN_DONE $(date)" >> $LOG

# --- 2) abs_h16 quality report ---
PRD_QUALITY_CKPT=$Q4/run_abs_h16/checkpoints \
PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r4_abs_h16.json \
timeout 7200 python benchmarks/quality_report.py \
  > /tmp/r5_report_abs_h16.log 2>&1
echo "R5_ABS_H16_REPORT_DONE rc=$? $(date)" >> $LOG

# --- 3) bf16-pair-stream serving gate: identical eval, lever forced ---
PRD_QUALITY_CKPT=$Q4/run_abs_h16/checkpoints \
PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r4_abs_h16_bf16pair.json \
PRD_QUALITY_OVERRIDES='{"pair_stream_bf16": true}' \
timeout 7200 python benchmarks/quality_report.py \
  > /tmp/r5_report_h16_bf16.log 2>&1
echo "R5_H16_BF16_REPORT_DONE rc=$? $(date)" >> $LOG

# --- 4) guarded pp random-init control ---
timeout 5400 python benchmarks/r4_pp_control.py > /tmp/r5_ppcontrol.log 2>&1
echo "R5_PPCONTROL_DONE rc=$? $(date)" >> $LOG

echo "R5A_DONE $(date)" >> $LOG
