#!/bin/bash
# Round-5 chain B2: abs_selfcond cell WITH --remat. The no-remat attempt
# OOMed the chip with no concurrent process — the self_cond two-pass
# forward roughly doubles live activations, so h64x1 bucket 256 B=8
# needs remat (numerics-preserving; same protocol amendment as abs_h16).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/r5_chain.log
Q4=/tmp/prd_q4
echo "CHAIN_R5B2_START $(date)" >> $LOG

for attempt in 1 2 3; do
  if ls $Q4/run_abs_selfcond/checkpoints 2>/dev/null | grep -q '^20000$'; then break; fi
  RESUME=""
  if ls $Q4/run_abs_selfcond/checkpoints 2>/dev/null | grep -q '^[0-9]'; then
    RESUME="--trained_ckpt $Q4/run_abs_selfcond/checkpoints"
  fi
  timeout 18000 python -m protein_redesign_tpu.cli.train \
    --save_dir $Q4/run_abs_selfcond $RESUME \
    --data_dir /tmp/prd_quality/data --cache_dir /tmp/prd_quality/data/cache \
    --training_mode --esm_dim 320 --single_dim 512 --pair_dim 64 \
    --num_blocks 4 --num_steps 1000 \
    --mask_prob 0.5 --batch_size 8 --buckets 256 --remat \
    --max_steps 20000 --lr_decay_steps 20000 \
    --val_every_steps 1000 --log_every_steps 100 \
    --checkpoint_top_k 3 --seed 0 --cache_device_batches \
    --head_dim 64 --num_heads 1 --seq_process absorbing --self_cond \
    > /tmp/r5_train_selfcond_b$attempt.log 2>&1
  echo "SELFCOND_B_ATTEMPT${attempt} rc=$? $(date)" >> $LOG
done
echo "R5_SELFCOND_TRAIN_DONE $(date)" >> $LOG

if ls $Q4/run_abs_selfcond/checkpoints 2>/dev/null | grep -q '^[0-9]'; then
  PRD_QUALITY_CKPT=$Q4/run_abs_selfcond/checkpoints \
  PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r4_abs_selfcond.json \
  timeout 7200 python benchmarks/quality_report.py \
    > /tmp/r5_report_selfcond.log 2>&1
  echo "R5_SELFCOND_REPORT_DONE rc=$? $(date)" >> $LOG
else
  echo "R5_SELFCOND_REPORT_SKIPPED no checkpoint $(date)" >> $LOG
fi

echo "R5B_DONE $(date)" >> $LOG
