#!/bin/bash
# abs_h16 take 3: resume from the step-4000 checkpoint after the relay
# outage killed the first run's connection (hung 47 min post-recovery).
# Writes the SAME end markers chain_r4s2_f polls for.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/r4s2_chain.log
Q4=/tmp/prd_q4

timeout 14400 python -m protein_redesign_tpu.cli.train \
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
  > /tmp/r4s2_train_abs_h16_resume.log 2>&1
echo "ABS_H16_TRAIN_FIX_DONE rc=$? $(date)" >> $LOG
PRD_QUALITY_CKPT=$Q4/run_abs_h16/checkpoints \
PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r4_abs_h16.json \
timeout 7200 python benchmarks/quality_report.py \
  > /tmp/r4s2_report_abs_h16_fix.log 2>&1
echo "ABS_H16_REPORT_FIX_DONE rc=$? $(date)" >> $LOG
