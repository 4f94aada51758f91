#!/bin/bash
# Remaining TPU queue, strictly ONE TPU process at a time (concurrent
# processes share the chip and OOM each other's HBM — measured 23:16).
# Gated on the abs_h16 fix finishing (marker in the shared chain log).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/r4s2_chain.log
Q4=/tmp/prd_q4

until grep -q "ABS_H16_REPORT_FIX_DONE" $LOG 2>/dev/null; do sleep 120; done

# --- serving-lever quality validation on the abs_h16 checkpoint:
# identical eval, pair_stream_bf16 forced (numerics-only lever; rows
# directly comparable to quality_report_r4_abs_h16.json) ---
PRD_QUALITY_CKPT=$Q4/run_abs_h16/checkpoints \
PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r4_abs_h16_bf16pair.json \
PRD_QUALITY_OVERRIDES='{"pair_stream_bf16": true}' \
timeout 7200 python benchmarks/quality_report.py \
  > /tmp/r4s2_report_h16_bf16.log 2>&1
echo "H16_BF16_REPORT_DONE rc=$? $(date)" >> $LOG

# --- 5) pp random-init control, guarded ---
timeout 5400 python benchmarks/r4_pp_control.py > /tmp/r4s2_ppcontrol2.log 2>&1
echo "PPCONTROL2_DONE rc=$? $(date)" >> $LOG

# --- 6) 25k-complex epoch legs ---
EPOCH_PROTO="--data_dir /tmp/prd_pdbbind25k/data --cache_dir /tmp/prd_pdbbind25k/data/cache \
  --training_mode --esm_dim 320 --single_dim 512 --pair_dim 64 \
  --head_dim 64 --num_heads 1 --num_blocks 4 --num_steps 1000 \
  --mask_prob 0.5 --batch_size 8 --buckets 128,192,256 --no-remat \
  --max_epochs 1 --log_every_steps 200 --val_every_steps 100000 \
  --checkpoint_top_k 1 --seed 0"
( timeout 10800 python -m protein_redesign_tpu.cli.train \
    --save_dir $Q4/run_epoch_stream $EPOCH_PROTO \
    > /tmp/r4s2_epoch_stream.log 2>&1 & TPID=$!
  while kill -0 $TPID 2>/dev/null; do
    ps -o rss= -p $TPID >> /tmp/r4s2_epoch_stream.rss; sleep 20
  done; wait $TPID; echo "stream_rc=$?" >> /tmp/r4s2_epoch_stream.log )
echo "EPOCH_STREAM_DONE $(date)" >> $LOG
( timeout 10800 python -m protein_redesign_tpu.cli.train \
    --save_dir $Q4/run_epoch_cached $EPOCH_PROTO \
    --cache_device_batches --device_cache_gb 4 \
    > /tmp/r4s2_epoch_cached.log 2>&1 & TPID=$!
  while kill -0 $TPID 2>/dev/null; do
    ps -o rss= -p $TPID >> /tmp/r4s2_epoch_cached.rss; sleep 20
  done; wait $TPID; echo "cached_rc=$?" >> /tmp/r4s2_epoch_cached.log )
echo "EPOCH_CACHED_DONE $(date)" >> $LOG

# --- 4) abs_selfcond quality cell (rerun, LAST: longest) ---
timeout 12600 python -m protein_redesign_tpu.cli.train \
  --save_dir $Q4/run_abs_selfcond \
  --data_dir /tmp/prd_quality/data --cache_dir /tmp/prd_quality/data/cache \
  --training_mode --esm_dim 320 --single_dim 512 --pair_dim 64 \
  --num_blocks 4 --num_steps 1000 \
  --mask_prob 0.5 --batch_size 8 --buckets 256 --remat \
  --max_steps 20000 --lr_decay_steps 20000 \
  --val_every_steps 1000 --log_every_steps 100 \
  --checkpoint_top_k 3 --seed 0 --cache_device_batches \
  --head_dim 64 --num_heads 1 --seq_process absorbing --self_cond \
  > /tmp/r4s2_train_selfcond2.log 2>&1
echo "SELFCOND2_TRAIN_DONE rc=$? $(date)" >> $LOG
PRD_QUALITY_CKPT=$Q4/run_abs_selfcond/checkpoints \
PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r4_abs_selfcond.json \
timeout 7200 python benchmarks/quality_report.py \
  > /tmp/r4s2_report_selfcond2.log 2>&1
echo "SELFCOND2_REPORT_DONE rc=$? $(date)" >> $LOG

# --- serving-lever validation: same eval with pair_stream_bf16 forced ---
PRD_QUALITY_CKPT=$Q4/run_abs_selfcond/checkpoints \
PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r4_selfcond_bf16pair.json \
PRD_QUALITY_OVERRIDES='{"pair_stream_bf16": true}' \
timeout 7200 python benchmarks/quality_report.py \
  > /tmp/r4s2_report_selfcond_bf16b.log 2>&1
echo "SELFCOND_BF16B_REPORT_DONE rc=$? $(date)" >> $LOG

echo "CHAIN_G_ALL_DONE $(date)" >> $LOG
