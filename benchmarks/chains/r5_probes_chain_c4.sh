#!/bin/bash
# Round-5 chain C (gated on chain B): trimulx MFU probes (VERDICT #3),
# the ctx context-determined quality cell (VERDICT #2), wide-head
# long-context rungs (#5), epoch legs (#7) — each leg gated on enough
# wall-clock remaining before the driver's end-of-round bench needs the
# chip (hard stop: no new leg whose budget crosses ~16:50 UTC).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
LOG=/tmp/r5_chain.log
Q5=/tmp/prd_q5
mkdir -p $Q5
END=$(date -d "today 16:50 UTC" +%s)

left() { echo $(( END - $(date +%s) )); }

until grep -q "R5B_DONE" $LOG 2>/dev/null; do sleep 120; done
echo "CHAIN_R5C4_START $(date) secs_left=$(left)" >> $LOG

# --- 1) trimulx lever stack (needs ~1h incl compiles) ---
if [ $(left) -gt 4200 ]; then
  timeout 5400 python benchmarks/r5_probes.py trimulx > /tmp/r5_trimulx.log 2>&1
  echo "R5_TRIMULX_DONE rc=$? $(date)" >> $LOG
else
  echo "R5_TRIMULX_SKIPPED secs_left=$(left)" >> $LOG
fi

# --- 2) ctx quality cell: 20k matched-budget train (needs ~2.5-4h) ---
for attempt in 1 2; do
  if ls $Q5/run_ctx/checkpoints 2>/dev/null | grep -q '^20000$'; then break; fi
  [ $(left) -lt 9000 ] && { echo "R5_CTX_TRAIN_SKIPPED secs_left=$(left)" >> $LOG; break; }
  RESUME=""
  if ls $Q5/run_ctx/checkpoints 2>/dev/null | grep -q '^[0-9]'; then
    RESUME="--trained_ckpt $Q5/run_ctx/checkpoints"
  fi
  timeout $(( $(left) - 3600 )) python -m protein_redesign_tpu.cli.train \
    --save_dir $Q5/run_ctx $RESUME \
    --data_dir /tmp/prd_ctx/data --cache_dir /tmp/prd_ctx/data/cache \
    --training_mode --esm_dim 320 --single_dim 512 --pair_dim 64 \
    --num_blocks 4 --num_steps 1000 \
    --mask_prob 0.5 --batch_size 8 --buckets 256 --no-remat \
    --max_steps 20000 --lr_decay_steps 20000 \
    --val_every_steps 1000 --log_every_steps 100 \
    --checkpoint_top_k 3 --seed 0 --cache_device_batches \
    --head_dim 64 --num_heads 1 --seq_process absorbing \
    > /tmp/r5_train_ctx_a$attempt.log 2>&1
  echo "CTX_ATTEMPT${attempt} rc=$? $(date)" >> $LOG
done
echo "R5_CTX_TRAIN_DONE $(date)" >> $LOG

if ls $Q5/run_ctx/checkpoints 2>/dev/null | grep -q '^[0-9]' && [ $(left) -gt 1800 ]; then
  PRD_QUALITY_CKPT=$Q5/run_ctx/checkpoints \
  PRD_QUALITY_DATA=/tmp/prd_ctx/data \
  PRD_QUALITY_REPORT_OUT=/root/repo/benchmarks/quality_report_r5_ctx.json \
  timeout $(left) python benchmarks/quality_report.py \
    > /tmp/r5_report_ctx.log 2>&1
  echo "R5_CTX_REPORT_DONE rc=$? $(date)" >> $LOG
else
  echo "R5_CTX_REPORT_SKIPPED secs_left=$(left)" >> $LOG
fi

# --- 2b) bench.py pre-run: lands round-5 headline numbers in the log
# and warms the XLA compile cache for the driver's end-of-round run.
if [ $(left) -gt 3000 ]; then
  PRD_TPU_WAIT_S=60 timeout 4800 python bench.py > /tmp/r5_bench_prerun.log 2>&1
  echo "R5_BENCH_PRERUN_DONE rc=$? $(date)" >> $LOG
else
  echo "R5_BENCH_PRERUN_SKIPPED secs_left=$(left)" >> $LOG
fi

# --- 3) wide-head long-context rungs (needs ~1.5h) ---
if [ $(left) -gt 2400 ]; then
  timeout $(left) python benchmarks/r5_probes.py widelong > /tmp/r5_widelong.log 2>&1
  echo "R5_WIDELONG_DONE rc=$? $(date)" >> $LOG
else
  echo "R5_WIDELONG_SKIPPED secs_left=$(left)" >> $LOG
fi

# --- 3b) multi-head wide cell (advisor r4; short) ---
if [ $(left) -gt 2400 ]; then
  timeout $(left) python benchmarks/r5_probes.py widemh > /tmp/r5_widemh.log 2>&1
  echo "R5_WIDEMH_DONE rc=$? $(date)" >> $LOG
else
  echo "R5_WIDEMH_SKIPPED secs_left=$(left)" >> $LOG
fi

# --- 4) device-side 25k epoch legs (~1h each typical) ---
EPOCH_PROTO="--data_dir /tmp/prd_pdbbind25k/data --cache_dir /tmp/prd_pdbbind25k/data/cache \
  --training_mode --esm_dim 320 --single_dim 512 --pair_dim 64 \
  --head_dim 64 --num_heads 1 --num_blocks 4 --num_steps 1000 \
  --mask_prob 0.5 --batch_size 8 --buckets 128,192,256 --no-remat \
  --max_epochs 1 --log_every_steps 200 --val_every_steps 100000 \
  --checkpoint_top_k 1 --seed 0"
if [ $(left) -gt 5400 ]; then
  ( timeout $(( $(left) - 1800 )) python -m protein_redesign_tpu.cli.train \
      --save_dir $Q5/run_epoch_stream $EPOCH_PROTO \
      > /tmp/r5_epoch_stream.log 2>&1 & TPID=$!
    while kill -0 $TPID 2>/dev/null; do
      ps -o rss= -p $TPID >> /tmp/r5_epoch_stream.rss; sleep 20
    done; wait $TPID; echo "stream_rc=$?" >> /tmp/r5_epoch_stream.log )
  echo "R5_EPOCH_STREAM_DONE $(date)" >> $LOG
else
  echo "R5_EPOCH_STREAM_SKIPPED secs_left=$(left)" >> $LOG
fi
if [ $(left) -gt 5400 ]; then
  ( timeout $(( $(left) - 1800 )) python -m protein_redesign_tpu.cli.train \
      --save_dir $Q5/run_epoch_cached $EPOCH_PROTO \
      --cache_device_batches --device_cache_gb 4 \
      > /tmp/r5_epoch_cached.log 2>&1 & TPID=$!
    while kill -0 $TPID 2>/dev/null; do
      ps -o rss= -p $TPID >> /tmp/r5_epoch_cached.rss; sleep 20
    done; wait $TPID; echo "cached_rc=$?" >> /tmp/r5_epoch_cached.log )
  echo "R5_EPOCH_CACHED_DONE $(date)" >> $LOG
else
  echo "R5_EPOCH_CACHED_SKIPPED secs_left=$(left)" >> $LOG
fi

echo "R5C_DONE $(date)" >> $LOG
