#!/bin/bash
# Device-side epoch legs (VERDICT r4 #7), session-tested 2026-08-21.
# Measures the axon host-RAM transfer leak ON the chip at dataset scale:
#   leg A  streaming batches (no device cache)  -> linear host-RSS growth
#   leg B  --cache_device_batches --device_cache_gb 4 + --remat
#          -> RSS bounded by the one-epoch fill; flat steady state
# Protocol notes from the session that landed the numbers:
#   * 2.4k-complex subset of the 25k synthetic PDBbind tree (the 1-core
#     host generates raw at ~13/s and featurizes at ~12/s; scale the id
#     lists to the wall-clock you have — the leak slope is per-STEP, so
#     the subset measures the same number the full corpus would).
#   * leg B at bucket 256 B=8 h64x1 MUST use --remat: the ~3.3 GB
#     device-resident batch cache plus the no-remat step's activations
#     RESOURCE_EXHAUSTs one v5e (measured 19:16 UTC; same lesson as the
#     self-cond two-pass, CLAUDE.md). Streaming leg A fits no-remat.
#   * end legs NATURALLY via --max_steps — a timeout kill while holding
#     the chip poisons the tunnel grant for ~15 min for whatever runs
#     next.
#   * analyze with: python benchmarks/epoch_rss_analysis.py <rss> <log> <leg>
# Reference epoch loop being scaled: data.py:206-259.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
D2K=/tmp/prd_pdbbind2k/data
LOG=/tmp/r5s2_chain.log

# data (CPU): raw tree + split-list subset + featurize cache
python benchmarks/prep_pdbbind_scale.py --splits train --limit 2408
python benchmarks/prep_pdbbind_scale.py --splits val test --limit 48
mkdir -p $D2K
head -n 2408 /root/repo/data/PRD_train_pdb_ids > $D2K/PRD_train_pdb_ids
head -n 48 /root/repo/data/PRD_val_pdb_ids > $D2K/PRD_val_pdb_ids
head -n 48 /root/repo/data/PRD_test_pdb_ids > $D2K/PRD_test_pdb_ids
PRD_PLATFORM=cpu python -m protein_redesign_tpu.cli.preprocess_pdbbind \
  --data_dir $D2K --pdbbind_dir /tmp/prd_pdbbind25k/data/PDBbind_processed \
  --cache_dir $D2K/cache

PROTO="--data_dir $D2K --cache_dir $D2K/cache \
  --training_mode --esm_dim 320 --single_dim 512 --pair_dim 64 \
  --head_dim 64 --num_heads 1 --num_blocks 4 --num_steps 1000 \
  --mask_prob 0.5 --batch_size 8 --buckets 256 \
  --log_every_steps 50 --val_every_steps 100000 \
  --checkpoint_top_k 1 --seed 0"

run_leg() {  # run_leg <name> <extra flags...>
  local name=$1; shift
  python -m protein_redesign_tpu.cli.train \
    --save_dir /tmp/prd_q5s2/run_$name $PROTO "$@" \
    > /tmp/r5s2_epoch_$name.log 2>&1 & local TPID=$!
  while kill -0 $TPID 2>/dev/null; do
    echo "$(date +%s) $(ps -o rss= -p $TPID)" >> /tmp/r5s2_epoch_$name.rss
    sleep 10
  done
  wait $TPID; echo "${name}_rc=$?" >> /tmp/r5s2_epoch_$name.log
  echo "EPOCH_${name}_DONE $(date -u)" >> $LOG
}

run_leg stream --no-remat --max_epochs 2 --max_steps 400
run_leg cached --remat --max_epochs 2 --max_steps 500 \
  --cache_device_batches --device_cache_gb 4
