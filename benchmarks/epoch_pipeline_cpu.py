"""Host-side epoch-iteration proof at PDBbind scale (25,631 train
complexes) — the DATA half of VERDICT r3 item 4's epoch legs, runnable
without the TPU: iterate ONE full training epoch through the real
pipeline (PDBDataset cache reads -> shuffle -> bucketed collate ->
numeric batches, `data/pipeline.batches` — exactly what `cli/train.py`
consumes per step), recording throughput, peak host RSS, and the
bucket/padding distribution the reference's dynamic padding would have
produced per batch (`ProteinReDiff/data.py:81`, `data.py:221-230`).

    python benchmarks/epoch_pipeline_cpu.py [--batch_size 8]
        [--buckets 128,192,256] [--data_dir /tmp/prd_pdbbind25k/data]

Writes one summary line per run; BASELINE.md records the results.
"""
import argparse
import resource
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from protein_redesign_tpu.data.dataset import PDBDataset, load_split_ids
from protein_redesign_tpu.data.pipeline import batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/prd_pdbbind25k/data")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--buckets", default="128,192,256")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    buckets = tuple(int(b) for b in args.buckets.split(","))
    ids = load_split_ids(args.data_dir, "train")
    ds = PDBDataset(f"{args.data_dir}/cache", ids)
    print(f"epoch over {len(ids)} complexes, B={args.batch_size}, "
          f"buckets {buckets}", flush=True)

    t0 = time.time()
    n_batches = 0
    n_samples = 0
    bucket_hist = Counter()
    pad_waste = 0.0   # padded slots vs real nodes, reference-style
    real_nodes = 0.0
    for batch in batches(ds, args.batch_size, buckets,
                         shuffle=True, seed=args.seed, epoch=0):
        n_batches += 1
        B, N = batch["residue_mask"].shape
        n_samples += B
        bucket_hist[N] += 1
        live = float(
            (batch["residue_mask"] + batch["atom_mask"]).sum()
        )
        real_nodes += live
        pad_waste += B * N - live
        if n_batches % 400 == 0:
            dt = time.time() - t0
            print(f"  {n_batches} batches ({n_samples/dt:.0f} "
                  f"complexes/s)", flush=True)
    dt = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    hist = {k: bucket_hist[k] for k in sorted(bucket_hist)}
    print(f"EPOCH_DONE: {n_batches} batches / {n_samples} samples in "
          f"{dt:.0f} s ({n_samples/dt:.0f} complexes/s; "
          f"{n_batches/dt:.1f} batches/s) | peak RSS {rss_gb:.2f} GB | "
          f"bucket batches {hist} | pad overhead "
          f"{pad_waste/max(real_nodes,1):.2f}x", flush=True)


if __name__ == "__main__":
    main()
