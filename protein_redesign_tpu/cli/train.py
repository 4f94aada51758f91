"""Training CLI (reference `train.py` / `train_from_ckpt.py`).

Flag names port 1:1 from the reference; the Lightning trainer is replaced
by an explicit loop around one jitted, mesh-sharded train step:

    python -m protein_redesign_tpu.cli.train \\
        --save_dir runs/exp --training_mode \\
        --num_blocks 4 --num_steps 2000 --mask_prob 0.15 \\
        --batch_size 2 --accumulate_grad_batches 10

Resume (the reference's `train_from_ckpt.py`):
    ... --trained_ckpt runs/exp/checkpoints
"""

from __future__ import annotations

import shutil
from argparse import ArgumentParser
from pathlib import Path

import jax
import numpy as np

from ..utils.platform import apply_platform_override

apply_platform_override()


def _maybe_init_distributed():
    """Multi-host init. MUST run before any backend-touching jax call:
    ``jax.process_count()`` itself initializes XLA, after which
    ``jax.distributed.initialize()`` raises — and on clusters where
    peers are only discoverable THROUGH initialize(), process_count()
    would still read 1 and a conditional gate would silently train each
    host independently. Opt in via the standard cluster signals, or —
    for manual/bare-metal clusters jax cannot auto-detect (no Slurm /
    OMPI / TPU metadata; also the 2-process CPU-gloo path
    tests/test_multihost.py executes for real) — via explicit
    ``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` +
    ``JAX_PROCESS_ID``."""
    import os

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coord and nproc and pid:
        try:
            nproc_i, pid_i = int(nproc), int(pid)
        except ValueError:
            raise SystemExit(
                f"JAX_NUM_PROCESSES/JAX_PROCESS_ID must be integers "
                f"(got {nproc!r}, {pid!r})"
            )
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=nproc_i,
            process_id=pid_i,
        )
        return
    slurm = int(os.environ.get("SLURM_JOB_NUM_NODES", "1") or 1)
    ompi = int(os.environ.get("OMPI_COMM_WORLD_SIZE", "1") or 1)
    tpu_hosts = [
        h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        if h.strip()
    ]
    if coord or slurm > 1 or ompi > 1 or len(tpu_hosts) > 1:
        jax.distributed.initialize()  # pragma: no cover - real cluster


def main(argv=None):
    _maybe_init_distributed()
    parser = ArgumentParser()
    from ..config import (
        add_data_args,
        add_model_args,
        add_train_args,
        data_config_from_args,
        model_config_from_args,
        train_config_from_args,
    )

    add_model_args(parser)
    add_data_args(parser)
    add_train_args(parser)
    parser.add_argument("--trained_ckpt", type=str, default=None,
                        help="checkpoint dir to resume from")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--fresh", action="store_true",
                        help="delete save_dir first (reference train.py:28-30)")
    args = parser.parse_args(argv)

    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = model_config_from_args(args).replace(training_mode=True)
    data_cfg = data_config_from_args(args)
    train_cfg = train_config_from_args(args)

    from ..data.dataset import PDBDataset, load_split_ids
    from ..data.pipeline import batches, prefetch
    from ..models.prdiff import ProteinReDiffModel
    from ..parallel.mesh import (
        DATA_AXIS,
        host_scalar,
        make_mesh,
        param_sharding,
        replicated,
    )
    from ..parallel.train_step import (
        make_eval_step,
        make_train_state,
        make_train_step,
    )
    from ..utils.checkpoint import load_checkpoint, make_manager, save_checkpoint
    from ..utils.logging import MetricsLogger, maybe_profile

    save_dir = Path(train_cfg.save_dir)
    if args.fresh and save_dir.exists():
        if args.trained_ckpt is not None:
            ckpt = Path(args.trained_ckpt).resolve()
            if ckpt == save_dir.resolve() or ckpt.is_relative_to(
                save_dir.resolve()
            ):
                raise SystemExit(
                    f"--fresh would delete --trained_ckpt "
                    f"({args.trained_ckpt} is under {save_dir}); move the "
                    f"checkpoint out or drop --fresh"
                )
        # Multi-host: hosts share the save dir on clustered filesystems.
        # Only rank 0 deletes (concurrent rmtrees race each other and a
        # slow host's rmtree would destroy rank 0's freshly recreated
        # checkpoints/metrics); everyone barriers before recreating.
        if jax.process_index() == 0:
            shutil.rmtree(save_dir)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("prd_fresh_save_dir")
    save_dir.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(save_dir, enabled=jax.process_index() == 0)

    devices = jax.devices()
    n_procs = jax.process_count()
    if train_cfg.num_devices > 0:
        if n_procs > 1:
            # Per-process slice: a flat devices[:n] cut takes process
            # 0's devices first (jax.devices() orders by process) and
            # leaves later processes meshes made entirely of devices
            # they cannot address (measured: their jit outputs are
            # unreadable and training wedges at the first host fetch).
            if train_cfg.num_devices % n_procs:
                raise SystemExit(
                    f"--num_devices {train_cfg.num_devices} must be a "
                    f"multiple of the process count {n_procs}"
                )
            per = train_cfg.num_devices // n_procs
            devices = [
                d for p in range(n_procs)
                for d in [x for x in devices if x.process_index == p][:per]
            ]
        else:
            devices = devices[: train_cfg.num_devices]
    if train_cfg.mesh_shape is None:
        # Data axis must divide the per-step GLOBAL batch — each host
        # contributes batch_size rows, so that's batch_size * n_procs
        # (the reference's DDP has the same constraint, one sample slice
        # per rank): take the LARGEST divisor that fits the device count
        # (gcd would drop devices — batch_size=5 on 8 devices can use
        # 5). On multi-host the shrink must stay SYMMETRIC: every
        # process keeps an equal number of its own devices.
        n_local = min(
            sum(1 for d in devices if d.process_index == p)
            for p in range(n_procs)
        )
        global_batch = data_cfg.batch_size * n_procs
        per = max(
            k for k in range(1, n_local + 1)
            if global_batch % (k * n_procs) == 0
        )
        d_axis = per * n_procs
        if d_axis < len(devices):
            print(
                f"warning: data-parallel over {d_axis}/{len(devices)} "
                f"devices (the data axis must divide the global batch "
                f"{global_batch}; pass --mesh_shape or adjust "
                f"--batch_size to use every chip)"
            )
        devices = [
            d for p in range(n_procs)
            for d in [x for x in devices if x.process_index == p][:per]
        ]
        mesh = make_mesh(devices, (d_axis, 1))
    else:
        mesh = make_mesh(devices, train_cfg.mesh_shape)
    print(f"mesh: {dict(mesh.shape)} on {devices[0].platform}")

    # Multi-device meshes keep the kernel paths too: the attention
    # kernels (fwd + flash bwd) are custom_partitioning-wrapped with a
    # rows-axis sharding rule (ops/pallas_attention.py "GSPMD" section),
    # so the 'data'-sharded batch runs each device's row shard through
    # its own kernel call — verified sharded-vs-unsharded exact on the
    # 8-device mesh (tests/test_pallas.py::TestShardedKernels).
    model = ProteinReDiffModel(cfg)
    cache_dir = data_cfg.resolved_cache_dir()
    train_ids = load_split_ids(data_cfg.data_dir, "train")
    val_ids = load_split_ids(data_cfg.data_dir, "val")
    train_ds = PDBDataset(cache_dir, train_ids)
    val_ds = PDBDataset(cache_dir, val_ids)
    print(f"train: {len(train_ds)} complexes, val: {len(val_ds)}")

    key = jax.random.PRNGKey(train_cfg.seed)
    accum = train_cfg.accumulate_grad_batches

    # Multi-host: every host must compile the SAME program per global
    # step, so pin all training batches to one static bucket (each host
    # collates its own epoch stride; per-group bucket choice would
    # diverge across hosts -> collective mismatch). The bucket is the
    # smallest rung covering the split's largest complex — max(buckets)
    # would pad EVERY batch to the 2048 rung. The scan reads only the
    # two size scalars from each cache record and is identical on every
    # host (shared split, deterministic order).
    n_hosts = jax.process_count()
    fixed_bucket = None
    if n_hosts > 1:  # pragma: no cover - needs real multi-host
        largest = 0
        for pdb_id in train_ids:
            with np.load(
                Path(cache_dir) / pdb_id / "complex.npz"
            ) as z:
                largest = max(
                    largest, int(z["num_atoms"]) + int(z["num_residues"])
                )
        fitting = [b for b in data_cfg.buckets if b >= largest]
        if not fitting:
            raise SystemExit(
                f"largest training complex has {largest} nodes, above "
                f"the top bucket {max(data_cfg.buckets)}"
            )
        fixed_bucket = min(fitting)
        print(f"multi-host fixed bucket: {fixed_bucket} "
              f"(largest complex {largest} nodes)")

    # Bootstrap state from the first batch's shapes.
    first = next(batches(
        train_ds, data_cfg.batch_size, data_cfg.buckets, shuffle=True,
        seed=train_cfg.seed, accum=accum, fixed_bucket=fixed_bucket,
    ))
    sample = {k: v[0] if accum > 1 else v for k, v in first.items()}
    if args.trained_ckpt:
        def target_factory(ckpt_cfg):
            # eval_shape: the restore only needs the pytree STRUCTURE
            # (shapes/dtypes); materializing a real TrainState would run
            # the full model init on device (a 150-300 s remote compile
            # on tunneled TPU) and allocate 3x param memory, all thrown
            # away immediately.
            return jax.eval_shape(lambda: make_train_state(
                ProteinReDiffModel(ckpt_cfg.replace(training_mode=True)),
                train_cfg, key, sample,
            ))

        state, cfg_loaded = load_checkpoint(
            args.trained_ckpt, target_factory=target_factory
        )
        cfg = cfg_loaded.replace(training_mode=True)
        model = ProteinReDiffModel(cfg)
        print(f"resumed from {args.trained_ckpt} at step "
              f"{int(host_scalar(state.step))}")
    else:
        state = make_train_state(model, train_cfg, key, sample)

    state_shardings = jax.tree_util.tree_map(
        lambda _: replicated(mesh), state
    ).replace(
        params=param_sharding(mesh, state.params),
        ema_params=param_sharding(mesh, state.ema_params),
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    def batch_shardings(batch):
        spec = P(None, "data") if accum > 1 else P("data")
        return {k: NamedSharding(mesh, spec) for k in batch}

    state = jax.device_put(state, state_shardings)
    bsh = batch_shardings(first)
    train_step = jax.jit(
        make_train_step(model, train_cfg),
        in_shardings=(state_shardings, bsh, replicated(mesh)),
        out_shardings=(state_shardings, replicated(mesh)),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(
        make_eval_step(model, per_sample=True),
        in_shardings=(state_shardings,
                      {k: NamedSharding(mesh, P("data")) for k in sample},
                      replicated(mesh)),
        # Replicate the per-sample losses: multi-host validation reads
        # them on EVERY host (np.asarray of a data-sharded global array
        # would raise; the all-gather is a few floats).
        out_shardings=replicated(mesh),
    )

    manager = make_manager(save_dir / "checkpoints", train_cfg.checkpoint_top_k)

    from ..data.wire import compress_batch

    if train_cfg.wire_compression:
        # ESM crosses in bf16 only when the model computes in bf16 anyway;
        # strict-f32 runs keep a lossless wire.
        esm_bf16 = jax.numpy.dtype(cfg.dtype) == jax.numpy.bfloat16
        wire = lambda b: compress_batch(b, esm_bf16=esm_bf16)  # noqa: E731
    else:
        wire = lambda b: b  # noqa: E731

    # Device-resident validation batches: transferred once, reused across
    # repeats and validations (the eval key, not the batch, provides the
    # (t, mask) variation). Validation is deliberately UNSHARDED across
    # hosts (every host computes the same val_loss for identical
    # checkpoint decisions), so on a multi-host mesh the data axis can
    # exceed the val batch — pad with repeated rows to the next multiple
    # (val_real_counts below already slices the padding back off).
    val_sharding = NamedSharding(mesh, P("data"))
    d_axis = mesh.shape[DATA_AXIS]

    def _pad_rows(b):
        n = next(iter(b.values())).shape[0]
        m = (-n) % d_axis
        if not m:
            return b
        return {
            k: np.concatenate([v, np.repeat(v[-1:], m, axis=0)], axis=0)
            for k, v in b.items()
        }

    val_batches = [
        {k: jax.device_put(v, val_sharding)
         for k, v in _pad_rows(wire(vb)).items()}
        for vb in batches(val_ds, data_cfg.batch_size, data_cfg.buckets)
    ]
    # Groups are consecutive, so only the FINAL batch can be padded with
    # repeated samples (kept for static shapes); count the real rows so
    # repeats don't double-count in val_loss (best-checkpoint selection
    # reads this number).
    val_real_counts = [data_cfg.batch_size] * len(val_batches)
    if val_batches and len(val_ds) % data_cfg.batch_size:
        val_real_counts[-1] = len(val_ds) % data_cfg.batch_size

    def run_validation(step_key):
        losses = []
        for rep in range(max(1, train_cfg.val_repeats)):
            for i, vb in enumerate(val_batches):
                per = np.asarray(eval_step(
                    state, vb,
                    jax.random.fold_in(step_key, rep * 100_003 + i),
                ))
                losses.extend(per[: val_real_counts[i]].tolist())
        return float(np.mean(losses)) if losses else float("inf")

    step = int(host_scalar(state.step))
    epoch = 0
    stop = False
    # Graceful shutdown: clusters kill long runs (the reference resumes by
    # hand, README.md:161-162); we checkpoint on SIGTERM/SIGINT instead.
    import signal

    interrupted = {"flag": False}

    def _on_signal(signum, frame):
        interrupted["flag"] = True
        # restore the default handler so a SECOND signal terminates
        # immediately instead of being swallowed during the final save
        signal.signal(signum, signal.SIG_DFL)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not on the main thread
    if n_hosts > 1:  # pragma: no cover - needs real multi-host
        # Each host holds only its addressable shard; assemble a
        # global array (device_put would treat the local batch as
        # the whole global array and drop the other hosts' data).
        to_device = lambda b: {  # noqa: E731
            k: jax.make_array_from_process_local_data(bsh[k], v)
            for k, v in wire(b).items()
        }
    else:
        to_device = lambda b: {  # noqa: E731
            k: jax.device_put(v, bsh[k]) for k, v in wire(b).items()
        }

    # --cache_device_batches: transfer the epoch-0 batches once and keep
    # them device-resident; later epochs permute batch ORDER only (not
    # composition). Removes all steady-state host->device traffic — the
    # latency win for small datasets, and on tunneled platforms (axon) the
    # only way to fully avoid the client's per-transfer host-memory leak.
    cached_batches = None
    host_batches: list = []
    if train_cfg.cache_device_batches:
        epoch0 = list(batches(
            train_ds, data_cfg.batch_size, data_cfg.buckets,
            shuffle=True, seed=train_cfg.seed, epoch=0, accum=accum,
            num_shards=n_hosts, shard_index=jax.process_index(),
            fixed_bucket=fixed_bucket,
        ))
        # --device_cache_gb bounds the device-resident prefix (host-side
        # batch bytes as the proxy for HBM use); the overflow stays as
        # host-resident collated batches streamed per epoch, so epoch
        # COMPOSITION is identical to the unbounded cache and only the
        # transfer pattern differs.
        budget = (
            train_cfg.device_cache_gb * 1e9
            if train_cfg.device_cache_gb > 0 else float("inf")
        )
        used = 0.0
        split = len(epoch0)
        for k, b in enumerate(epoch0):
            nb = float(sum(np.asarray(v).nbytes for v in b.values()))
            if used + nb > budget:
                split = k
                break
            used += nb
        cached_batches = [to_device(b) for b in epoch0[:split]]
        host_batches = epoch0[split:]
        msg = f"device batch cache: {len(cached_batches)} batches resident"
        if host_batches:
            msg += (f", {len(host_batches)} host-resident streamed/epoch "
                    f"(--device_cache_gb {train_cfg.device_cache_gb})")
        print(msg)

    with maybe_profile(save_dir, args.profile):
        while not stop:
            if cached_batches is not None:
                order = np.random.RandomState(
                    train_cfg.seed + 7919 * (epoch + 1)
                ).permutation(len(cached_batches) + len(host_batches))
                n_dev = len(cached_batches)
                it = (
                    cached_batches[i] if i < n_dev
                    else to_device(host_batches[i - n_dev])
                    for i in order
                )
            else:
                # Per-host epoch sharding (DistributedSampler semantics):
                # each process reads only its stride of the shared
                # permutation. Validation deliberately stays unsharded so
                # every host reaches the same val_loss and checkpoint
                # decisions.
                it = batches(
                    train_ds, data_cfg.batch_size, data_cfg.buckets,
                    shuffle=True, seed=train_cfg.seed, epoch=epoch,
                    accum=accum,
                    num_shards=n_hosts,
                    shard_index=jax.process_index(),
                    fixed_bucket=fixed_bucket,
                )
                it = prefetch(it, size=2, transform=to_device)
            for batch in it:
                step_key = jax.random.fold_in(key, step)
                state, metrics = train_step(state, batch, step_key)
                step += 1
                if (
                    train_cfg.log_every_steps > 0
                    and step % train_cfg.log_every_steps == 0
                ):
                    logger.log(step, {
                        "train_loss": metrics["loss"],
                        "grad_norm": metrics["grad_norm"],
                        "epoch": epoch,
                    })
                    print(f"step {step}: "
                          f"loss={host_scalar(metrics['loss']):.4f}")
                if (
                    train_cfg.val_every_steps > 0
                    and step % train_cfg.val_every_steps == 0
                ):
                    val_loss = run_validation(jax.random.fold_in(key, step + 1_000_000_007))
                    logger.log(step, {"val_loss": val_loss})
                    print(f"step {step}: val_loss={val_loss:.4f}")
                    save_checkpoint(manager, state, cfg, val_loss)
                if interrupted["flag"]:
                    print("signal received; checkpointing and exiting")
                    stop = True
                    break
                if 0 < train_cfg.max_steps <= step:
                    stop = True
                    break
            epoch += 1
            if 0 < train_cfg.max_epochs <= epoch:
                stop = True
    if interrupted["flag"]:
        # Save FIRST, no validation: the cluster's kill-grace window
        # (SIGTERM -> SIGKILL) may not survive a full val pass — losing
        # exactly the checkpoint this handler exists to protect.
        save_checkpoint(manager, state, cfg)
        manager.wait_until_finished()
        print(f"interrupted at step {step}; checkpoint saved "
              f"(final validation skipped)")
        return
    if manager.latest_step() == step:
        # Stopped on a validation boundary: the loop already validated
        # and saved this step (orbax would silently drop a second save
        # at the same step, wasting the extra val pass).
        manager.wait_until_finished()
        print(f"done at step {step} (checkpoint saved at this step)")
        return
    val_loss = run_validation(jax.random.fold_in(key, step + 2_000_000_011))
    save_checkpoint(manager, state, cfg, val_loss)
    manager.wait_until_finished()
    print(f"done at step {step}; final val_loss={val_loss:.4f}")


if __name__ == "__main__":
    main()
