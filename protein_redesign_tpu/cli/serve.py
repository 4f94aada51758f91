"""Batch-serving CLI: JSONL requests in, JSONL results out.

Production-deployment surface beyond the reference's one-shot scripts: a
long-lived process that keeps the model compiled (one jit cache entry per
bucket) and streams redesign requests through the scan-based sampler.

Request (one JSON object per line on stdin or --input file):
    {"id": "req1", "protein": "<sequence-with-X-or-.pdb-path>",
     "ligand": "<SMILES-or-.sdf/.mol2-path-or-*>",
     "num_samples": 4, "mask_prob": 0.3}

Response (one JSON per request on stdout or --output file):
    {"id": "req1", "sequences": [...], "tmscores": [...],
     "pdb_files": [...], "sdf_files": [...]}

Structures are written under --output_dir/<id>/.

    python -m protein_redesign_tpu.cli.serve -c ckpt -o out/ \\
        [--num_steps 1000] [--input reqs.jsonl] [--output results.jsonl]

TCP mode (same JSONL protocol over a socket; concurrent clients, device
work serialized behind one compiled runner):

    python -m protein_redesign_tpu.cli.serve -c ckpt -o out/ --port 8500
"""

from __future__ import annotations

import dataclasses
import json
import sys
from argparse import ArgumentParser
from operator import itemgetter
from pathlib import Path


import re
import threading

_claim_lock = threading.Lock()
_claimed_counts = {}


def _safe_dir_name(req_id: str) -> str:
    """Request ids come from the network: reduce to a single safe path
    component so an id like "../../../home/user" or "/tmp/evil" cannot
    direct writes outside --output_dir (pathlib treats an absolute
    right-hand side as a full replacement)."""
    name = re.sub(r"[^A-Za-z0-9._-]+", "_", str(req_id))[:100]
    name = name.strip("._")
    return name or "request"


def _claim_request_dir(output_dir, req_id):
    """Thread-safe unique output directory per request. Distinct ids keep
    the plain <output_dir>/<sanitized-id> path (the stdin-mode
    contract); a REUSED id — e.g. two concurrent TCP clients both
    omitting "id" (default "request") — gets <id>_2, <id>_3, ... so
    their files never collide (post-processing deliberately runs
    outside the device lock). Directories left by a PREVIOUS server
    process over the same --output_dir are uniquified the same way
    (the in-memory counter starts fresh; never silently overwrite)."""
    base = _safe_dir_name(req_id)
    with _claim_lock:
        n = _claimed_counts.get(base, 0)
        while True:
            n += 1
            name = base if n == 1 else f"{base}_{n}"
            req_dir = Path(output_dir) / name
            if not req_dir.exists():
                break
        _claimed_counts[base] = n
        req_dir.mkdir(parents=True, exist_ok=True)
    return req_dir


def handle_request(req, runner, embedder, output_dir, default_mask_prob,
                   device_lock=None, max_nodes=None, max_samples=None):
    """One request through the PRE-COMPILED runner. The runner is built
    once at startup and reused — mask_prob is a traced argument of its
    jitted sampler, so varying it per request does not retrace (with
    150-300 s remote TPU compiles, a per-request retrace would make the
    server unusable).

    ``device_lock`` (TCP mode) guards only the device phase — ESM
    embedding + sampling; the host-side featurization and
    post-processing (TMalign subprocesses, PDB/SDF writes) run outside
    it so concurrent clients overlap their host work with each other's
    device work."""
    import contextlib

    import jax

    from ..chem.mol import get_mol_positions, mol_to_sdf, update_mol_positions
    from ..chem.protein import protein_to_pdb_file, protein_to_sequence
    from ..data.featurize import ligand_to_data, protein_to_data
    from ..utils.tmalign import run_tmalign
    from .common import (
        load_protein_arg,
        parse_ligand_arg,
        update_pos,
        update_seq,
    )

    req_id = str(req.get("id", "request"))
    num_samples = int(req.get("num_samples", 1))
    mask_prob = float(req.get("mask_prob", default_mask_prob))
    seed = int(req.get("seed", 0))
    # Optional "trajectory": K — K intermediate denoising frames per
    # sample, written as a K-model PDB movie. Samples stay bit-identical
    # (frames are host fetches between dispatches), but the FIRST such
    # request per (bucket, K) compiles the segmented init/segment/finish
    # programs if plain sampling at that bucket ran one-shot — a one-time
    # 150-300 s stall on remote-compile TPU setups. Warm a movie request
    # through the server before opening it to clients if that matters.
    trajectory = int(req.get("trajectory", 0))

    if num_samples < 1:
        raise ValueError(
            f"num_samples must be >= 1, got {num_samples}"
        )
    # Volume guard next to the validity check: the node-count guard
    # below bounds a request's SIZE but said nothing about VOLUME — one
    # client asking for a huge num_samples would hold the device lock
    # for every sampling group (and [data] * num_samples the host RAM)
    # while all other connections starve.
    if max_samples is not None and num_samples > max_samples:
        raise ValueError(
            f"num_samples {num_samples} is over the server ceiling of "
            f"{max_samples}; raise --max_samples (or pass "
            f"--max_samples 0 for no limit)"
        )

    protein = load_protein_arg(req["protein"])
    ligand = parse_ligand_arg(req["ligand"])
    # Size guard BEFORE any device (or ESM) work: a request above the
    # ceiling would otherwise trigger a fresh-bucket compile (150-300 s
    # on remote-compile TPU setups) UNDER the device lock, stalling
    # every other client. Checked here, it costs two host-side counts
    # and returns an error line instead (extends the reference's
    # generate.py:125-128 size warning into a real guard).
    n_nodes = ligand.num_atoms() + len(protein.aatype)
    if max_nodes is not None and n_nodes > max_nodes:
        raise ValueError(
            f"request has {n_nodes} nodes (ligand atoms + residues), over "
            f"the server ceiling of {max_nodes}; raise --max_nodes (or "
            f"pass --max_nodes 0 for no limit) and warm the matching "
            f"bucket at startup"
        )
    lock = device_lock or contextlib.nullcontext()
    # The device lock exists to serialize DEVICE work; the default torch
    # ESM backend runs on the host CPU, and holding the lock for its
    # forward would stall another client's sampling dispatch for no
    # reason. Only the jax backend shares the device.
    esm_lock = (
        lock if getattr(embedder, "backend", "torch") == "jax"
        else contextlib.nullcontext()
    )
    with esm_lock:
        residue_esm = embedder.embed_protein(protein)
    # Featurization is pure host numpy — assembled OUTSIDE the lock so a
    # concurrent client's sampling overlaps with this one's host work.
    data = {
        **ligand_to_data(ligand),
        **protein_to_data(protein, residue_esm=residue_esm),
    }
    with lock:
        results = runner.run(
            [data] * num_samples, jax.random.PRNGKey(seed),
            mask_prob=mask_prob, trajectory=trajectory,
        )

    req_dir = _claim_request_dir(output_dir, req_id)
    sequences, tmscores, pdb_files, sdf_files = [], [], [], []
    trajectory_files = []
    ref_protein = None
    for i, result in enumerate(results):
        pos, seq_prob = result[0], result[1]
        sp, sl = update_pos(protein, ligand, pos)
        sp = update_seq(sp, seq_prob)
        if trajectory:
            from ..chem.protein import proteins_to_pdb_file

            frame_proteins = []
            for frame in result[2]:
                fp, _ = update_pos(protein, ligand, frame)
                frame_proteins.append(update_seq(fp, seq_prob))
            traj_path = req_dir / f"sample_trajectory_{i}.pdb"
            proteins_to_pdb_file(frame_proteins, traj_path)
            trajectory_files.append(str(traj_path))
        if ref_protein is None:
            ref_protein = sp
        tmscore, t, R = max(
            run_tmalign(sp, ref_protein),
            run_tmalign(sp, ref_protein, mirror=True),
            key=itemgetter(0),
        )
        sp = dataclasses.replace(sp, atom_pos=t + sp.atom_pos @ R)
        sl = update_mol_positions(sl, t + get_mol_positions(sl) @ R)
        pdb_path = req_dir / f"sample_{i}.pdb"
        sdf_path = req_dir / f"sample_{i}.sdf"
        protein_to_pdb_file(sp, pdb_path)
        with open(sdf_path, "w") as f:
            f.write(mol_to_sdf(sl))
        sequences.append(protein_to_sequence(sp))
        tmscores.append(float(tmscore))
        pdb_files.append(str(pdb_path))
        sdf_files.append(str(sdf_path))
    out = {
        "id": req_id,
        "sequences": sequences,
        "tmscores": tmscores,
        "pdb_files": pdb_files,
        "sdf_files": sdf_files,
    }
    if trajectory:
        out["trajectory_files"] = trajectory_files
    return out


def warmup_runner(runner, buckets, esm_dim) -> None:
    """Precompile the sampler for each listed bucket by pushing one
    synthetic complex through the runner. First-request latency then
    excludes compilation (150-300 s per bucket on remote-compile TPU
    setups); subsequent requests at those buckets are pure compute.
    The serve runner pads every group to its full batch_size
    (pad_to_batch), so the one shape warmed here is the ONLY shape the
    bucket ever runs."""
    import jax
    import numpy as np

    from ..chem.mol import mol_from_smiles, update_mol_positions
    from ..chem.protein import protein_from_sequence
    from ..data.featurize import ligand_to_data, protein_to_data

    bad = [b for b in buckets if b not in runner.buckets]
    if bad:
        raise SystemExit(
            f"--warmup_buckets {bad} are not ladder rungs; pick from "
            f"{list(runner.buckets)} (requests are padded UP to the "
            f"nearest rung, so warming an off-rung size would compile a "
            f"shape no request uses)"
        )
    mol = update_mol_positions(mol_from_smiles("CC"), np.zeros((2, 3)))
    for bucket in buckets:
        prot = protein_from_sequence("A" * (bucket - 2))
        data = {
            **ligand_to_data(mol),
            **protein_to_data(prot, esm_dim=esm_dim),
        }
        print(f"[serve] warming bucket {bucket}...", file=sys.stderr,
              flush=True)
        runner.run([data], jax.random.PRNGKey(0))
    if buckets:
        print("[serve] warmup done", file=sys.stderr, flush=True)


def handle_line(line, runner, embedder, output_dir, default_mask_prob,
                device_lock=None, max_nodes=None, max_samples=None):
    """One JSONL request line -> one result dict; never raises (bad
    requests become {"id", "error"} results so the server keeps going)."""
    req = None
    try:
        req = json.loads(line)
        return handle_request(
            req, runner, embedder, output_dir, default_mask_prob,
            device_lock=device_lock, max_nodes=max_nodes,
            max_samples=max_samples,
        )
    except Exception as e:
        req_id = req.get("id", "?") if isinstance(req, dict) else "?"
        return {"id": str(req_id), "error": f"{type(e).__name__}: {e}"}


def serve_tcp(port, runner, embedder, output_dir, default_mask_prob,
              host="127.0.0.1", max_requests=None, ready_cb=None,
              max_nodes=None, max_samples=None):
    """JSONL-over-TCP server: each client connection streams request
    lines and receives one JSON result line per request. Concurrent
    connections are accepted (threaded); device work (ESM embed +
    sampling) serializes behind a lock while host post-processing
    (TMalign, file writes) overlaps — the single sampler program is the
    throughput unit, and at these O(N^3)-dense shapes per-request
    batching is already optimal (BASELINE.md batch study), so
    fairness-by-request beats batching across clients.
    ``max_requests``/``ready_cb`` exist for tests."""
    import socketserver

    device_lock = threading.Lock()
    served = 0
    served_lock = threading.Lock()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            nonlocal served
            for raw in self.rfile:
                line = raw.decode("utf-8", "replace").strip()
                if not line:
                    continue
                result = handle_line(
                    line, runner, embedder, output_dir,
                    default_mask_prob, device_lock=device_lock,
                    max_nodes=max_nodes, max_samples=max_samples,
                )
                self.wfile.write((json.dumps(result) + "\n").encode())
                self.wfile.flush()
                with served_lock:
                    served += 1
                    if max_requests is not None and served >= max_requests:
                        threading.Thread(
                            target=server.shutdown, daemon=True
                        ).start()
                        return

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server((host, port), Handler) as server:
        bound = server.server_address[1]
        print(f"[serve] listening on {host}:{bound}", file=sys.stderr,
              flush=True)
        if ready_cb is not None:
            ready_cb(bound)
        server.serve_forever(poll_interval=0.05)


def main(argv=None):
    from .common import add_esm_args, add_sampler_args

    parser = ArgumentParser()
    parser.add_argument("-c", "--ckpt_path", type=Path, required=True)
    parser.add_argument("-o", "--output_dir", type=Path, required=True)
    parser.add_argument("--num_steps", type=int, default=64)
    parser.add_argument("--mask_prob", type=float, default=0.3)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_devices", type=int, default=1,
                        help="data-parallel sampling over this many chips")
    add_sampler_args(parser)
    parser.add_argument("--fast_softmax", action="store_true")
    add_esm_args(parser)
    parser.add_argument("--input", type=str, default=None,
                        help="JSONL request file (default: stdin)")
    parser.add_argument("--output", type=str, default=None,
                        help="JSONL result file (default: stdout)")
    parser.add_argument("--warmup_buckets", type=str, default="",
                        help="comma-separated bucket sizes to precompile "
                             "at startup (e.g. 192,256) so first requests "
                             "skip the 150-300 s remote compile")
    parser.add_argument("--max_nodes", type=int, default=None,
                        help="reject requests above this node count "
                             "(ligand atoms + residues) instead of "
                             "compiling a new bucket under the device "
                             "lock. Default: the largest --warmup_buckets "
                             "rung when warming, else unlimited; 0 = "
                             "explicitly unlimited")
    parser.add_argument("--max_samples", type=int, default=1024,
                        help="reject requests whose num_samples exceeds "
                             "this ceiling (one request holds the device "
                             "lock for all its sampling groups — volume "
                             "bound next to --max_nodes' size bound); "
                             "0 = unlimited")
    parser.add_argument("--port", type=int, default=None,
                        help="serve JSONL over TCP on this port instead "
                             "of stdin/stdout (concurrent clients; device "
                             "work serialized)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    args = parser.parse_args(argv)

    from ..models.prdiff import ProteinReDiffModel
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from ..utils.esm import ESMEmbedder
    from .common import (
        SamplingRunner,
        apply_serving_defaults,
        make_inference_mesh,
        runner_sampler_kwargs,
        sampler_cfg_overrides,
    )
    from .generate import _load_params

    params, cfg = _load_params(args.ckpt_path, num_steps=args.num_steps)
    model = ProteinReDiffModel(apply_serving_defaults(cfg.replace(
        training_mode=False, fast_softmax=args.fast_softmax,
        **sampler_cfg_overrides(args),
    ), args))
    embedder = ESMEmbedder(model_name=args.esm_model,
                           esm_dim=cfg.esm_dim,
                           require=args.require_esm,
                           backend=args.esm_backend)
    # Resolve the ESM backend ONCE at startup (weight load — or, offline,
    # the zeros fallback after the import/load attempt): measured ~39 s
    # on the first live request otherwise (BASELINE.md serving table).
    from ..chem.protein import protein_from_sequence

    print("[serve] resolving ESM backend...", file=sys.stderr, flush=True)
    embedder.embed_protein(protein_from_sequence("A"))
    args.output_dir.mkdir(parents=True, exist_ok=True)

    # ONE runner for the whole process: jit caches one program per padding
    # bucket, shared across requests (mask_prob/seed vary without retrace).
    warm = [int(b) for b in args.warmup_buckets.split(",") if b.strip()]
    runner = SamplingRunner(
        model, params, batch_size=args.batch_size,
        mask_prob=args.mask_prob,
        mesh=make_inference_mesh(args.num_devices),
        # One compiled program per bucket, ever: remainder groups are
        # padded to batch_size rather than compiling a second shape.
        pad_to_batch=True,
        # When the operator warmed specific buckets, restrict the ladder
        # to THOSE rungs: otherwise a request smaller than the lowest
        # warmed rung picks an unwarmed lower bucket from the full
        # DataConfig ladder and compiles it under the device lock — the
        # exact 150-300 s all-client stall warming exists to prevent.
        # Small requests pad up to the smallest warmed rung instead.
        buckets=sorted(warm) if warm else None,
        **runner_sampler_kwargs(args),
    )
    if warm:
        warmup_runner(runner, warm, cfg.esm_dim)
    # Work-bound policy: when the operator warmed specific buckets, the
    # server defaults to serving ONLY sizes those buckets cover — an
    # oversized request is refused up front rather than compiling a new
    # program under the device lock. --max_nodes overrides; 0 disables.
    max_nodes = args.max_nodes
    if max_nodes is None and warm:
        max_nodes = max(warm)
        print(f"[serve] max_nodes defaulting to largest warmed bucket "
              f"({max_nodes}); override with --max_nodes", file=sys.stderr,
              flush=True)
    if max_nodes is not None and max_nodes <= 0:
        max_nodes = None
    max_samples = args.max_samples if args.max_samples > 0 else None

    if args.port is not None:
        serve_tcp(
            args.port, runner, embedder, args.output_dir, args.mask_prob,
            host=args.host, max_nodes=max_nodes, max_samples=max_samples,
        )
        return

    in_f = open(args.input) if args.input else sys.stdin
    out_f = open(args.output, "w") if args.output else sys.stdout
    try:
        for line in in_f:
            line = line.strip()
            if not line:
                continue
            result = handle_line(
                line, runner, embedder, args.output_dir, args.mask_prob,
                max_nodes=max_nodes, max_samples=max_samples,
            )
            out_f.write(json.dumps(result) + "\n")
            out_f.flush()
    finally:
        if args.input:
            in_f.close()
        if args.output:
            out_f.close()


if __name__ == "__main__":
    main()
