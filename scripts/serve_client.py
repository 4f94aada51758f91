"""Reference client for the JSONL-over-TCP serving mode (`cli/serve.py
--port`). No counterpart in the reference (its inference is batch
scripts only); this is the minimal integration example for driving the
long-lived server.

    # server (once):
    python -m protein_redesign_tpu.cli.serve -c <ckpt> -o out/ --port 7777

    # one-shot request:
    python scripts/serve_client.py --port 7777 \
        --protein ACDEFGHIKL --ligand "CCO" -n 4 --mask_prob 0.4

    # stream many requests from a JSONL file over ONE connection:
    python scripts/serve_client.py --port 7777 --input requests.jsonl

Each request line gets exactly one JSON response line (same order);
responses are printed to stdout as received, so a slow sample does not
buffer earlier results.
"""

from __future__ import annotations

import argparse
import json
import socket
import sys


def send_requests(host: str, port: int, requests, timeout: float = None):
    """Yield one parsed response dict per request dict, over a single
    connection (the server answers in order)."""
    with socket.create_connection((host, port), timeout=timeout) as sock:
        f = sock.makefile("rwb")
        for req in requests:
            f.write((json.dumps(req) + "\n").encode())
            f.flush()
            line = f.readline()
            if not line:
                raise ConnectionError(
                    "server closed the connection mid-stream"
                )
            yield json.loads(line)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--timeout", type=float, default=None,
                    help="socket timeout in seconds (default: none — "
                         "remote compiles can take minutes)")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", type=str,
                     help="JSONL file of request objects")
    src.add_argument("--protein", type=str,
                     help="sequence or PDB path (one-shot request)")
    ap.add_argument("--ligand", type=str, default="*",
                    help="SMILES / SDF / MOL2 ('*' = dummy ligand)")
    ap.add_argument("-n", "--num_samples", type=int, default=1)
    ap.add_argument("--mask_prob", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trajectory", type=int, default=0,
                    help="also request a K-frame denoising movie")
    ap.add_argument("--id", dest="req_id", type=str, default=None)
    args = ap.parse_args(argv)

    if args.input:
        reqs = [json.loads(l) for l in open(args.input) if l.strip()]
    else:
        req = {
            "protein": args.protein,
            "ligand": args.ligand,
            "num_samples": args.num_samples,
            "seed": args.seed,
        }
        if args.mask_prob is not None:
            req["mask_prob"] = args.mask_prob
        if args.trajectory:
            req["trajectory"] = args.trajectory
        if args.req_id is not None:
            req["id"] = args.req_id
        reqs = [req]

    failed = 0
    for resp in send_requests(args.host, args.port, reqs, args.timeout):
        print(json.dumps(resp), flush=True)
        failed += 1 if "error" in resp else 0
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
