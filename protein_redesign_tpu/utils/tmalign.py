"""TM-align wrapper (reference `ProteinReDiff/tmalign.py:23-49`).

Same subprocess contract, but the binary is our in-repo C++ implementation
(`native/tmalign/tmalign.cpp`), resolved from (in order) $PRD_TMALIGN,
$PATH, or <repo>/bin/TMalign — built on demand with make. The reference
hardcodes an absolute cluster path (`tmalign.py:31`); this resolves
portably.
"""

from __future__ import annotations

import itertools
import os
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Tuple

import numpy as np

from ..chem.protein import Protein, protein_to_pdb_file

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = _REPO_ROOT / "native" / "tmalign"
_BIN = _REPO_ROOT / "bin" / "TMalign"


def find_tmalign(build: bool = True) -> str:
    """Resolve the TMalign binary, building the in-repo one if needed."""
    env = os.environ.get("PRD_TMALIGN")
    if env and Path(env).exists():
        return env
    on_path = shutil.which("TMalign")
    if on_path:
        return on_path
    if _BIN.exists():
        return str(_BIN)
    if build and _NATIVE_DIR.exists():
        subprocess.check_call(["make", "-s"], cwd=_NATIVE_DIR)
        if _BIN.exists():
            return str(_BIN)
    raise FileNotFoundError(
        "TMalign binary not found; set $PRD_TMALIGN or run "
        f"`make -C {_NATIVE_DIR}`."
    )


def run_tmalign(
    prb: Protein, ref: Protein, mirror: bool = False
) -> Tuple[float, np.ndarray, np.ndarray]:
    """TM2 score + rigid transform aligning prb onto ref.

    Returns (tmscore, t, R) with the reference's row-vector convention:
    aligned = t + pos @ R (`generate.py:178-187`); in mirror mode R folds
    in the z-reflection exactly as `tmalign.py:47-48` does.
    """
    binary = find_tmalign()
    with tempfile.TemporaryDirectory() as tmp_dir:
        prb_path = os.path.join(tmp_dir, "prb.pdb")
        ref_path = os.path.join(tmp_dir, "ref.pdb")
        protein_to_pdb_file(prb, prb_path)
        protein_to_pdb_file(ref, ref_path)
        cmd = [binary, prb_path, ref_path, "-outfmt", "2"]
        if mirror:
            cmd += ["-mirror", "1"]
        matrix_path = os.path.join(tmp_dir, "matrix.txt")
        cmd += ["-m", matrix_path]
        try:
            output = subprocess.check_output(cmd).decode()
        except subprocess.CalledProcessError as e:
            raise RuntimeError(f"TMalign failed: {e}")
        line = output.splitlines()[1]
        tmscore = float(line.split()[3])  # TM2
        t, R = np.empty((3,)), np.empty((3, 3))
        with open(matrix_path, "r") as f:
            for i, mline in enumerate(itertools.islice(f, 2, 5)):
                t[i], R[0, i], R[1, i], R[2, i] = map(
                    float, mline.split()[1:]
                )
        if mirror:
            R = np.array([[1, 0, 0], [0, 1, 0], [0, 0, -1]]) @ R
        return tmscore, t, R


def best_tmalign(
    prb: Protein, ref: Protein
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Mirror-aware alignment: max of normal and mirror trials
    (`generate.py:173-177`)."""
    normal = run_tmalign(prb, ref)
    mirrored = run_tmalign(prb, ref, mirror=True)
    return max(normal, mirrored, key=lambda r: r[0])
