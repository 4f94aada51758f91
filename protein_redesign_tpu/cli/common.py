"""Shared inference plumbing for the generation CLIs.

Covers the reference's post-processing helpers (`generate.py:65-91`,
`scripts/predict_batch_strc_msk_inp.py:96-164`) and replaces
``trainer.predict`` with a bucket-grouped, jit-cached sampling runner:
complexes are grouped by padding bucket so each bucket compiles once, and
batches stream through the single-program `lax.scan` sampler.
"""

from __future__ import annotations

import dataclasses
import random
import warnings
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax

from ..utils.platform import apply_platform_override

apply_platform_override()

import jax.numpy as jnp
import numpy as np

from ..chem.mol import Molecule, mol_from_file, mol_from_smiles, update_mol_positions
from ..chem.protein import (
    RESIDUE_TYPES,
    Protein,
    protein_from_pdb_file,
    protein_from_sequence,
)
from ..chem.smiles import strip_cxsmiles
from ..data.collate import collate_fn, numeric_batch, pick_bucket
from ..data.wire import compress_batch
from ..models.prdiff import ProteinReDiffModel, ddim_tau_grid
from ..ops import nanometre_to_angstrom

RESIDUE_TYPES_NEW = ["X"] + RESIDUE_TYPES

# Auto dispatch-segmentation policy (SamplingRunner._segments_for):
# bound every DDPM dispatch to ~SEGMENT_MAX_DISPATCH_MS of estimated
# runtime (BASELINE.md long-context caveat: the tunneled worker crashes
# on single executions past ~1 min — observed at B=1 N>=768 AND at
# B=8 bucket 192). The estimate is deliberately conservative (paper-
# scale h16x4 per-step cost, cubic in the bucket, linear in batch);
# overestimating just adds a few ~25 ms dispatch boundaries.
SEGMENT_REF_STEP_MS = 6.5      # measured B=1 bucket-192 DDPM step
SEGMENT_REF_BUCKET = 192
SEGMENT_MAX_DISPATCH_MS = 30_000.0


def softmax_np(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def update_pos(
    protein: Protein, ligand: Molecule, pos: np.ndarray
) -> Tuple[Protein, Molecule]:
    """Write sampled complex coordinates back (reference `generate.py:65-74`):
    ligand atoms occupy the complex-axis prefix, CA-only protein follows."""
    n_lig = ligand.num_atoms()
    atom_pos = np.zeros_like(protein.atom_pos)
    atom_pos[:, 1] = pos[n_lig: n_lig + len(protein.aatype)]
    atom_mask = np.zeros_like(protein.atom_mask)
    atom_mask[:, 1] = 1.0
    protein = dataclasses.replace(
        protein, atom_pos=atom_pos, atom_mask=atom_mask
    )
    ligand = update_mol_positions(ligand, pos[:n_lig])
    return protein, ligand


def predict_seq(proba: np.ndarray) -> str:
    """Argmax decode + strip terminal X (reference
    `predict_batch_strc_msk_inp.py:141-146`)."""
    tokens = np.argmax(softmax_np(np.asarray(proba)), axis=-1)
    return "".join(RESIDUE_TYPES_NEW[i] for i in tokens).lstrip("X").rstrip("X")


def update_seq(protein: Protein, proba: np.ndarray) -> Protein:
    """Replace the protein's sequence by the argmax decode
    (reference `generate.py:83-91`), with two robustness fixes over the
    reference: stripped terminal X also trims the coordinate arrays (the
    reference leaves aatype shorter than atom_pos and later IndexErrors),
    and interior X predictions fall back to the input residue instead of
    raising ValueError."""
    tokens = np.argmax(softmax_np(np.asarray(proba)), axis=-1)
    seq = "".join(RESIDUE_TYPES_NEW[i] for i in tokens)
    # Strip over the RESIDUE portion of the complex axis only. The ligand
    # slots are residue-masked to exact zeros and thus always decode X,
    # so in-contract this matches the reference's whole-string strip —
    # but it cannot frame-shift the window if a caller ever passes
    # unmasked logits where a ligand slot decodes non-X.
    n_res = len(protein.aatype)
    res_seq = seq[len(seq) - n_res:] if n_res else ""
    stripped = res_seq.lstrip("X")
    res_lo = n_res - len(stripped)
    stripped = stripped.rstrip("X")
    res_hi = res_lo + len(stripped)
    if len(stripped) == 0:
        res_lo, res_hi = 0, n_res
        stripped = res_seq or "X" * n_res
    aatype = np.array(
        [
            RESIDUE_TYPES.index(s) if s in RESIDUE_TYPES
            else max(int(protein.aatype[res_lo + i]), 0)
            for i, s in enumerate(stripped)
        ],
        dtype=np.int64,
    )
    return dataclasses.replace(
        protein,
        chain_index=protein.chain_index[res_lo:res_hi],
        residue_index=protein.residue_index[res_lo:res_hi],
        aatype=aatype,
        atom_pos=protein.atom_pos[res_lo:res_hi],
        atom_mask=protein.atom_mask[res_lo:res_hi],
    )


def parse_ligand_arg(ligand: str) -> Molecule:
    """.sdf/.mol2 path, SMILES string, or '*' dummy
    (reference `generate.py:119-123`)."""
    if ligand.endswith(".sdf") or ligand.endswith(".mol2"):
        return mol_from_file(ligand)
    mol = mol_from_smiles(ligand)
    return update_mol_positions(mol, np.zeros((mol.num_atoms(), 3)))


def parse_ligands(
    ligand_input: Union[str, Path, list]
) -> List[Molecule]:
    """SMILES list or .smiles file, zero-conformer (reference
    `predict_batch_strc_msk_inp.py:114-128`); CXSMILES blocks stripped."""
    if isinstance(ligand_input, list):
        lines = ligand_input
    else:
        with open(ligand_input, "r") as f:
            lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    ligands = []
    for line in lines:
        mol = mol_from_smiles(strip_cxsmiles(line))
        ligands.append(
            update_mol_positions(mol, np.zeros((mol.num_atoms(), 3)))
        )
    return ligands


def mask_sequence_by_percent(
    seq: str, percentage: float = 0.2,
    rng: Optional[random.Random] = None,
) -> str:
    """String-space masking (reference
    `predict_batch_strc_msk_inp.py:158-164`). Pass a seeded
    ``random.Random`` for reproducible masks (the CLIs seed it from
    --seed; the reference uses the unseeded global RNG)."""
    aa_to_replace = (rng or random).sample(
        range(len(seq)), int(len(seq) * percentage)
    )
    return "".join(
        "X" if idx in aa_to_replace else char for idx, char in enumerate(seq)
    )


def proteins_from_fasta_with_mask(
    fasta_file: Union[str, Path], mask_percent: float = 0.0,
    rng: Optional[random.Random] = None,
) -> Tuple[List[Protein], List[str], List[str]]:
    """(reference `predict_batch_strc_msk_inp.py:96-112`)

    Robustness over the reference's line-per-protein parse: wrapped
    records (sequence split over multiple lines) are joined, and CRLF
    line endings are stripped — the reference misaligns names against
    proteins on wrapped FASTA and crashes on '\\r'. Single-line
    LF records (its own fixtures) behave identically."""
    names, raw_seqs = [], []
    with open(fasta_file, "r") as f:
        for line in f:
            line = line.rstrip("\r\n")
            if line.startswith(">"):
                names.append(line.lstrip(">").replace(" ", "_"))
                raw_seqs.append("")
            elif line.strip():
                if not raw_seqs:  # headerless leading sequence line
                    names.append("seq_0")
                    raw_seqs.append("")
                raw_seqs[-1] += line.strip()
    proteins, sequences = [], []
    for raw in raw_seqs:
        sequence = mask_sequence_by_percent(raw, mask_percent, rng=rng)
        proteins.append(protein_from_sequence(sequence))
        sequences.append(sequence)
    return proteins, names, sequences


def load_protein_arg(protein: str) -> Protein:
    """PDB path or sequence string with X masks (reference
    `generate.py:113-117`)."""
    if protein.endswith(".pdb"):
        return protein_from_pdb_file(protein)
    return protein_from_sequence(protein)


def add_esm_args(parser) -> None:
    """Shared ESM flags (one definition for all five CLIs)."""
    parser.add_argument("--esm_model",
                        default="facebook/esm2_t33_650M_UR50D",
                        help="HF model id or local path of the ESM-2 "
                             "checkpoint (e.g. a smaller esm2_t12_35M_UR50D)")
    parser.add_argument("--esm_backend", choices=["torch", "jax"],
                        default="torch",
                        help="run ESM-2 with HF torch on the host or with "
                             "the in-repo JAX port on the default JAX "
                             "platform (TPU when available)")
    parser.add_argument("--require_esm", action="store_true",
                        help="error out instead of silently using zero ESM "
                             "embeddings when weights are unavailable")


def add_sampler_args(parser) -> None:
    """Shared sampler-selection flags."""
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=("ddpm", "ddim", "ddim_parallel"),
                        help="ddim: accelerated subsequence sampling; "
                             "ddim_parallel: window-parallel Picard "
                             "iteration (models/paratime.py)")
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity (ddim sampler only)")
    parser.add_argument("--window", type=int, default=8,
                        help="ddim_parallel: timesteps evaluated per Picard "
                             "sweep (shard over chips via --num_devices)")
    parser.add_argument("--ptol", type=float, default=1e-3,
                        help="ddim_parallel: per-point convergence tolerance "
                             "(masked RMS change, nm); 0 = exact sequential "
                             "trajectory")
    parser.add_argument("--coarse_init", type=int, default=0,
                        help="ddim_parallel: warm-start Picard from an "
                             "N-step coarse sequential solve")
    parser.add_argument("--seq_reverse", type=str, default="reference",
                        choices=("reference", "ancestral"),
                        help="sequence-channel reverse step: the "
                             "reference softmax recurrence, or a proper "
                             "DDPM/DDIM posterior with per-step known-"
                             "residue clamping (ddpm/ddim samplers)")
    parser.add_argument("--reveal_schedule", type=str, default="linear",
                        choices=("linear", "cosine"),
                        help="absorbing-mode commitment schedule: linear "
                             "in progress, or the MaskGIT cosine (late "
                             "commitments; seq_process='absorbing' only)")
    parser.add_argument("--reveal_temperature", type=float, default=0.0,
                        help="absorbing-mode: sample committed identities "
                             "from softmax(logits/tau) instead of argmax")
    parser.add_argument("--reveal_conf_noise", type=float, default=0.0,
                        help="absorbing-mode: t/T-annealed gumbel noise "
                             "scale on the commitment-ranking scores "
                             "(MaskGIT choice_temperature)")
    parser.add_argument("--attn_chunk", type=int, default=0,
                        help="evaluate attention in query chunks of this "
                             "size (same numerics, O(N/chunk) less peak "
                             "HBM); must divide the padded bucket size. "
                             "Usually unnecessary: the auto attention "
                             "plan handles the 768/1024 buckets")
    parser.add_argument("--sample_segments", type=int, default=0,
                        help="split the DDPM/DDIM sampler's steps into this "
                             "many host-chained device dispatches (bit-"
                             "identical results; bounds single-execution "
                             "runtime). 0 = auto: split so each "
                             "dispatch's estimated runtime stays ~30 s "
                             "(tunneled-TPU workers crash past ~1 min, "
                             "BASELINE.md); 1 = always one program")
    parser.add_argument("--pallas_auto_min_n", type=int, default=384,
                        help="auto attention plan from this padded size "
                             "up: fused Pallas kernel for inference "
                             "(1.15x at N=384 .. 2.05x at N=768 over "
                             "XLA, BASELINE.md), query-chunked fallback "
                             "for training / N>=2048; 0 = plain XLA "
                             "everywhere")
    parser.add_argument("--use_pallas", action="store_true",
                        help="force the fused Pallas attention kernel at "
                             "every bucket (the auto plan already selects "
                             "it where it wins; BASELINE.md)")
    for flag, what in (
        ("use_pallas_trimul", "fused triangle-multiplication"),
        ("use_pallas_transition", "fused LN+MLP transition"),
        ("use_pallas_outer", "fused OuterLinear"),
        ("use_pallas_fused_gated", "fully-fused gated attention "
                                   "(projections+gating in-kernel)"),
        ("use_pallas_bwd", "flash-style Pallas attention BACKWARD "
                           "(training-path kernel enablement)"),
        ("trimul_dmajor", "channel-major triangle-multiplication "
                          "contraction layout"),
    ):
        parser.add_argument(f"--{flag}", action="store_true",
                            help=f"opt-in {what} "
                                 "(experimental; see BASELINE.md kernel "
                                 "notes for measured verdicts)")
    from argparse import BooleanOptionalAction
    parser.add_argument("--sample_guard", action=BooleanOptionalAction,
                        default=None,
                        help="sanitize sampler state each step (non-finite "
                             "-> 0, |state| clamped to 1e4; identity on "
                             "healthy trajectories, keeps diverged/"
                             "untrained checkpoints scorable). DEFAULT ON; "
                             "--no-sample_guard restores raw recurrences")
    parser.add_argument("--outer_factored", action=BooleanOptionalAction,
                        default=None,
                        help="factored OuterLinear+OPM (no [N,N,2S] concat; "
                             "float reassociation only). DEFAULT ON for new "
                             "models since round 3 (op 1.54-2.43x measured); "
                             "unset = keep the checkpoint config's value; "
                             "--no-outer_factored forces the unfactored "
                             "path (bit-exact repro of pre-flip sampling)")
    parser.add_argument("--pair_stream_bf16", action=BooleanOptionalAction,
                        default=None,
                        help="bf16 pair residual stream at sampling time "
                             "(numerics-only; params unchanged). Measured "
                             "fwd 1.06-1.14x at h64x1 N=384/512 "
                             "(BASELINE.md round-4); unset = keep the "
                             "checkpoint config's value")


def sampler_cfg_overrides(args) -> Dict:
    """ModelConfig.replace(**...) overrides from add_sampler_args flags
    (inference-time sampler behavior riding on the model config)."""
    overrides = dict(
        seq_reverse=args.seq_reverse,
        reveal_schedule=args.reveal_schedule,
        reveal_temperature=args.reveal_temperature,
        reveal_conf_noise=args.reveal_conf_noise,
        attn_chunk=args.attn_chunk,
        pallas_auto_min_n=args.pallas_auto_min_n,
    )
    # store_true kernel toggles: only override when the user set them, so
    # a checkpoint config's own kernel fields survive the load.
    for flag in ("use_pallas", "use_pallas_trimul", "use_pallas_transition",
                 "use_pallas_outer", "use_pallas_fused_gated",
                 "use_pallas_bwd", "trimul_dmajor"):
        if getattr(args, flag):
            overrides[flag] = True
    # tri-state (BooleanOptionalAction, default None): only override the
    # checkpoint config when the user passed --outer_factored or
    # --no-outer_factored explicitly.
    if getattr(args, "outer_factored", None) is not None:
        overrides["outer_factored"] = bool(args.outer_factored)
    if getattr(args, "sample_guard", None) is not None:
        overrides["sample_guard"] = bool(args.sample_guard)
    if getattr(args, "pair_stream_bf16", None) is not None:
        overrides["pair_stream_bf16"] = bool(args.pair_stream_bf16)
    return overrides


def apply_serving_defaults(cfg, args):
    """Measured serving defaults, applied AFTER the checkpoint config
    and any explicit flags (call on the final inference ModelConfig).

    pair_stream_bf16 defaults ON for wide-head (head_dim >= 64)
    inference: fwd 1.06-1.14x at h64x1 (BASELINE.md round-4 lever
    table) and the round-5 quality gate measured it quality-neutral on
    a trained checkpoint (val TM delta -0.0001 mean / |0.011| max
    per-complex, masked recovery +0.002, controls identical —
    `benchmarks/quality_report_r4_abs_h16_bf16pair.json` vs the f32
    eval). An explicit --no-pair_stream_bf16 (tri-state unset = None)
    always wins; narrow-head checkpoints keep their stored value (the
    lever is unmeasured for perf there)."""
    if (
        getattr(args, "pair_stream_bf16", None) is None
        and cfg.head_dim >= 64
        and not cfg.pair_stream_bf16
    ):
        cfg = cfg.replace(pair_stream_bf16=True)
    return cfg


def runner_sampler_kwargs(args) -> Dict:
    """SamplingRunner kwargs from add_sampler_args flags."""
    return dict(
        sampler=args.sampler, ddim_steps=args.ddim_steps, eta=args.eta,
        window=args.window, ptol=args.ptol, coarse_init=args.coarse_init,
        segments=args.sample_segments,
    )


def make_inference_mesh(num_devices: int):
    """A 1-D data-parallel mesh over the first ``num_devices`` devices, or
    None for the plain single-device path. The TPU-native equivalent of
    the reference's DDP-predict device fan-out
    (`predict_batch_strc_msk_inp.py:209-216`)."""
    if num_devices is None or num_devices <= 1:
        return None
    from ..parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < num_devices:
        raise ValueError(
            f"--num_devices {num_devices} requested but only "
            f"{len(devices)} JAX devices are visible"
        )
    return make_mesh(devices[:num_devices], (num_devices, 1))


class SamplingRunner:
    """Bucket-grouped replacement for ``trainer.predict``.

    Complexes are padded to ladder buckets so each bucket shape compiles
    exactly once; every batch runs the full diffusion scan as ONE XLA
    program on device.
    """

    def __init__(
        self,
        model: ProteinReDiffModel,
        params,
        buckets: Optional[Sequence[int]] = None,  # default: the full
        #   DataConfig ladder, so the CLIs accept every rung the data
        #   pipeline supports (incl. the 2048 long-context rung)
        batch_size: int = 1,
        mask_prob: Optional[float] = None,
        mesh=None,
        sampler: str = "ddpm",
        ddim_steps: int = 50,
        eta: float = 0.0,
        window: int = 8,
        ptol: float = 1e-3,
        coarse_init: int = 0,
        segments: int = 0,
        pad_to_batch: bool = False,
    ):
        """With ``mesh`` (a ('data','model') jax Mesh), the sample batch is
        sharded over the 'data' axis and params replicated — data-parallel
        sampling across chips (the reference's DDP-predict,
        `predict_batch_strc_msk_inp.py:209-216`, the XLA way). batch_size
        should then be a multiple of the data-axis size."""
        # Mesh data-parallel sampling keeps the kernel paths: every
        # attention kernel is wrapped in custom_partitioning with a
        # rows-axis sharding rule (ops/pallas_attention.py "GSPMD"
        # section), so a 'data'-sharded batch simply runs the kernel on
        # each device's local row shard. (A round-2 interim guard forced
        # mesh inference onto the XLA/chunked paths before that existed.)
        self.model = model
        if buckets is None:
            from ..config import DataConfig

            buckets = DataConfig().buckets
        self.buckets = tuple(buckets)
        self.batch_size = batch_size
        # pad_to_batch: repeat the last sample so EVERY group has exactly
        # batch_size rows — one compiled program per bucket, ever. Worth
        # the wasted remainder rows for long-lived servers where each new
        # group shape costs a 150-300 s remote compile (cli/serve.py).
        self.pad_to_batch = pad_to_batch
        self.mask_prob = (
            model.cfg.mask_prob if mask_prob is None else mask_prob
        )
        self.mesh = mesh
        self.sampler = sampler
        self.ddim_steps = ddim_steps
        self._warned_nonfinite = False
        if sampler not in ("ddpm", "ddim", "ddim_parallel"):
            raise ValueError(f"Unknown sampler: {sampler}")
        if sampler == "ddpm" and eta != 0.0:
            raise ValueError(
                "--eta only applies to the ddim sampler (the ddpm "
                "ancestral sampler has its own fixed noise schedule and "
                "silently ignoring the flag would be misleading)"
            )
        if sampler == "ddim_parallel" and eta != 0.0:
            raise ValueError(
                "--eta is only supported by the plain ddim sampler; "
                "ddim_parallel is deterministic (eta=0)"
            )
        if (
            sampler == "ddim_parallel"
            and model.cfg.seq_process != "absorbing"
            and model.cfg.seq_reverse != "reference"
        ):
            raise ValueError(
                "seq_reverse='ancestral' is implemented for the ddpm/ddim "
                "samplers; ddim_parallel uses the reference recurrence "
                "(seq_reverse is ignored entirely under "
                "seq_process='absorbing')"
            )
        if (
            sampler == "ddim_parallel"
            and model.cfg.seq_process == "absorbing"
            and (
                model.cfg.reveal_temperature > 0.0
                or model.cfg.reveal_conf_noise > 0.0
            )
        ):
            raise ValueError(
                "ddim_parallel with seq_process='absorbing' requires the "
                "deterministic reveal: drop --reveal_temperature / "
                "--reveal_conf_noise (the Picard fixed point needs a "
                "deterministic step map), or use the ddpm/ddim samplers"
            )
        if (
            sampler == "ddim_parallel"
            and model.cfg.seq_process == "absorbing"
            and coarse_init > 0
        ):
            # Fail at construction (serve/CLI startup), not inside the
            # first request: paratime raises the same constraint late.
            raise ValueError(
                "--coarse_init warm starts are implemented for the "
                "gaussian sequence channel; drop it for absorbing "
                "checkpoints"
            )
        if mesh is not None:
            from ..parallel.mesh import replicated

            self.params = jax.device_put(params, replicated(mesh))
            if sampler != "ddim_parallel":
                # With pure data-parallel sampling, a batch smaller than
                # the data axis would waste chips; lift the floor. (For
                # ddim_parallel the WINDOW rides the data axis instead and
                # batches stay whole per program.)
                self.batch_size = max(batch_size, mesh.shape["data"])
        else:
            self.params = params
        # mask_prob is a TRACED argument (not a closure constant) so one
        # compiled program serves every masking fraction — crucial for the
        # long-lived serve CLI where per-request retraces would cost
        # minutes of TPU compile time each.
        self.trace_count = 0  # incremented only when jax re-traces

        # Segmented DDPM/DDIM sampling: host-chain S equal slices of the
        # step streams (timestep+key, or tau+tau_prev+key for DDIM)
        # through ONE compiled segment program — bit-identical to a
        # single scan (a scan over concatenated slices IS one scan), but
        # each device dispatch runs steps/S of the work. Needed on
        # tunneled-TPU platforms whose worker crashes on single
        # executions past ~1 min (BASELINE.md long-context caveat).
        # segments=0 (default) resolves PER GROUP at run time from a
        # conservative runtime estimate (_segments_for).
        self.segments = segments
        if segments > 1 and sampler == "ddim_parallel":
            raise ValueError(
                "--sample_segments applies to the ddpm/ddim samplers; "
                "ddim_parallel already bounds its dispatches by the "
                "Picard window"
            )
        seg_T = self._step_count()
        if segments > 1 and seg_T % segments:
            raise ValueError(
                f"step count ({seg_T}) must be divisible by "
                f"--sample_segments ({segments})"
            )
        if sampler in ("ddpm", "ddim"):
            def _init(p, b, k, mp):
                self.trace_count += 1
                return model.sample_init(p, b, k, mask_prob=mp)

            def _fin(b, carry):
                self.trace_count += 1
                return model.sample_finish(b, carry)

            if sampler == "ddpm":
                def _seg(p, b, carry, ts, keys):
                    self.trace_count += 1
                    return model.sample_segment(p, b, carry, ts, keys)
            else:
                def _seg(p, b, carry, taus, taus_prev, keys):
                    self.trace_count += 1
                    return model.sample_ddim_segment(
                        p, b, carry, taus, taus_prev, keys, eta=eta
                    )

            self._jit_init = jax.jit(_init)
            self._jit_seg = jax.jit(_seg)
            self._jit_fin = jax.jit(_fin)

        def _sample(p, b, k, mp):
            self.trace_count += 1
            if sampler == "ddim":
                return model.sample_ddim(
                    p, b, k, ddim_steps=ddim_steps, eta=eta, mask_prob=mp
                )
            if sampler == "ddim_parallel":
                # Picard parallel-in-time sampling (models/paratime.py):
                # with a mesh, the WINDOW axis is what rides the 'data'
                # axis, so keep per-program batches at batch_size.
                from ..models.paratime import sample_ddim_parallel

                pos, logits, _stats = sample_ddim_parallel(
                    model, p, b, k, ddim_steps=ddim_steps, window=window,
                    tol=ptol, mask_prob=mp, mesh=mesh,
                    coarse_init=coarse_init,
                )
                return pos, logits
            return model.sample(p, b, k, mask_prob=mp)

        self._jit = jax.jit(_sample)

    def _segments_for(self, bucket: int, batch_rows: int) -> int:
        """Per-group dispatch segmentation (0 = auto). Auto estimates the
        whole sample's runtime from a conservative cost model (cubic in
        the bucket, linear in the batch rows — the O(N^3) triangle ops
        dominate) and splits so each dispatch stays under
        SEGMENT_MAX_DISPATCH_MS: the tunneled worker crashes on single
        executions past ~1 min, observed at B=1 N>=768 (157.7 s) AND at
        B=8 bucket 192 (~97 s) — BASELINE.md."""
        if self.segments >= 1:
            return self.segments
        if self.sampler == "ddim_parallel":
            return 1
        T = self._step_count()
        est_step_ms = (
            SEGMENT_REF_STEP_MS
            * max(batch_rows, 1)
            * (bucket / SEGMENT_REF_BUCKET) ** 3
        )
        max_steps = max(int(SEGMENT_MAX_DISPATCH_MS / est_step_ms), 1)
        if T <= max_steps:
            return 1
        for d in range(2, T + 1):
            if T % d == 0 and T // d <= max_steps:
                return d
        return T

    def _step_count(self) -> int:
        """Steps the sampler's scan walks: the schedule length for ddpm,
        the tau-grid length for the ddim family."""
        return (
            self.model.cfg.num_steps
            if self.sampler == "ddpm"
            else self.ddim_steps
        )

    def _sample_group(self, p, b, k, mp, bucket: int, traj_frames: int = 0):
        S = self._segments_for(bucket, b["residue_mask"].shape[0])
        T = self._step_count()
        if traj_frames:
            # Frames ride the segment boundaries (a host fetch of the
            # carry between dispatches — zero change to any compiled
            # program, so the final sample is bit-identical with or
            # without trajectory capture). Force S to a multiple of
            # traj_frames that still divides the step count, at least as
            # fine as the auto dispatch bound.
            if self.sampler not in ("ddpm", "ddim"):
                raise ValueError(
                    "trajectory capture rides the segmented ddpm/ddim "
                    "samplers; ddim_parallel refines all steps jointly "
                    "and has no sequential intermediate states"
                )
            if traj_frames < 0 or T % traj_frames:
                raise ValueError(
                    f"trajectory frames ({traj_frames}) must be a "
                    f"positive divisor of the sampler's step count ({T})"
                )
            if self.segments >= 1:
                # Explicit --sample_segments wins (documented contract of
                # _segments_for); refuse rather than silently compiling a
                # different segment shape than the user warmed/measured.
                if self.segments % traj_frames:
                    raise ValueError(
                        f"trajectory frames ({traj_frames}) must divide "
                        f"the explicit --sample_segments ({self.segments}) "
                        f"so frames land on segment boundaries"
                    )
            else:
                S = next(
                    c for c in range(max(S, traj_frames), T + 1)
                    if c % traj_frames == 0 and T % c == 0
                )
        if S <= 1 and not traj_frames:
            return self._jit(p, b, k, mp)
        model = self.model
        prepared, carry = self._jit_init(p, b, k, mp)
        k_scan = jax.random.split(k, 4)[3]
        if self.sampler == "ddim":
            taus, taus_prev = ddim_tau_grid(model.cfg.num_steps, T)
            streams = (taus, taus_prev, jax.random.split(k_scan, T))
        else:
            streams = (
                jnp.arange(T - 1, -1, -1), jax.random.split(k_scan, T)
            )
        seg_len = T // S
        frames = []
        for s in range(S):
            lo = s * seg_len
            carry = self._jit_seg(
                p, prepared, carry,
                *(arr[lo:lo + seg_len] for arr in streams),
            )
            if traj_frames and (s + 1) % (S // traj_frames) == 0:
                # carry[0] is the coordinate state (nm) for every sampler.
                frames.append(np.asarray(nanometre_to_angstrom(carry[0])))
        out = self._jit_fin(prepared, carry)
        if traj_frames:
            return out, np.stack(frames, axis=0)  # [K, B, N, 3]
        return out

    def _put_batch(self, batch):
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        # ddim_parallel shards the Picard WINDOW over 'data'; the sample
        # batch itself is replicated.
        spec = P() if self.sampler == "ddim_parallel" else P("data")
        sharding = NamedSharding(self.mesh, spec)
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    def run(
        self,
        datas: Sequence[Dict],
        key: jax.Array,
        mask_prob: Optional[float] = None,
        trajectory: int = 0,
    ) -> List[Tuple[np.ndarray, ...]]:
        """Returns per-input (positions [n,3] Angstrom, seq logits [n,21]),
        trimmed to each complex's true node count. ``mask_prob`` overrides
        the runner default without recompiling (traced scalar).
        ``trajectory=K`` (ddpm/ddim) additionally captures K intermediate
        coordinate frames at segment boundaries — each result becomes
        (positions, seq logits, frames [K,n,3] Angstrom, last frame =
        final pre-readout state); the final sample stays bit-identical
        (frames are host fetches between the same compiled dispatches)."""
        mp = jnp.asarray(
            self.mask_prob if mask_prob is None else mask_prob, jnp.float32
        )
        order = sorted(
            range(len(datas)),
            key=lambda i: pick_bucket(
                datas[i]["num_atoms"] + datas[i]["num_residues"], self.buckets
            ),
        )
        results: List[Optional[Tuple[np.ndarray, np.ndarray]]] = (
            [None] * len(datas)
        )
        for start in range(0, len(order), self.batch_size):
            idxs = order[start: start + self.batch_size]
            group = [datas[i] for i in idxs]
            if self.pad_to_batch:
                while len(group) < self.batch_size:
                    group.append(group[-1])
            if self.mesh is not None and self.sampler != "ddim_parallel":
                # Keep the sharded batch axis full (repeat the last sample;
                # the padded rows are dropped below — results index by idxs).
                d_size = self.mesh.shape["data"]
                while len(group) % d_size:
                    group.append(group[-1])
            n_max = max(d["num_atoms"] + d["num_residues"] for d in group)
            bucket = pick_bucket(n_max, self.buckets)
            batch = numeric_batch(
                collate_fn(group, buckets=(bucket,))
            )
            # Compact wire format (data/wire.py): 2.9x less host->device
            # traffic per request; lossless except ESM->bf16, which is only
            # applied when the model computes in bf16 anyway.
            batch = compress_batch(
                batch,
                esm_bf16=jnp.dtype(self.model.cfg.dtype) == jnp.bfloat16,
            )
            if self.mesh is None:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            else:
                # ONE transfer: device_put the host arrays with their
                # sharding directly (jnp.asarray first would transfer to
                # the default device and then re-place — 2x traffic, and
                # on leaky tunneled clients 2x the staging-buffer leak).
                batch = self._put_batch(batch)
            key, sub = jax.random.split(key)
            out = self._sample_group(
                self.params, batch, sub, mp, bucket, traj_frames=trajectory
            )
            (pos, seq_logits), traj = out if trajectory else (out, None)
            pos = np.asarray(pos)
            seq_logits = np.asarray(seq_logits)
            # Diverged/untrained checkpoints can produce NaN/inf samples
            # (observed: random-init h64x1 weights under the Gaussian
            # sequence channel, BASELINE.md round-3 quality section);
            # downstream decode then silently writes all-X sequences and
            # NaN coordinates. Surface it once, loudly.
            if not self._warned_nonfinite and not (
                np.isfinite(pos).all() and np.isfinite(seq_logits).all()
            ):
                self._warned_nonfinite = True
                warnings.warn(
                    "sampler returned non-finite positions/logits — the "
                    "checkpoint is likely untrained or diverged; decoded "
                    "outputs will be garbage (all-X sequences / NaN "
                    "coordinates)",
                    RuntimeWarning,
                    stacklevel=2,
                )
            for row, i in enumerate(idxs):
                n = datas[i]["num_atoms"] + datas[i]["num_residues"]
                results[i] = (pos[row, :n], seq_logits[row, :n]) + (
                    (traj[:, row, :n],) if trajectory else ()
                )
        return results  # type: ignore[return-value]
