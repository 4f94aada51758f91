"""Typed configuration for the whole framework.

A single dataclass replaces the reference's composed argparse groups
(`/root/reference/ProteinReDiff/model.py:130-170`, `train.py:54-61`); field
names match the reference CLI flags 1:1 (``--single_dim``, ``--mask_prob``,
…) so README commands port directly. Dead reference args (the GVP/recycle
group, `model.py:160-170`) are kept as accepted-but-unused fields for
checkpoint/CLI compatibility.
"""

from __future__ import annotations

import dataclasses
import json
from argparse import ArgumentParser, Namespace
from typing import Any, Mapping, Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Denoiser + diffusion hyperparameters (reference `model.py:139-158`)."""

    # Diffusion
    mask_prob: float = 1.0
    num_steps: int = 64
    diffusion_schedule: str = "linear"
    training_mode: bool = False
    # Network dims
    esm_dim: int = 1280
    time_dim: int = 256
    dist_dim: int = 256
    single_dim: int = 512
    pair_dim: int = 64
    head_dim: int = 16
    num_heads: int = 4
    transition_factor: int = 4
    num_blocks: int = 12
    max_bond_distance: int = 7
    max_relpos: int = 32
    # Optimization
    learning_rate: float = 4e-4
    warmup_steps: int = 1000
    ema_decay: float = 0.999
    # Dead reference args kept for CLI/checkpoint compatibility
    # (`model.py:160-170`; n_recycles is stored but never used upstream).
    n_recycles: int = 4
    top_k_neighbors: int = 30
    dropout: float = 0.3
    num_gvp_encoder_layers: int = 3
    num_positional_embeddings: int = 16
    gvp_edge_hidden_dim_scalar: int = 32
    gvp_edge_hidden_dim_vector: int = 32
    # TPU-native knobs (new in this framework)
    dtype: str = "bfloat16"        # activation/compute dtype
    param_dtype: str = "float32"   # parameter dtype
    remat: bool = True             # jax.checkpoint per FoldingBlock
    use_pallas: bool = False       # Pallas fused-attention kernel (opt-in;
    #                                measured <=0.95x of XLA at paper scale)
    pallas_auto_min_n: int = 384   # auto attention plan
    #                                (models/denoiser.resolve_attention_plan;
    #                                measured, BASELINE.md long-context
    #                                table + paper-bucket sweeps): once the
    #                                padded complex axis reaches this,
    #                                NARROW-HEAD (head_dim < 32) inference
    #                                uses the fused Pallas attention (1.15x
    #                                at N=384 .. 2.05x at N=768 over XLA —
    #                                never materializes the [rows,H,N,N]
    #                                logits); WIDE-HEAD (head_dim >= 64,
    #                                h64x1) joins at the round-4 measured
    #                                sizes — training 384/512 (1.08x/
    #                                1.23x), inference 512 (1.13x) —
    #                                while sequence-parallel / unmeasured
    #                                sizes / N>=2048 fall back to
    #                                query-chunked attention at N>=768
    #                                (the unchunked lowering fails to
    #                                compile at 1024). Explicit
    #                                --use_pallas / --attn_chunk take
    #                                precedence; 0 disables the auto plan
    #                                entirely.
    use_pallas_trimul: bool = False  # fused triangle-multiplication kernel
    #                                  (ops/pallas_trimul.py)
    trimul_dmajor: bool = False      # channel-major [d,N,N] triangle-
    #                                  multiplication contraction (explicit
    #                                  transposes around a d-batched NxN
    #                                  dot) instead of the d-minor einsum.
    #                                  Measured on-chip before defaulting
    #                                  (BASELINE.md trimul layout sweep).
    use_pallas_transition: bool = False  # fused LN->MLP transition kernel
    #                                      (ops/pallas_transition.py)
    use_pallas_outer: bool = False   # fused OuterLinear kernel
    #                                  (ops/pallas_outer.py; never
    #                                  materializes the [N,N,2*single_dim]
    #                                  concat features)
    outer_factored: bool = True      # algebraic OuterLinear + OPM
    #                                  factorization (plain XLA):
    #                                  (x_i - x_j) @ W2 collapses to
    #                                  u_i - u_j (u = x @ W2; half the
    #                                  op's FLOPs), and the product half
    #                                  runs as one gemm without the
    #                                  [N,N,2*single_dim] concat. Same
    #                                  params/tree; float reassociation
    #                                  only. DEFAULT ON since the on-chip
    #                                  probe: op 1.54x, denoiser fwd
    #                                  1.13x, train step 1.10x at N=384
    #                                  h16x4 (BASELINE.md round-3
    #                                  outer-factored section). Old
    #                                  checkpoints restore their saved
    #                                  False (field-absent pre-round-3
    #                                  configs are defaulted to False at
    #                                  load — utils/checkpoint.py); opt
    #                                  back in per-run with
    #                                  --outer_factored.
    pair_stream_bf16: bool = False   # carry the [B,N,N,pair_dim] PAIR
    #                                  residual stream in bfloat16 across
    #                                  the folding-block stack (cast in
    #                                  before block 0, cast out before the
    #                                  final symmetrization). Halves the
    #                                  HBM traffic of every pair-op
    #                                  read/modify/write — the binding
    #                                  bound for the trimul/transition ops
    #                                  in the h64x1 roofline (VERDICT r3
    #                                  item 3 lever; benchmarks/r4_probes
    #                                  bf16pair). Round 5: also demotes
    #                                  the trimul's materialized [N,N,D]
    #                                  triangle product (fast_accum — the
    #                                  N=512 roofline's binding 67 MB/op
    #                                  f32 buffer; MXU still accumulates
    #                                  f32). Numerics: block-internal
    #                                  math already runs at cfg.dtype;
    #                                  this demotes only the residual
    #                                  ACCUMULATOR + product buffer, so
    #                                  it is opt-in, gated by the bf16pair
    #                                  quality report, and excluded from
    #                                  parity tests.
    use_pallas_bwd: bool = True      # differentiate the rows-attention
    #                                  kernel through a flash-style Pallas
    #                                  BACKWARD (ops/pallas_attention.
    #                                  _rows_attention_bwd) instead of the
    #                                  einsum-reference VJP, and let the
    #                                  auto plan select the kernel for
    #                                  TRAINING too (narrow-head,
    #                                  384 <= N < 768; chunked attention
    #                                  keeps the 768+ rungs until the
    #                                  kernel is measured there). Measured
    #                                  train-step wins on v5e (B=1,
    #                                  BASELINE.md): 1.21x at N=384,
    #                                  1.48x at N=512 over XLA — the
    #                                  einsum-VJP variant was a net LOSS
    #                                  (0.89x/0.98x), which is why
    #                                  training previously kept XLA.
    #                                  Opt out with --no-use_pallas_bwd.
    use_pallas_fused_gated: bool = False  # when the attention kernel path
    #                                  is selected (use_pallas / auto plan),
    #                                  run the FULLY-fused gated row
    #                                  attention (LN + projections + softmax
    #                                  + gating + out-projection in one
    #                                  kernel) instead of the measured rows
    #                                  kernel. Measured end-to-end: LOSES
    #                                  (0.74-0.86x vs the rows kernel at
    #                                  N=384..768 — BASELINE.md fused
    #                                  aux-kernel sweep); stays opt-in.
    sequence_parallel: bool = False  # shard the pair tensor's first complex
    #                                  axis over the mesh 'model' axis inside
    #                                  the Denoiser (GSPMD inserts the
    #                                  collectives); for N >~ 1024 where the
    #                                  O(N^2) pair activations outgrow one
    #                                  chip's HBM. Requires running under a
    #                                  ('data','model') mesh context.
    fast_softmax: bool = False     # bf16 attention probabilities (serving
                                   # speed; breaks strict fp32 parity)
    attn_chunk: int = 0            # >0: evaluate attention in query chunks
    #                                of this size (lax.scan, ops/
    #                                chunked_attention.py) instead of
    #                                materializing the [rows, H, N, N]
    #                                logits — the O(N^3) HBM wall that
    #                                blocks N>=768 buckets. Numerically
    #                                identical to the unchunked path; must
    #                                divide the padded bucket size. 0 = off.
    seq_process: str = "gaussian"  # sequence-channel diffusion process.
    #                                "gaussian": the reference's Gaussian
    #                                diffusion on ±1 one-hots. "absorbing":
    #                                masked discrete diffusion — positions
    #                                are corrupted to the zero row (the
    #                                net's native unknown encoding) with
    #                                prob (t+1)/T, trained with CE at the
    #                                corrupted positions (no KL — the KL
    #                                is what teaches copying, BASELINE.md
    #                                ablation), and sampled by
    #                                confidence-ranked progressive reveal.
    #                                The coordinate channel stays Gaussian.
    seq_reverse: str = "reference"  # sequence-channel reverse step.
    #                                "reference": seq_t <- softmax(pred)*2-1
    #                                (`model.py:414`) — measured to make
    #                                the sampled sequence numerically
    #                                INDEPENDENT of the trained weights
    #                                (locked to the init-noise argmax;
    #                                BASELINE.md). "ancestral": proper
    #                                DDPM posterior on the seq channel
    #                                with seq_pred as x0-hat, known
    #                                residues clamped per step like the
    #                                training forward process q()
    loss_mode: str = "reference"   # "reference": the exact quirky
    #                                reductions (scalar-broadcast KL/CE,
    #                                (seq_pred+1)/2 as CE logits,
    #                                model.py:504-526). "per_position":
    #                                principled per-sample terms — true
    #                                logits, CE restricted to the MASKED
    #                                residues (the actual design targets;
    #                                under the reference loss their
    #                                recovery stays at chance, BASELINE.md
    #                                quality tables).
    #                                IGNORED when seq_process="absorbing":
    #                                the absorbing loss is a complete
    #                                objective of its own (per-sample MSE +
    #                                per-position CE, no KL) and never
    #                                consults loss_mode — verified by
    #                                bit-identical 20k-step training runs
    #                                with and without per_position
    #                                (BASELINE.md round-3 quality cells).
    self_cond: bool = False        # coordinate self-conditioning (Chen et
    #                                al. 2022 "analog bits"; beyond
    #                                reference — VERDICT r3 quality lever):
    #                                the denoiser additionally sees the
    #                                PREVIOUS step's clean-structure
    #                                estimate x0-hat as an extra RBF
    #                                distance embedding on the pair track
    #                                (embed_sc_dist; gated by a per-sample
    #                                flag so "no estimate yet" is an exact
    #                                no-op). Training runs a stop-gradient
    #                                first pass to produce x0-hat on a
    #                                per-batch 50% coin (lax.cond — the
    #                                average step cost is ~+1/6); all
    #                                sequential samplers thread x0-hat
    #                                through the scan carry. Adds one
    #                                ProjLinear to the param tree, so the
    #                                flag must match the checkpoint.
    #                                ddim_parallel (paratime) rejects it:
    #                                cross-step conditioning breaks the
    #                                fixed-point rebuild's step
    #                                independence.
    sample_guard: bool = True      # sanitize the samplers' scan carry each
    #                                step: non-finite values -> 0/±bound and
    #                                |state| clamped to 1e4 (nm / ±1-one-hot
    #                                units; healthy trajectories are O(1)).
    #                                IDENTITY on finite, in-range state —
    #                                bit-exact for trained checkpoints — but
    #                                keeps diverged/untrained weights (e.g.
    #                                random-init controls, BASELINE.md
    #                                round-3 footnote) from collapsing to
    #                                all-NaN positions/all-X sequences, so
    #                                control rows stay scorable. Opt out
    #                                with --no-sample_guard.
    # Absorbing-mode sampling controls (seq_process='absorbing' only;
    # inference-time — safe to override on any absorbing checkpoint).
    reveal_schedule: str = "linear"  # cumulative commitment target as a
    #                                  function of progress r = 1 - t/T.
    #                                  "linear": r (round-2 default).
    #                                  "cosine": 1 - cos(pi/2 * r) — the
    #                                  MaskGIT mask schedule (few early
    #                                  commitments while the structure is
    #                                  still noise, most in the late
    #                                  low-noise steps).
    reveal_temperature: float = 0.0  # >0: committed identities are SAMPLED
    #                                  from softmax(logits/tau) over the 20
    #                                  real classes instead of argmax;
    #                                  confidence ranking then uses the
    #                                  sampled class's probability.
    reveal_conf_noise: float = 0.0   # >0: gumbel noise of this scale,
    #                                  annealed by t/T, added to the
    #                                  log-confidence ranking scores
    #                                  (MaskGIT's choice_temperature) so
    #                                  early commitment order is explored.

    @property
    def num_residue_classes(self) -> int:
        return 21  # 20 residue types + pad/mask class 0

    def replace(self, **kw: Any) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset/batching options (reference `data.py:206-259`)."""

    data_dir: str = "data"
    cache_dir: Optional[str] = None  # default: <data_dir>/PDB_processed_cache
    batch_size: int = 1
    num_workers: int = 1
    # Static-shape buckets for XLA (new; the reference pads per-batch
    # dynamically at `data.py:81`, which would force recompilation).
    buckets: Tuple[int, ...] = (64, 128, 192, 256, 384, 512, 768, 1024, 2048)
    # The 768+ rungs (long-context, round 2) are handled by the
    # default auto attention plan (`resolve_attention_plan`: fused Pallas
    # kernel for inference at 768, query-chunked attention at 1024 and
    # for long-context training) — unchunked triangle-attention logits
    # alone are ~3.6/8.6 GB bf16 there and do not compile at 1024. The
    # 2048 rung falls back to query-chunked XLA under the auto plan (the
    # plan's kernel branch caps at n < 2048); an explicit --use_pallas
    # engages the K-chunked online-softmax rows kernel (VMEM
    # O(N*KCHUNK)) there instead.

    def resolved_cache_dir(self) -> str:
        if self.cache_dir is not None:
            return self.cache_dir
        return f"{self.data_dir}/PDB_processed_cache"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer options (reference `train.py:34-50` Lightning flags)."""

    seed: int = 1234
    save_dir: str = "runs/default"
    max_steps: int = -1            # -1: run until killed (ref max_epochs=-1)
    max_epochs: int = -1
    val_every_steps: int = 1000
    val_repeats: int = 1           # avg val over this many random (t, mask)
    #                                draws — small val sets give one-draw
    #                                val_loss too much variance for top-k
    #                                checkpoint selection
    log_every_steps: int = 50
    checkpoint_top_k: int = 3
    accumulate_grad_batches: int = 1
    num_devices: int = -1          # -1: all visible devices
    mesh_shape: Optional[Tuple[int, int]] = None  # (data, model); None=auto
    gradient_clip_norm: float = 0.0  # 0 disables
    wire_compression: bool = True  # compact host->device batch dtypes
    #                                (data/wire.py): 2.9x less transfer
    #                                traffic, and bounds the tunneled-TPU
    #                                client's per-transfer host leak
    cache_device_batches: bool = False  # transfer every batch ONCE and
    #                                reuse across epochs (shuffling batch
    #                                order, not composition). For datasets
    #                                whose collated batches fit in HBM;
    #                                eliminates steady-state host->device
    #                                traffic entirely
    device_cache_gb: float = 0.0   # with --cache_device_batches: cap the
    #                                device-resident batch cache at this
    #                                many GB (host-side batch bytes as the
    #                                proxy); overflow batches stay host-
    #                                resident and are streamed per epoch.
    #                                0 = unlimited (small-dataset quality
    #                                cells, the round-3 behavior). Lets
    #                                PDBbind-scale datasets (25k+ complexes,
    #                                far beyond HBM) keep the zero-transfer
    #                                fast path for the hot subset while
    #                                bounding the per-epoch leak of the
    #                                tunneled axon client proportionally.
    lr_decay_steps: int = 0        # >0: cosine-decay the LR over this many
    #                                steps after warmup (beyond reference,
    #                                whose LinearLR ramps then stays
    #                                constant — models plateau-oscillate)
    lr_min_ratio: float = 0.1      # decay floor as a fraction of peak LR


def _add_dataclass_args(parser: ArgumentParser, cls: type, group: str) -> None:
    from argparse import BooleanOptionalAction

    g = parser.add_argument_group(group)
    for field in dataclasses.fields(cls):
        name = f"--{field.name}"
        if field.type in ("bool", bool) or isinstance(field.default, bool):
            if field.default:
                # default-True flags get --x / --no-x pairs
                g.add_argument(name, action=BooleanOptionalAction,
                               default=field.default)
            else:
                # reference-style store_true flags (--training_mode, ...)
                g.add_argument(name, action="store_true",
                               default=field.default)
        elif isinstance(field.default, (tuple, list)):
            g.add_argument(
                name,
                type=lambda s: tuple(int(x) for x in s.split(",")),
                default=field.default,
            )
        elif field.default is None:
            g.add_argument(name, type=str, default=None)
        else:
            g.add_argument(name, type=type(field.default), default=field.default)


def add_model_args(parser: ArgumentParser) -> ArgumentParser:
    _add_dataclass_args(parser, ModelConfig, "DiffusionModel")
    return parser


def add_data_args(parser: ArgumentParser) -> ArgumentParser:
    _add_dataclass_args(parser, DataConfig, "Data")
    return parser


def add_train_args(parser: ArgumentParser) -> ArgumentParser:
    _add_dataclass_args(parser, TrainConfig, "Trainer")
    return parser


def _from_namespace(cls: type, args: Union[Namespace, Mapping[str, Any]]) -> Any:
    if isinstance(args, Namespace):
        args = vars(args)
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in args.items() if k in names and v is not None})


def model_config_from_args(args: Union[Namespace, Mapping]) -> ModelConfig:
    return _from_namespace(ModelConfig, args)


def data_config_from_args(args: Union[Namespace, Mapping]) -> DataConfig:
    return _from_namespace(DataConfig, args)


def train_config_from_args(args: Union[Namespace, Mapping]) -> TrainConfig:
    return _from_namespace(TrainConfig, args)


def config_to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def model_config_from_json(text: str) -> ModelConfig:
    return ModelConfig(**json.loads(text))
