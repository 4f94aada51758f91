"""Round-5 on-chip probes (VERDICT r4 items 3 and 5).

Subcommands (fresh process each — Pallas knobs are import-time):

  trimulx   The MFU >= 20% attempt: the round-4 h64x1 lever stack
            (bf16 pair stream + rows kernel + fast_softmax) re-measured
            with the stream EXTENDED through the trimul's materialized
            [N,N,D] triangle product (models/denoiser.py fast_accum
            under pair_stream_bf16 — the f32 buffer the corrected
            roofline isolated as the binding N=512 term, 2.24x over
            bw-SOL). Rows are directly comparable to BASELINE.md
            round-4 "bf16 pair residual stream + lever stack".
  widelong  Wide-head long-context rungs (VERDICT r4 #5): h64x1 at
            N=768/1024, fwd + train, auto plan (the measured XLA/chunk
            fallbacks) vs kernel-forced, under f32 and bf16 streams —
            the data `resolve_attention_plan`'s wide-head gate needs to
            extend past `LONGCTX_CHUNK_MIN_N`.

Reference hot ops being modeled: `ProteinReDiff/modules.py:246-343`
(triangle multiplication), `AF2_modules.py:228-243` (triangle
attention heads).
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

from protein_redesign_tpu.utils.platform import apply_platform_override

apply_platform_override()

from protein_redesign_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)

from r3_probes import BASE, fwd_bench  # noqa: E402
from r4_probes import train_step_bench  # noqa: E402

H64 = BASE.replace(head_dim=64, num_heads=1, esm_dim=320)


def cmd_trimulx(args):
    for bucket, n_res in ((384, 304), (512, 420)):
        # f32-stream control (unchanged code path — should reproduce
        # round-4's 13.05/28.01 ms): isolates the trimul extension.
        fwd_bench(H64, bucket, n_res, 20, "h64x1 f32-stream")
        bf = H64.replace(pair_stream_bf16=True)
        fwd_bench(bf, bucket, n_res, 20, "h64x1 bf16-stream+trimul")
        combo = bf.replace(use_pallas=True)
        fwd_bench(combo, bucket, n_res, 20, "h64x1 combo(bf16s+tm+kern)")
        fwd_bench(combo.replace(fast_softmax=True), bucket, n_res, 20,
                  "h64x1 combo+fastsm")
        train_step_bench(
            H64.replace(training_mode=True, remat=False), bucket, n_res,
            6, "h64x1 f32-stream")
        train_step_bench(
            bf.replace(training_mode=True, remat=False), bucket, n_res,
            6, "h64x1 bf16-stream+trimul")
        train_step_bench(
            combo.replace(training_mode=True, remat=False), bucket,
            n_res, 6, "h64x1 combo(bf16s+tm+kern)")


def cmd_widelong(args):
    # Auto plan at 768/1024 resolves to chunked/XLA for C>=64 (the
    # wide-head gate stops below LONGCTX_CHUNK_MIN_N); kernel-forced
    # rides the same rows kernel measured 1.90x/2.00x at h16x4.
    for bucket, n_res in ((768, 640), (1024, 880)):
        for bf16s in (False, True):
            stream = "bf16s" if bf16s else "f32s"
            base = H64.replace(pair_stream_bf16=bf16s)
            fwd_bench(base, bucket, n_res, 10,
                      f"h64x1 {stream} auto")
            fwd_bench(base.replace(use_pallas=True), bucket, n_res, 10,
                      f"h64x1 {stream} kernel")
            train_step_bench(
                base.replace(training_mode=True, remat=True), bucket,
                n_res, 4, f"h64x1 {stream} auto remat")
            train_step_bench(
                base.replace(training_mode=True, remat=True,
                             use_pallas=True), bucket, n_res, 4,
                f"h64x1 {stream} kernel remat")


def cmd_widemh(args):
    """Multi-head wide cell (advisor r4): h64x4 kernel vs XLA at the
    gate sizes. The auto plan keeps h64x4 on XLA until this measures a
    win (resolve_attention_plan num_heads==1 guard)."""
    H64X4 = BASE.replace(head_dim=64, num_heads=4, esm_dim=320)
    for bucket, n_res in ((384, 304), (512, 420)):
        for kern, tag in ((False, "xla"), (True, "kernel")):
            cfg = H64X4.replace(use_pallas=kern)
            fwd_bench(cfg, bucket, n_res, 10, f"h64x4 {tag}")
        for kern, tag in ((False, "xla"), (True, "kernel")):
            cfg = H64X4.replace(training_mode=True, remat=False,
                                use_pallas=kern)
            train_step_bench(cfg, bucket, n_res, 4, f"h64x4 {tag}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("trimulx")
    sub.add_parser("widelong")
    sub.add_parser("widemh")
    args = p.parse_args()
    enable_compilation_cache()
    {"trimulx": cmd_trimulx, "widelong": cmd_widelong,
     "widemh": cmd_widemh}[args.cmd](args)


if __name__ == "__main__":
    main()
