"""Basecall CLI — drop-in replacement for the reference driver.

Flags mirror reference radian/basecall.py:19-37 (same names, same
defaults) plus TPU-specific extensions (read batching, assembly mode,
compute dtype, multi-host sharding).

Usage:
    python -m radian_tpu.cli.basecall FAST5_DIR FASTA_DIR [flags]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Basecall a nanopore dRNA sequencing run on TPU."
    )
    p.add_argument("fast5_dir", help="Directory of single/multi fast5 files.")
    p.add_argument("fasta_dir", help="Directory to output fasta files.")
    p.add_argument("--local", action="store_true",
                   help="(reference compat; its TF session setup has no "
                        "JAX equivalent needed)")
    p.add_argument("--chunk-len", default=1024, type=int)
    p.add_argument("--step-size", default=128, type=int)
    p.add_argument("--batch-size", default=32, type=int,
                   help="(accepted for reference compat; superseded by "
                        "--read-batch bucketing)")
    p.add_argument("--outlier-clip", default=4, type=float)
    p.add_argument("--rna-model", default="None",
                   help="12-mer LM json path, or 'None' to disable fusion")
    p.add_argument("--sig-model", default=None,
                   help="checkpoint: .npz (native), .h5 (keras import), "
                        "or omit for seeded init")
    p.add_argument("--sig-config", default=None, help="model config yaml")
    p.add_argument("--beam-width", default=6, type=int)
    p.add_argument("--decode-type", choices=["global", "chunk"],
                   default="global")
    p.add_argument("--sig-threshold", default=0.5, type=float)
    p.add_argument("--rna-threshold", default=0.5, type=float)
    p.add_argument("--context-len", default=11, type=int)
    # TPU extensions
    p.add_argument("--read-batch", default=8, type=int,
                   help="reads decoded concurrently per bucket")
    p.add_argument("--assembly-mode", choices=["first", "mean"],
                   default="first",
                   help="'first' replicates the reference's first-window "
                        "stitch; 'mean' is a corrected true average")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32")
    p.add_argument("--prep-mode",
                   choices=["auto", "fullread", "strips", "windows"],
                   default="auto",
                   help="global-mode forward: 'fullread' = one causal "
                        "TCN pass over the whole read (fastest, same "
                        "values); 'strips' = per-window kept-slab "
                        "compute; 'windows' = reference op order; "
                        "'auto' picks fullread whenever valid")
    p.add_argument("--chunk-prep",
                   choices=["auto", "fused", "fullprobs", "windows"],
                   default="auto",
                   help="chunk-mode execution: 'fused' streams window "
                        "slabs through one full-read forward + head "
                        "fix-up + in-scan decode (fast, reference "
                        "window values); 'fullprobs' slices window "
                        "probs from the full-read pass (corrected: "
                        "true left context, no zero-history heads — "
                        "fastest and more accurate, non-parity); "
                        "'windows' = materialised reference-order path")
    p.add_argument("--no-chunk-crop", action="store_true",
                   help="disable the tiled center-crop in 'fullprobs' "
                        "chunk mode (crop keeps each window's center "
                        "emission span so spans tile the read and the "
                        "stitch is plain concatenation: matches "
                        "global-mode identity, 96.8 vs 85.9 for the "
                        "overlapped-consensus stitch on the trained "
                        "eval)")
    p.add_argument("--chunk-lm", action="store_true",
                   help="fuse the gated k-mer LM inside the tiled chunk "
                        "decode (needs --rna-model and the tiled crop): "
                        "the low-latency serving counterpart of "
                        "global+LM - same fused accuracy, 2.6-2.9x "
                        "lower single-read latency")
    p.add_argument("--chunk-max-lab", default=512, type=int,
                   help="per-window emission cap for the fused path's "
                        "label compaction (overflow raises; tune down "
                        "for trained models to cut device->host bytes)")
    p.add_argument("--consensus", choices=["reference", "device"],
                   default="reference",
                   help="chunk-mode stitcher: 'reference' = exact "
                        "difflib semantics (native C++); 'device' = "
                        "jitted offset-correlation (4-run scoring)")
    p.add_argument("--seed", default=0, type=int,
                   help="init seed when no --sig-model is given")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="shard each read batch over this many local chips "
                        "(single-process multi-chip; read-batch must be "
                        "divisible by it)")
    p.add_argument("--shard-reads", action="store_true",
                   help="multi-host: each host basecalls its share of reads")
    p.add_argument("--streaming", action="store_true",
                   help="bounded-memory streaming mode: fast5 ingest "
                        "overlaps compute, fasta flushed in read order")
    p.add_argument("--bucket-lengths", default=None,
                   help="comma-separated fixed bucket ladder (e.g. "
                        "'4096,8192,16384'): caps compiled programs and "
                        "enables ahead-of-time warmup")
    p.add_argument("--prewarm", action="store_true",
                   help="compile all --bucket-lengths programs before "
                        "processing reads (fills the on-disk compile "
                        "cache; see scripts/prewarm.py)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from radian_tpu.pipeline import BasecallOptions, load_basecaller

    options = BasecallOptions(
        chunk_len=args.chunk_len,
        step_size=args.step_size,
        outlier_clip=args.outlier_clip,
        beam_width=args.beam_width,
        decode_type=args.decode_type,
        sig_threshold=args.sig_threshold,
        rna_threshold=args.rna_threshold,
        context_len=args.context_len,
        assembly_mode=args.assembly_mode,
        read_batch=args.read_batch,
        prep_mode=args.prep_mode,
        chunk_prep=args.chunk_prep,
        chunk_crop=not args.no_chunk_crop,
        chunk_lm=args.chunk_lm,
        chunk_max_lab=args.chunk_max_lab,
        consensus=args.consensus,
        bucket_lengths=(
            tuple(int(x) for x in args.bucket_lengths.split(","))
            if args.bucket_lengths else None
        ),
    )
    mesh = None
    if args.mesh_data is not None:
        from radian_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, model=1)
    bc = load_basecaller(
        checkpoint=args.sig_model,
        config_path=args.sig_config,
        rna_model=args.rna_model,
        options=options,
        seed=args.seed,
        compute_dtype=(
            jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
        ),
        mesh=mesh,
    )
    if args.prewarm:
        t = bc.warmup()
        print(f"prewarm: compiled {len(set(options.bucket_lengths))} "
              f"bucket programs in {t:.1f}s")
    if args.shard_reads:
        from radian_tpu.parallel.distributed import basecall_sharded

        basecall_sharded(bc, args.fast5_dir, args.fasta_dir)
    else:
        bc.basecall_directory(args.fast5_dir, args.fasta_dir,
                              streaming=args.streaming)


if __name__ == "__main__":
    main()
