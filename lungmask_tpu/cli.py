"""Command-line interface: ``lungmask INPUT OUTPUT``.

Flag-for-flag parity with the reference CLI
(/root/reference/lungmask/__main__.py:20-144): positional input (file or DICOM
directory) and output path; ``--modelname`` (incl. the fused
``LTRCLobes_R231`` mode, which forbids ``--modelpath``), ``--modelpath``,
``--cpu`` (forces batch size 1), ``--nopostprocess``, ``--batchsize``,
``--noprogress``, ``--version``, ``--removemetadata``. Output carries the
input geometry and, unless disabled, the keep-listed DICOM tags plus the
marker tags (SeriesDescription "Created with lungmask", WC=1/WW=2).

TPU-native extensions beyond the reference surface: ``--noHU``
(reconstructed 8-bit stack mode), ``--warmup`` (AOT compile into the
persistent cache), ``--cohort`` (stream a directory of volumes through the
overlapped cohort pipeline), ``--serve`` (HTTP segmentation endpoint,
lungmask_tpu.runtime.serve), ``--postprocessing {exact,device}`` (host
C++ bit-faithful cleanup vs the all-on-accelerator lane).
"""

from __future__ import annotations

import argparse
import os
import sys

from lungmask_tpu import __version__
from lungmask_tpu.inferer import LMInferer
from lungmask_tpu.io import loader
from lungmask_tpu.logger import logger


def path(string: str) -> str:
    """argparse type for the input positional: exits (reference-faithful
    sys.exit, not argparse error) when the path is absent."""
    if not os.path.exists(string):
        sys.exit(f"File not found: {string}")
    return string


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument(
        "input",
        metavar="input",
        type=path,
        nargs="?",
        default=None,
        help="CT volume to segment: a single image file, or a directory that "
        "will be scanned recursively for a DICOM series",
    )
    parser.add_argument(
        "output",
        metavar="output",
        type=str,
        nargs="?",
        default=None,
        help="where to write the resulting label volume",
    )
    parser.add_argument(
        "--warmup",
        nargs="?",
        type=int,
        const=192,
        default=None,
        metavar="N_SLICES",
        help="ahead-of-time compile pass: run the configured model(s) over a "
        "synthetic N_SLICES-slice volume so every device program lands in "
        "the persistent compilation cache (first cold compile on a fresh "
        "machine takes minutes; warmed runs start in seconds). No input/"
        "output needed; honors --modelname/--modelpath/--batchsize/--cpu.",
    )
    parser.add_argument(
        "--modelname",
        help="which pretrained segmentation model to run",
        type=str,
        choices=["R231", "LTRCLobes", "LTRCLobes_R231", "R231CovidWeb"],
        default="R231",
    )
    parser.add_argument(
        "--modelpath",
        help="load weights from this local .pth/.npz file instead of the "
        "named model's download",
        default=None,
    )
    parser.add_argument(
        "--cpu",
        help="run on the host CPU even if a TPU is present; also drops the "
        "batch size to 1",
        action="store_true",
    )
    parser.add_argument(
        "--nopostprocess",
        help="skip the volume-level cleanup pass (connected-component "
        "filtering and hole filling)",
        action="store_true",
    )
    parser.add_argument(
        "--batchsize",
        type=int,
        help="slices per forward-pass batch; smaller values need less "
        "accelerator memory at some speed cost (default: TPU-tuned 32; "
        "the reference used 20)",
        default=None,
    )
    parser.add_argument(
        "--noprogress",
        action="store_true",
        help="suppress progress bars",
    )
    parser.add_argument(
        "--version",
        help="print the installed version and exit",
        action="version",
        version=__version__,
    )
    parser.add_argument(
        "--removemetadata",
        action="store_true",
        help="strip patient/study tags from the output instead of carrying "
        "them over; only meaningful for metadata-capable formats like DICOM",
    )
    parser.add_argument(
        "--noHU",
        action="store_true",
        help="For processing of 8-bit image stacks (e.g. jpg/png slices) that are not in Hounsfield units: intensities are mapped to the model's HU window. Implies --removemetadata.",
    )
    parser.add_argument(
        "--postprocessing",
        choices=["exact", "device"],
        default="exact",
        help="volume cleanup implementation: 'exact' replicates the "
        "reference's label semantics bit-for-bit on the host C++ core; "
        "'device' keeps the whole cleanup on the accelerator (fastest "
        "cohort lane, with a small documented divergence contract — see "
        "transforms/postprocess_device.py)",
    )
    parser.add_argument(
        "--cohort",
        action="store_true",
        help="batch mode: INPUT is a directory whose entries are volumes "
        "(image files, or subdirectories holding one DICOM series each); "
        "masks are streamed to OUTPUT/<name>_mask.nii.gz through the "
        "overlapped decode/compute/postprocess pipeline "
        "(lungmask_tpu.runtime.cohort). The reference CLI handles one "
        "volume per invocation; this keeps the chip busy across a cohort.",
    )
    parser.add_argument(
        "--serve",
        metavar="[HOST:]PORT",
        default=None,
        help="start an HTTP segmentation endpoint instead of processing one "
        "volume (POST /v1/segment, GET /healthz|/v1/models|/metrics — "
        "lungmask_tpu.runtime.serve). No input/output arguments needed; "
        "honors --modelname/--modelpath/--batchsize/--cpu/--nopostprocess/"
        "--postprocessing. Runs --warmup first if given.",
    )

    args = parser.parse_args(sys.argv[1:] if argv is None else argv)

    batchsize = args.batchsize
    if args.cpu:
        batchsize = 1

    if args.warmup is not None:
        _warmup(args, batchsize)
        if args.serve is None:
            return
    if args.serve is not None:
        from lungmask_tpu.runtime.serve import serve_forever

        host, _, port_s = args.serve.rpartition(":")
        try:
            port = int(port_s)
        except ValueError:
            parser.error(f"--serve expects [HOST:]PORT, got {args.serve!r}")
        serve_forever(_build_inferer(args, batchsize), host or "127.0.0.1", port)
        return
    if args.input is None or args.output is None:
        parser.error("input and output are required (or pass --warmup/--serve)")
    if args.cohort:
        if args.noHU:
            parser.error("--cohort does not support --noHU stacks")
        _cohort(args, batchsize)
        return

    # keeping any Patient / Study info is the default; deactivated by flag or
    # for non-HU data (no DICOM source)
    keepmetadata = not args.removemetadata and not args.noHU

    logger.info("Load model")

    if args.noHU:
        from lungmask_tpu.io import nohu

        if os.path.isdir(args.input):
            input_image = nohu.load_image_directory(args.input)
        else:
            input_image = nohu.load_image_stack([args.input])
    else:
        input_image = loader.load_input_image(
            args.input, disable_tqdm=args.noprogress, read_metadata=keepmetadata
        )

    logger.info("Infer lungmask")
    inferer = _build_inferer(args, batchsize)
    result = inferer.apply(input_image)

    result_out = input_image.with_array(result)

    if keepmetadata:
        kept = {
            k: v
            for k, v in input_image.metadata.items()
            if k in loader.DICOM_METADATA_TO_KEEP
        }
        kept["0008|103e"] = "Created with lungmask"  # SeriesDescription
        kept["0028|1050"] = "1"  # Window Center
        kept["0028|1051"] = "2"  # Window Width
        result_out.metadata = kept
    else:
        result_out.metadata = {}

    logger.info(f"Save result to: {args.output}")
    loader.write_image(result_out, args.output)


def _build_inferer(args, batchsize):
    mode = getattr(args, "postprocessing", "exact")
    if args.modelname == "LTRCLobes_R231":
        assert args.modelpath is None, (
            "the fused LTRCLobes_R231 mode resolves both models from the "
            "registry; --modelpath is not accepted here"
        )
        return LMInferer(
            modelname="LTRCLobes",
            force_cpu=args.cpu,
            fillmodel="R231",
            batch_size=batchsize,
            volume_postprocessing=not args.nopostprocess,
            tqdm_disable=args.noprogress,
            postprocessing_mode=mode,
        )
    return LMInferer(
        modelname=args.modelname,
        modelpath=args.modelpath,
        force_cpu=args.cpu,
        batch_size=batchsize,
        volume_postprocessing=not args.nopostprocess,
        tqdm_disable=args.noprogress,
        postprocessing_mode=mode,
    )


_COHORT_EXTS = (
    ".dcm", ".nii", ".nii.gz", ".mha", ".mhd", ".nrrd", ".nhdr",
    ".hdr", ".img", ".vtk", ".gipl", ".gipl.gz",
)


def _cohort(args, batchsize) -> None:
    """Batch mode: each entry of INPUT (subdirectory = one DICOM series,
    file = one volume) streams through runtime.cohort; masks land in OUTPUT.
    Failures are per-volume (logged, recorded), not fatal — a corrupt series
    must not abort a 500-volume overnight run."""
    from lungmask_tpu.runtime.cohort import run_cohort

    if not os.path.isdir(args.input):
        sys.exit(f"--cohort input must be a directory: {args.input}")
    sources = []
    for entry in sorted(os.listdir(args.input)):
        p = os.path.join(args.input, entry)
        if os.path.isdir(p):
            sources.append(p)
        elif entry.lower().endswith(_COHORT_EXTS):
            sources.append(p)
    if not sources:
        sys.exit(f"No volumes found in {args.input}")
    os.makedirs(args.output, exist_ok=True)

    logger.info(f"Cohort: {len(sources)} volumes -> {args.output}")
    inferer = _build_inferer(args, batchsize)
    stats = run_cohort(sources, inferer, output_dir=args.output)
    failed = [r for r in stats.results if r.error]
    for r in failed:
        logger.error(f"{r.name}: {r.error}")
    logger.info(
        f"Cohort done: {len(stats.results) - len(failed)}/{len(stats.results)} "
        f"volumes in {stats.wall_seconds:.1f}s "
        f"({stats.volumes_per_hour:.0f} volumes/hour)"
    )
    if failed and len(failed) == len(stats.results):
        sys.exit("every volume failed")


def _warmup(args, batchsize) -> None:
    """AOT compile pass: drive the full pipeline on a synthetic lung phantom
    so every program shape the configured model needs is compiled and stored
    in the persistent cache (runtime.enable_compile_cache). The forward
    engine's split-dispatch family ({1,2,3}-chunk programs) covers every
    volume length; preprocessing programs are per-slice-bucket, so warming
    with N close to your typical series length warms those too."""
    import time

    import numpy as np

    n = int(args.warmup)
    logger.info(f"Warmup: compiling device programs for a {n}-slice volume")
    # ogrid (broadcast axes) — dense int64 mgrid would transiently cost
    # 3 x n x 512 x 512 x 8 bytes (~1.2 GB at the default n) for nothing.
    zz, yy, xx = np.ogrid[0:n, 0:512, 0:512]
    vol = np.full((n, 512, 512), -1000, dtype=np.int16)
    body2d = ((yy[0] - 256) / 200.0) ** 2 + ((xx[0] - 256) / 230.0) ** 2 < 1
    vol[:, body2d] = 40
    for cx in (160, 352):
        lung = (
            ((zz - n / 2) / (n * 0.45)) ** 2
            + ((yy - 256) / 140.0) ** 2
            + ((xx - cx) / 90.0) ** 2
            < 1
        )
        vol[lung] = -800
    inferer = _build_inferer(args, batchsize)
    t0 = time.perf_counter()
    inferer.apply(vol)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    inferer.apply(vol)
    warm = time.perf_counter() - t0
    logger.info(
        f"Warmup complete: first (compiling) pass {cold:.1f}s, "
        f"warm pass {warm:.1f}s; programs persisted to the compile cache"
    )


if __name__ == "__main__":
    main()
