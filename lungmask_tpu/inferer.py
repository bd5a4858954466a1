"""LMInferer: the public inference orchestrator.

API parity with the reference's ``LMInferer``
(/root/reference/lungmask/mask.py:71-232): same constructor signature and
semantics (modelpath overrides modelname, fill model pairing, batch size,
postprocessing toggle), same ``apply()`` contract for both input modes
(geometry-carrying image → LPS-normalized processing → original orientation
out; raw numpy volume → axis passthrough), and the same dual-model fusion
(FN-fill/FP-removal with a spare label, /root/reference/lungmask/mask.py:223-232).

TPU-native execution (see SURVEY §7): preprocessing and the U-Net run as
batched device programs (transforms.preprocess + runtime.engine), volume
postprocessing runs as the windowed host algorithm (transforms.postprocess,
one native call), and the mask paste-back is one native batched gather pass
per volume (ops.resample.paste_masks_host → csrc lm_paste_masks; in
device-postprocessing mode the mask alternatively stays on device through
the CC/hole-fill program).
"""

from __future__ import annotations

import contextlib
import os
import warnings
from typing import Optional, Union

import numpy as np

import jax.numpy as jnp

from lungmask_tpu.io.image import MedicalImage, reorient
from lungmask_tpu.logger import logger
from lungmask_tpu.models.registry import MODEL_URLS, get_model
from lungmask_tpu.ops import resample
from lungmask_tpu.runtime import (
    enable_compile_cache,
    prefault_host_heap,
    tune_host_allocator,
)
from lungmask_tpu.runtime.engine import UNetRunner
from lungmask_tpu.transforms import host_pipeline, postprocess, preprocess
from lungmask_tpu.utils.profiling import StageTimer, trace

ImageLike = Union[MedicalImage, np.ndarray]


class LMInferer:
    def __init__(
        self,
        modelname: str = "R231",
        modelpath: Optional[str] = None,
        fillmodel: Optional[str] = None,
        fillmodel_path: Optional[str] = None,
        force_cpu: bool = False,
        batch_size: Optional[int] = None,
        volume_postprocessing: bool = True,
        tqdm_disable: bool = False,
        preprocessing: Optional[str] = None,
        precision: str = "bfloat16",
        mesh=None,
        postprocessing_mode: str = "exact",
    ):
        """Lung-mask inference.

        Args:
            modelname: model to apply ('R231', 'LTRCLobes', 'R231CovidWeb').
            modelpath: path to weights (.pth or converted .npz); overrides
                ``modelname`` — including the class count, which always comes
                from the weights (reference mask.py:56,104-107).
            fillmodel / fillmodel_path: optional second model for the fused
                FN-fill/FP-removal mode.
            force_cpu: run on the host CPU backend instead of the accelerator.
            batch_size: slices per device batch — the activation-memory knob,
                honored exactly when set (the reference's default is 20,
                mask.py:79). None (default) picks the TPU-tuned chunk
                (runtime.engine.DEFAULT_CHUNK = 32, +16% MXU throughput over
                20 at 256² on v5e).
            volume_postprocessing: connected-component cleanup toggle.
            tqdm_disable: disable progress output.
            preprocessing: None (default) resolves to 'sharded' when a mesh
                is given, else 'hybrid'. 'hybrid' — device bodymask/boxes from
                a packed-bits upload, float64 host-oracle resample, minimal
                transfers; bit-exact with 'host'. 'device' — fully
                device-resident volume, float32 gather weights. 'host' —
                float64 scipy path, bit-exact with the reference's CPU
                preprocessing (see ops/resample.py and
                transforms/preprocess.py notes). 'sharded' — mesh-parallel
                device preprocessing (requires mesh=). An explicit value is
                honored as-is; a mesh never silently overrides it.
            precision: 'bfloat16' (default — MXU-native compute with float32
                accumulation) or 'float32' (HIGHEST precision convs, for
                strict numerical parity with the reference's float32 torch).
            mesh: optional ``jax.sharding.Mesh`` (see ``parallel.make_mesh``);
                when given, the U-Net forward shards slices over the mesh's
                'data' axis (and slice height over 'space') instead of running
                single-device.
            postprocessing_mode: 'exact' (host C++ core, bit-faithful to the
                reference incl. neighbor merging) or 'device' (fully on-TPU
                largest-CC + hole fill; skips the sequential neighbor merge —
                see transforms/postprocess_device.py).
        """
        assert (
            modelname in MODEL_URLS
        ), "Modelname not found. Please choose from: {}".format(MODEL_URLS.keys())
        if fillmodel is not None:
            assert (
                fillmodel in MODEL_URLS
            ), "Modelname not found. Please choose from: {}".format(MODEL_URLS.keys())
        assert preprocessing in (None, "hybrid", "device", "host", "sharded")
        if preprocessing is None:
            # Default resolution only — an EXPLICIT choice is always honored
            # (e.g. preprocessing='hybrid' with a mesh keeps the documented
            # bit-exact-with-host resample; only the U-Net shards then).
            preprocessing = "sharded" if mesh is not None else "hybrid"
        if preprocessing == "sharded" and mesh is None:
            raise ValueError("preprocessing='sharded' requires mesh=")
        assert postprocessing_mode in ("exact", "device")
        self.postprocessing_mode = postprocessing_mode
        self._sharded_post = {}  # n_classes -> compiled mesh-sharded program
        enable_compile_cache()
        tune_host_allocator()
        # Pre-touch the heap once so mask-sized host buffers (paste canvas,
        # unpack output, postprocess scratch) never first-fault inside a
        # timed stage — on lazily-backed VMs that fault costs seconds per
        # volume (see runtime.prefault_host_heap).
        prefault_host_heap()

        if modelpath is not None:
            modelname = os.path.basename(modelpath)
        if fillmodel_path is not None:
            fillmodel = os.path.basename(fillmodel_path)

        self.modelname = modelname
        self.fillmodel = fillmodel
        self.force_cpu = force_cpu
        self.batch_size = batch_size
        self.volume_postprocessing = volume_postprocessing
        self.tqdm_disable = tqdm_disable
        self.preprocessing = preprocessing
        self.mesh = mesh
        self.timings = StageTimer()

        self._device = None
        if force_cpu:
            import jax

            try:
                self._device = jax.devices("cpu")[0]
                logger.info("force_cpu set, running on the host CPU backend")
            except RuntimeError as e:
                # Some plugin platforms expose no CPU backend; degrade
                # gracefully rather than failing the run.
                logger.warning(
                    f"force_cpu requested but no CPU backend is available ({e}); "
                    "continuing on the default backend"
                )

        assert precision in ("bfloat16", "float32")
        compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
        self._compute_dtype = compute_dtype

        if mesh is not None:
            from lungmask_tpu.parallel import ShardedUNetRunner

            def make_runner(params, n_classes):
                return ShardedUNetRunner(
                    params,
                    n_classes,
                    mesh=mesh,
                    batch_size=batch_size,
                    compute_dtype=compute_dtype,
                )

        else:

            def make_runner(params, n_classes):
                return UNetRunner(
                    params,
                    n_classes,
                    batch_size=batch_size,
                    compute_dtype=compute_dtype,
                )

        with self._device_scope():
            params, n_classes = get_model(
                self.modelname if modelpath is None else modelname, modelpath
            )
            self.model = make_runner(params, n_classes)

            self.fillmodelm = None
            if self.fillmodel is not None:
                fparams, fn_classes = get_model(self.fillmodel, fillmodel_path)
                self.fillmodelm = make_runner(fparams, fn_classes)

    # ------------------------------------------------------------------

    def _preprocess(self, volume: np.ndarray):
        """→ (normalized device slices (N_pad,256,256), boxes (N,4))."""
        if self.preprocessing == "host":
            slices, boxes = host_pipeline.preprocess(volume, resolution=(256, 256))
            normalized = host_pipeline.normalize_hu(slices).astype(np.float32)
            return jnp.asarray(normalized), np.asarray(boxes)
        if self.preprocessing == "sharded":
            return preprocess.preprocess_sharded(
                volume, self.mesh, resolution=(256, 256)
            )
        if self.preprocessing == "hybrid":
            return preprocess.preprocess_hybrid(
                volume, resolution=(256, 256), compute_dtype=self._compute_dtype
            )
        return preprocess.preprocess(volume, resolution=(256, 256))

    def _to_lps(self, image: ImageLike):
        """Input normalization (reference mask.py:153-164): numpy passthrough,
        geometry-carrying images reoriented to LPS."""
        numpy_mode = isinstance(image, np.ndarray)
        if numpy_mode:
            return self._hu_capable(image.copy()), None, None
        curr_orient = image.orientation()
        if curr_orient != "LPS":
            image = reorient(image, "LPS")
        return self._hu_capable(image.array), curr_orient, image

    @staticmethod
    def _hu_capable(arr: np.ndarray) -> np.ndarray:
        """Voxels must be able to hold the HU window bounds: clipping to
        [−1024, 600] on an unsigned (or sub-int16) array overflows under
        numpy≥2. Unsigned and narrow inputs (e.g. uint8 stacks through the
        numpy API) are promoted to the smallest signed type that covers both
        their range and the window; int16/int32/float inputs pass untouched,
        so real CT volumes pay nothing."""
        kind, size = arr.dtype.kind, arr.dtype.itemsize
        if kind == "u":
            return arr.astype({1: np.int16, 2: np.int32}.get(size, np.int64))
        if kind in "ib" and size < 2:
            return arr.astype(np.int16)
        return arr

    def _from_lps(self, outmask, curr_orient, lps_image) -> np.ndarray:
        """Reorient a result back to the input orientation (mask.py:204-208)."""
        if curr_orient is None or curr_orient == "LPS":
            return outmask.astype(np.uint8)
        out_img = MedicalImage(
            outmask,
            spacing=lps_image.spacing,
            origin=lps_image.origin,
            direction=lps_image.direction,
        )
        return reorient(out_img, curr_orient).array.astype(np.uint8)

    def _forward_model(self, model: UNetRunner, normalized, n: int):
        """U-Net forward over the preprocessed stack. In device-postprocessing
        mode the prediction STAYS device-resident (postprocess_device /
        the sharded program consume it in place); otherwise it is fetched with
        downloads overlapped (run_numpy)."""
        if self.volume_postprocessing and self.postprocessing_mode == "device":
            return model.run(normalized)[:n]
        if hasattr(model, "run_numpy"):
            return model.run_numpy(normalized)[:n]
        return np.asarray(model.run(normalized)[:n])

    def _infer_volume(self, inimg_raw: np.ndarray, model: UNetRunner) -> np.ndarray:
        """LPS-space volume → mask (preprocess → U-Net → postprocess → paste)."""
        n = inimg_raw.shape[0]
        with trace("inference"), self._stage_bar() as bar:
            with self.timings.stage("preprocess"):
                normalized, boxes = self._preprocess(inimg_raw)
            bar.update(1)
            with self.timings.stage("unet"):
                pred = self._forward_model(model, normalized, n)
            bar.update(1)
            return self._finish_volume(
                pred, boxes, inimg_raw.shape[1:], model.n_classes, bar=bar
            )

    def _stage_bar(self):
        """Per-volume progress over the pipeline stages
        (preprocess → U-Net → postprocess → paste-back). The device engine
        runs each volume as one dispatch, so stage granularity — not the
        reference's per-20-slice batches — is the honest unit of progress."""
        from tqdm import tqdm

        return tqdm(
            total=4,
            disable=self.tqdm_disable,
            desc="inference",
            unit="stage",
            leave=False,
        )

    def _finish_volume(
        self, pred_np, boxes, slice_shape, n_classes, bar=None
    ) -> np.ndarray:
        """Host finishing stages: postprocess (per mode) + paste-back."""
        if self.volume_postprocessing and self.postprocessing_mode == "device":
            with self.timings.stage("postprocess"):
                outmask = self._device_postprocess(pred_np, n_classes)
        elif self.volume_postprocessing:
            with self.timings.stage("postprocess"):
                outmask = postprocess.postprocessing(
                    pred_np, disable_tqdm=self.tqdm_disable
                )
        else:
            outmask = pred_np
        if bar is not None:
            bar.update(1)
        with self.timings.stage("paste_back"):
            out = resample.paste_masks_host(outmask, boxes, slice_shape).astype(
                np.uint8
            )
        if bar is not None:
            bar.update(1)
        return out

    def _device_postprocess(self, pred, n_classes: int) -> np.ndarray:
        """Device-mode postprocessing; with a mesh the volume STAYS sharded
        (slices over 'data', height over 'space') through the CC/hole-fill
        program (parallel.make_sharded_postprocess) instead of gathering to
        one device. Zero-slice padding to the data-axis multiple is
        semantics-free: appended background extends the volume border, so
        component structure and border-reachability (hole filling) of the
        original slices are unchanged."""
        from lungmask_tpu.transforms.postprocess_device import (
            postprocess_device,
            postprocess_device_packed2,
        )

        if self.mesh is None:
            pred = jnp.asarray(pred)
            if n_classes <= 4 and pred.shape[2] % 4 == 0:
                # Crumb-packed download (2 bits/pixel): the cleaned mask costs
                # a quarter of the dense transfer — on tunnel-attached TPUs
                # the download otherwise dominates this mode.
                from lungmask_tpu.runtime.engine import unpack_crumbs

                packed = np.asarray(postprocess_device_packed2(pred, n_classes))
                return unpack_crumbs(packed)
            return np.asarray(postprocess_device(pred, n_classes))
        from lungmask_tpu.parallel import make_sharded_postprocess

        step = self._sharded_post.get(n_classes)
        if step is None:
            step = make_sharded_postprocess(self.mesh, n_classes)
            self._sharded_post[n_classes] = step
        pred = jnp.asarray(pred)
        n = pred.shape[0]
        pad = -n % int(self.mesh.shape["data"])
        if pad:
            pred = jnp.concatenate(
                [pred, jnp.zeros((pad,) + pred.shape[1:], pred.dtype)]
            )
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        # The sliced U-Net output arrives committed with whatever sharding the
        # slice left it in; reshard explicitly onto the program's layout.
        pred = jax.device_put(
            pred, NamedSharding(self.mesh, P("data", "space", None))
        )
        return np.asarray(step(pred))[:n]

    def _dual_forward(self, n, normalized):
        """Both models over the shared preprocessed stack — ONE device
        dispatch when both runners are plain single-device UNetRunners
        (runtime.engine.volume_argmax_pair), two otherwise. Masks come back
        bit-packed per model (engine.pack_bits_for) — the dense dual download
        dominates this stage's wall clock on tunnel-attached TPUs."""
        from lungmask_tpu.runtime.engine import (
            pack_bits_for,
            unpack_bits_np,
            volume_argmax_pair_packed,
        )

        a, b = self.model, self.fillmodelm
        same_cfg = (
            type(a) is UNetRunner
            and type(b) is UNetRunner
            and a.batch_size == b.batch_size
            and a.compute_dtype == b.compute_dtype
        )
        with self.timings.stage("unet"):
            if same_cfg:
                slices, _, _ = a._pad(jnp.asarray(normalized))
                width = slices.shape[2]
                bits_a = pack_bits_for(a.n_classes, width)
                bits_b = pack_bits_for(b.n_classes, width)
                pa, pb = volume_argmax_pair_packed(
                    a.params, b.params, slices, a.batch_size, a.compute_dtype,
                    bits_a, bits_b,
                )
                return (
                    unpack_bits_np(np.asarray(pa), bits_a)[:n],
                    unpack_bits_np(np.asarray(pb), bits_b)[:n],
                )
            pa = (
                a.run_numpy(normalized)[:n]
                if hasattr(a, "run_numpy")
                else np.asarray(a.run(normalized)[:n])
            )
            pb = (
                b.run_numpy(normalized)[:n]
                if hasattr(b, "run_numpy")
                else np.asarray(b.run(normalized)[:n])
            )
            return pa, pb

    def _inference(self, image: ImageLike, model: UNetRunner) -> np.ndarray:
        """Single-model inference — reference mask.py:141-210 semantics."""
        inimg_raw, curr_orient, lps_image = self._to_lps(image)
        outmask = self._infer_volume(inimg_raw, model)
        return self._from_lps(outmask, curr_orient, lps_image)

    # -- split-phase API (cohort pipelining) ----------------------------------

    def preprocess_image(self, image: ImageLike) -> dict:
        """Phase 1 of :meth:`apply`: orientation normalization + device
        preprocessing (incl. the volume upload). Thread-safe with respect to a
        concurrent :meth:`apply_preprocessed` on another volume — the cohort
        runtime calls this from its loader thread so volume i+1's upload and
        bodymask overlap volume i's U-Net/postprocessing."""
        with self._device_scope():
            inimg_raw, curr_orient, lps_image = self._to_lps(image)
            with self.timings.stage("preprocess"):
                normalized, boxes = self._preprocess(inimg_raw)
        return {
            "inimg_raw": inimg_raw,
            "curr_orient": curr_orient,
            "lps_image": lps_image,
            "normalized": normalized,
            "boxes": boxes,
        }

    def forward_preprocessed(self, pre: dict):
        """Phase 2a: U-Net forward(s) only — the device-bound half of
        :meth:`apply_preprocessed`. The returned prediction(s) feed
        :meth:`finish_forward`; splitting lets the cohort runtime run the
        host-bound finishing of volume i in a finisher thread while volume
        i+1's forward dispatches (runtime/cohort.py)."""
        with self._device_scope():
            n = pre["inimg_raw"].shape[0]
            if self.fillmodel is None:
                with self.timings.stage("unet"):
                    return self._forward_model(self.model, pre["normalized"], n)
            return self._dual_forward(n, pre["normalized"])

    def finish_forward(self, pre: dict, pred) -> np.ndarray:
        """Phase 2b: postprocess + paste-back + reorientation (host-bound,
        except device-mode postprocessing) on a :meth:`forward_preprocessed`
        result."""
        with self._device_scope():
            inimg_raw = pre["inimg_raw"]
            if self.fillmodel is None:
                outmask = self._finish_volume(
                    pred, pre["boxes"], inimg_raw.shape[1:], self.model.n_classes
                )
                return self._from_lps(outmask, pre["curr_orient"], pre["lps_image"])
            def finish_one(name, pred_np, runner):
                logger.info(f"Apply: {name}")
                # jax.default_device scoping is thread-local: re-enter it so a
                # forced-CPU run stays forced if a pass dispatches device work
                # (e.g. LUNGMASK_TPU_FUSED_THREADS=1 with device postprocessing).
                with self._device_scope():
                    return self._from_lps(
                        self._finish_volume(
                            pred_np,
                            pre["boxes"],
                            inimg_raw.shape[1:],
                            runner.n_classes,
                        ),
                        pre["curr_orient"],
                        pre["lps_image"],
                    )

            jobs = list(
                zip((self.modelname, self.fillmodel), pred, (self.model, self.fillmodelm))
            )
            if self._fused_finish_threads():
                # The two per-model passes are independent and the native
                # postprocessing core runs GIL-free (ctypes call, thread_local
                # scratch — concurrency regression-tested in
                # tests/test_native.py), so on multi-core hosts they overlap;
                # results are deterministic either way.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as ex:
                    res_l, res_r = list(ex.map(lambda j: finish_one(*j), jobs))
            else:
                res_l, res_r = [finish_one(*j) for j in jobs]
            logger.info("Fusing results... this may take up to several minutes!")
            with self.timings.stage("fusion_postprocess"):
                # One native call folds the FN-fill/FP-removal passes into
                # the postprocessing core (csrc lm_fused_finish) — the numpy
                # formulation below costs several full-volume passes on the
                # host. Reference semantics (mask.py:228-232; the fusion
                # postprocessing is unconditional — no volume_postprocessing
                # guard, matching the reference).
                from lungmask_tpu.ops import native

                fused = native.fused_finish(res_l, res_r)
                if fused is not None:
                    return fused
                spare_value = res_l.max() + 1
                res_l[np.logical_and(res_l == 0, res_r > 0)] = spare_value
                res_l[res_r == 0] = 0
                return postprocess.postprocessing(
                    res_l, spare=[spare_value], disable_tqdm=self.tqdm_disable
                )

    def apply_preprocessed(self, pre: dict) -> np.ndarray:
        """Phase 2 of :meth:`apply` on a :meth:`preprocess_image` result."""
        return self.finish_forward(pre, self.forward_preprocessed(pre))

    def apply(self, image: ImageLike) -> np.ndarray:
        """Apply the model (or fused model pair) to a volumetric image.

        Returns the uint8 label volume in the input's own geometry/axis order.

        The fused path shares one preprocessing pass between base and fill
        models (the reference preprocesses the volume twice,
        mask.py:225-227), then applies the reference's fusion rule: voxels the
        base model misses but the fill model finds get a spare label
        (FN-fill), voxels the fill model rejects are cleared (FP-removal),
        and spare-aware postprocessing maps spare regions to neighboring true
        labels (mask.py:228-232).
        """
        with self._device_scope():
            return self._apply_impl(image)

    def _apply_impl(self, image: ImageLike) -> np.ndarray:
        if self.fillmodel is None:
            return self._inference(image, self.model)
        return self.apply_preprocessed(self.preprocess_image(image))

    def _fused_finish_threads(self) -> bool:
        """Whether the fused path's two per-model finishing passes (host
        postprocess + paste + reorient each) run on two threads. Default: only
        when the host has more than one core AND postprocessing runs on the
        host (device-mode dispatches stay single-threaded — overlapping device
        programs just serializes on the accelerator). Override with
        LUNGMASK_TPU_FUSED_THREADS=0/1."""
        flag = os.environ.get("LUNGMASK_TPU_FUSED_THREADS")
        if flag is not None:
            return flag != "0"
        return (
            (os.cpu_count() or 1) > 1
            and not (self.volume_postprocessing and self.postprocessing_mode == "device")
        )

    def _device_scope(self):
        """Pin work to the forced device for the duration of a call (scoped —
        never leaks a global default-device change)."""
        if self._device is None:
            return contextlib.nullcontext()
        import jax

        return jax.default_device(self._device)


def apply(
    image: ImageLike,
    model: Optional[UNetRunner] = None,
    force_cpu: bool = False,
    batch_size: int = 20,
    volume_postprocessing: bool = True,
    tqdm_disable: bool = False,
) -> np.ndarray:
    """Deprecated functional API (reference mask.py:235-255)."""
    warnings.warn(
        "The function `apply` will be removed in a future version. Please use the LMInferer class!",
        DeprecationWarning,
    )
    inferer = LMInferer(
        force_cpu=force_cpu,
        batch_size=batch_size,
        volume_postprocessing=volume_postprocessing,
        tqdm_disable=tqdm_disable,
    )
    if model is not None:
        inferer.model = model
    return inferer.apply(image)


def apply_fused(
    image: ImageLike,
    basemodel: str = "LTRCLobes",
    fillmodel: str = "R231",
    force_cpu: bool = False,
    batch_size: int = 20,
    volume_postprocessing: bool = True,
    tqdm_disable: bool = False,
) -> np.ndarray:
    """Deprecated functional API (reference mask.py:258-279)."""
    warnings.warn(
        "The function `apply_fused` will be removed in a future version. Please use the LMInferer class!",
        DeprecationWarning,
    )
    inferer = LMInferer(
        modelname=basemodel,
        force_cpu=force_cpu,
        fillmodel=fillmodel,
        batch_size=batch_size,
        volume_postprocessing=volume_postprocessing,
        tqdm_disable=tqdm_disable,
    )
    return inferer.apply(image)
