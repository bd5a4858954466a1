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
postprocessing runs as the windowed host algorithm (transforms.postprocess),
and the mask paste-back is one batched device gather per volume.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional, Tuple, Union

import numpy as np

import jax.numpy as jnp

from lungmask_tpu.io.image import MedicalImage, reorient
from lungmask_tpu.logger import logger
from lungmask_tpu.models.registry import MODEL_URLS, get_model
from lungmask_tpu.ops import resample
from lungmask_tpu.runtime.engine import UNetRunner
from lungmask_tpu.transforms import host_pipeline, postprocess, preprocess

ImageLike = Union[MedicalImage, np.ndarray]


class LMInferer:
    def __init__(
        self,
        modelname: str = "R231",
        modelpath: Optional[str] = None,
        fillmodel: Optional[str] = None,
        fillmodel_path: Optional[str] = None,
        force_cpu: bool = False,
        batch_size: int = 20,
        volume_postprocessing: bool = True,
        tqdm_disable: bool = False,
        preprocessing: str = "device",
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
            batch_size: slices per device batch. Defaults to 20 (reference
                mask.py:79); larger values feed the MXU better on TPU.
            volume_postprocessing: connected-component cleanup toggle.
            tqdm_disable: disable progress output.
            preprocessing: 'device' (default, batched TPU pipeline) or 'host'
                (float64 scipy path, bit-exact with the reference's CPU
                preprocessing — see ops/resample.py notes).
        """
        assert (
            modelname in MODEL_URLS
        ), "Modelname not found. Please choose from: {}".format(MODEL_URLS.keys())
        if fillmodel is not None:
            assert (
                fillmodel in MODEL_URLS
            ), "Modelname not found. Please choose from: {}".format(MODEL_URLS.keys())
        assert preprocessing in ("device", "host")

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

        self._device_ctx = None
        if force_cpu:
            import jax

            cpu = jax.devices("cpu")[0]
            self._device_ctx = jax.default_device(cpu)
            self._device_ctx.__enter__()
            logger.info("force_cpu set, running on the host CPU backend")

        params, n_classes = get_model(
            self.modelname if modelpath is None else modelname, modelpath
        )
        self.model = UNetRunner(params, n_classes, batch_size=batch_size)

        self.fillmodelm = None
        if self.fillmodel is not None:
            fparams, fn_classes = get_model(self.fillmodel, fillmodel_path)
            self.fillmodelm = UNetRunner(fparams, fn_classes, batch_size=batch_size)

    # ------------------------------------------------------------------

    def _preprocess(self, volume: np.ndarray):
        """→ (normalized device slices (N_pad,256,256), boxes (N,4))."""
        if self.preprocessing == "host":
            slices, boxes = host_pipeline.preprocess(volume, resolution=(256, 256))
            normalized = host_pipeline.normalize_hu(slices).astype(np.float32)
            return jnp.asarray(normalized), np.asarray(boxes)
        return preprocess.preprocess(volume, resolution=(256, 256))

    def _inference(self, image: ImageLike, model: UNetRunner) -> np.ndarray:
        """Single-model inference — reference mask.py:141-210 semantics."""
        numpy_mode = isinstance(image, np.ndarray)
        if numpy_mode:
            inimg_raw = image.copy()
            curr_orient = None
        else:
            curr_orient = image.orientation()
            if curr_orient != "LPS":
                image = reorient(image, "LPS")
            inimg_raw = image.array

        n = inimg_raw.shape[0]
        normalized, boxes = self._preprocess(inimg_raw)
        pred = model.run(normalized)[:n]  # device uint8 (N, 256, 256)

        if self.volume_postprocessing:
            outmask = postprocess.postprocessing(
                np.asarray(pred), disable_tqdm=self.tqdm_disable
            )
        else:
            outmask = np.asarray(pred)

        # Batched device paste-back to original slice geometry.
        plan = resample.paste_plan(boxes, (256, 256), inimg_raw.shape[1:])
        outmask = np.asarray(
            resample.apply_paste(jnp.asarray(outmask), plan)
        ).astype(np.uint8)

        if not numpy_mode and curr_orient != "LPS":
            out_img = MedicalImage(
                outmask,
                spacing=image.spacing,
                origin=image.origin,
                direction=image.direction,
            )
            outmask = reorient(out_img, curr_orient).array

        return outmask.astype(np.uint8)

    def apply(self, image: ImageLike) -> np.ndarray:
        """Apply the model (or fused model pair) to a volumetric image.

        Returns the uint8 label volume in the input's own geometry/axis order.
        """
        if self.fillmodel is None:
            return self._inference(image, self.model)

        logger.info(f"Apply: {self.modelname}")
        res_l = self._inference(image, self.model)
        logger.info(f"Apply: {self.fillmodel}")
        res_r = self._inference(image, self.fillmodelm)
        spare_value = res_l.max() + 1
        res_l[np.logical_and(res_l == 0, res_r > 0)] = spare_value
        res_l[res_r == 0] = 0
        logger.info("Fusing results... this may take up to several minutes!")
        return postprocess.postprocessing(res_l, spare=[spare_value])

    def __del__(self):
        ctx = getattr(self, "_device_ctx", None)
        if ctx is not None:
            try:
                ctx.__exit__(None, None, None)
            except Exception:
                pass


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
