"""lungmask_tpu: TPU-native CT lung segmentation (JAX/XLA/Pallas).

A from-scratch rebuild of the capability surface of JoHof/lungmask
(reference at /root/reference, v0.2.20) designed TPU-first: batched
device-side preprocessing, a pure-JAX U-Net on the MXU, windowed host
postprocessing, and mesh-sharded scale-out. Public surface mirrors the
reference: ``LMInferer`` (+ deprecated ``apply``/``apply_fused``) and the
``lungmask INPUT OUTPUT`` CLI.
"""

__version__ = "0.1.0"

from lungmask_tpu import metrics
from lungmask_tpu.inferer import LMInferer, apply, apply_fused
from lungmask_tpu.io.image import MedicalImage

__all__ = [
    "LMInferer",
    "MedicalImage",
    "apply",
    "apply_fused",
    "metrics",
    "__version__",
]
