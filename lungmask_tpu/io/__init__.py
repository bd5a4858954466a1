from lungmask_tpu.io.image import MedicalImage, orientation_code, reorient
from lungmask_tpu.io.loader import (
    DICOM_METADATA_TO_KEEP,
    get_DICOM_tags_to_keep,
    load_input_image,
    read_dicoms,
    write_image,
)

__all__ = [
    "MedicalImage",
    "orientation_code",
    "reorient",
    "DICOM_METADATA_TO_KEEP",
    "get_DICOM_tags_to_keep",
    "load_input_image",
    "read_dicoms",
    "write_image",
]
