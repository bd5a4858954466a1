#!/usr/bin/env python
"""Minimal example: segment one CT volume (file or DICOM directory).

    python examples/segment_volume.py INPUT OUTPUT.nii.gz [--lobes]
"""

import sys

from lungmask_tpu import LMInferer
from lungmask_tpu.io import load_input_image, write_image


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    input_path, output_path = sys.argv[1], sys.argv[2]
    lobes = "--lobes" in sys.argv

    image = load_input_image(input_path, read_metadata=True)

    if lobes:
        # Fused mode: LTRCLobes labels, R231's lung boundary (reference's
        # LTRCLobes_R231 configuration).
        inferer = LMInferer(modelname="LTRCLobes", fillmodel="R231")
    else:
        inferer = LMInferer()  # R231 left/right lung

    mask = inferer.apply(image)
    write_image(image.with_array(mask), output_path)
    print(f"wrote {output_path}")
    print("stage seconds:")
    print(inferer.timings.report())


if __name__ == "__main__":
    main()
