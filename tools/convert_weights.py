#!/usr/bin/env python
"""Offline weight converter CLI: reference ``.pth`` checkpoints → ``.npz``.

    python tools/convert_weights.py unet_r231-d5d2fc3d.pth [out.npz]

Requires torch (unpickling only). The resulting .npz (folded BatchNorm, HWIO
kernels) is what the runtime loads; drop it in $LUNGMASK_TPU_CACHE (default
~/.cache/lungmask_tpu) named after the release file to have the registry pick
it up without any network access.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from lungmask_tpu.models import convert  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    src = sys.argv[1]
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.splitext(os.path.basename(src))[0] + ".npz"
    )
    params, n_classes = convert.convert_pth(src)
    convert.save_npz(dst, params, meta={"source": os.path.basename(src)})
    print(f"{src} -> {dst} (n_classes={n_classes})")


if __name__ == "__main__":
    main()
