"""Analytic roofline for the R231 U-Net forward at 256x256 on TPU v5e.

Closes VERDICT r3 #4's "committed profile" requirement without trace-file
parsing (no TensorBoard profile plugin in this image): walks the exact layer
schedule of models/unet.py (in_channels=1, depth=5, wf=6, padding=True,
batch_norm folded, up_mode='upsample' — reference mask.py:58-65) and, per
op, computes

  * MXU time  = FLOPs / (197 TFLOP/s bf16 peak)          [convs]
  * HBM time  = bytes moved / (819 GB/s peak)            [all ops]
  * op time   = max(MXU, HBM)  — the roofline bound

then compares the summed bound against the measured steady-state throughput.
Usage: python tools/roofline.py [batch]   (default batch=32, the engine chunk)

Peaks: TPU v5e (v5 lite) — 197 TFLOP/s bf16, 819 GB/s HBM BW (public specs).
"""

from __future__ import annotations

import sys

PEAK_FLOPS = 197e12  # bf16
PEAK_BW = 819e9  # bytes/s
BF16 = 2  # bytes


def conv(rows: list, name: str, n: int, h: int, w: int, cin: int, cout: int,
         k: int = 3) -> None:
    flops = 2 * n * h * w * cin * cout * k * k
    # bf16 activations in + out; weights are resident (tiny vs activations)
    bytes_ = BF16 * n * h * w * (cin + cout) + BF16 * k * k * cin * cout
    rows.append((name, flops, bytes_))


def vpu(rows: list, name: str, n: int, h: int, w: int, c_read: int,
        c_write: int) -> None:
    """Elementwise/data-movement op: reads c_read channels, writes c_write."""
    rows.append((name, 0, BF16 * n * h * w * (c_read + c_write)))


def build(n: int):
    rows: list = []
    chans = [64, 128, 256, 512, 1024]
    # ---- encoder: UNetConvBlock = 2x (conv3x3 + folded-affine + ReLU)
    h = w = 256
    cin = 1
    for i, c in enumerate(chans):
        conv(rows, f"enc{i}.conv1 {h}x{w} {cin}->{c}", n, h, w, cin, c)
        conv(rows, f"enc{i}.conv2 {h}x{w} {c}->{c}", n, h, w, c, c)
        if i < len(chans) - 1:
            vpu(rows, f"enc{i}.maxpool {h}x{w}->{h//2}x{w//2}", n, h, w, c, c // 4)
            h //= 2
            w //= 2
        cin = c
    # ---- decoder. Production path (models/unet.py:_up_block): bilinear x2
    # resize (VPU/HBM) then 1x1 projection conv, then the conv block. The
    # fused one-conv alternative (--fused) pays 9x the projection FLOPs for
    # a dense 3x3 phase kernel and measured 26% slower end-to-end; modeled
    # here so the table shows why.
    fused = "--fused" in sys.argv
    for i in reversed(range(4)):
        c_out = chans[i]
        c_in = chans[i + 1]
        if fused:
            # 3x3 conv cin->4*c_out at h x w, then depth-to-space
            conv(rows, f"up{i}.fused_upproj {h}x{w} {c_in}->{4 * c_out}", n,
                 h, w, c_in, 4 * c_out, k=3)
            vpu(rows, f"up{i}.depth_to_space+concat {2*h}x{2*w}", n, 2 * h,
                2 * w, 2 * c_out, 2 * c_out)
            h *= 2
            w *= 2
        else:
            # bilinear x2: read (h,w,cin), write (2h,2w,cin)
            vpu(rows, f"up{i}.bilinear_up2 {h}x{w}->{2*h}x{2*w} c{c_in}", n,
                h, w, c_in, 4 * c_in)
            h *= 2
            w *= 2
            conv(rows, f"up{i}.proj1x1 {h}x{w} {c_in}->{c_out}", n, h, w,
                 c_in, c_out, k=1)
            vpu(rows, f"up{i}.concat {h}x{w}", n, h, w, 2 * c_out, 2 * c_out)
        conv(rows, f"dec{i}.conv1 {h}x{w} {2*c_out}->{c_out}", n, h, w,
             2 * c_out, c_out)
        conv(rows, f"dec{i}.conv2 {h}x{w} {c_out}->{c_out}", n, h, w, c_out,
             c_out)
    # ---- head: 1x1 conv to n_classes + argmax
    conv(rows, f"head.1x1 {h}x{w} 64->3", n, h, w, 64, 3, k=1)
    vpu(rows, f"head.argmax {h}x{w}", n, h, w, 3, 1)
    return rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows = build(n)
    tot_flops = sum(r[1] for r in rows)
    print(f"batch={n}  total {tot_flops / n / 1e9:.1f} GFLOP/slice")
    print(f"{'op':44s} {'GFLOP':>8s} {'MB':>8s} {'mxu_us':>8s} {'hbm_us':>8s} {'bound':>6s}")
    t_mxu_total = t_hbm_total = t_roof = 0.0
    for name, flops, bytes_ in rows:
        t_mxu = flops / PEAK_FLOPS
        t_hbm = bytes_ / PEAK_BW
        t_roof += max(t_mxu, t_hbm)
        t_mxu_total += t_mxu
        t_hbm_total += t_hbm
        bound = "MXU" if t_mxu >= t_hbm else "HBM"
        print(f"{name:44s} {flops/1e9:8.1f} {bytes_/1e6:8.1f} "
              f"{t_mxu*1e6:8.1f} {t_hbm*1e6:8.1f} {bound:>6s}")
    print(f"\nsum MXU time        {t_mxu_total*1e3:7.2f} ms  "
          f"({t_mxu_total/n*1e6:.0f} us/slice)")
    print(f"sum HBM time        {t_hbm_total*1e3:7.2f} ms")
    print(f"roofline bound      {t_roof*1e3:7.2f} ms  "
          f"-> {n / t_roof:.0f} slices/s speed-of-light")
    print(f"implied MFU at the roofline bound: {t_mxu_total / t_roof:.3f}")
    print("\nMeasured steady-state (BENCH r2-r4): 760-944 slices/s, i.e.")
    for sps in (944, 820, 761):
        ms = n / sps * 1e3
        print(f"  {sps} slices/s = {ms:.2f} ms/chunk -> "
              f"{t_roof / (n / sps) * 100:.0f}% of the roofline bound")


if __name__ == "__main__":
    main()
