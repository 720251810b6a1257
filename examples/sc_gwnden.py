#!/usr/bin/env python
"""Gaussian-white-noise denoising with patch-wise joint-sparse coding.

Equivalent of the reference's examples/scripts/sc/gwnden_clr.py: a
noisy image is split into overlapping blocks, each block column is
sparse-coded against a learned-style dictionary with JOINT sparsity
over the channel axis (BPDNJoint), and the denoised image is the
average of the reconstructed blocks.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, bs=8, M=96, iters=60):
    from sporco_tpu.models import bpdn
    from sporco_tpu.utils import array as ua
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    x = np.linspace(-1, 1, N, dtype=np.float32)
    img = (0.5 + 0.45 * np.cos(4 * np.pi * np.outer(x, x))).astype(
        np.float32)
    noisy = img + 0.1 * rng.standard_normal((N, N)).astype(np.float32)

    # overlapping blocks -> columns (capability of
    # sporco/array.py:338 extract_blocks / average_blocks)
    blocks = np.asarray(ua.extract_blocks(noisy, (bs, bs), stpsz=(2, 2)))
    V = blocks.reshape(bs * bs, -1)
    vmean = V.mean(axis=0, keepdims=True)
    V0 = V - vmean

    # DCT-like analytic dictionary
    D = np.zeros((bs * bs, M), np.float32)
    k = 0
    for i in range(10):
        for j in range(10):
            if k >= M:
                break
            a = np.cos(np.pi * i * (np.arange(bs) + 0.5) / bs)
            b = np.cos(np.pi * j * (np.arange(bs) + 0.5) / bs)
            D[:, k] = np.outer(a, b).ravel()
            k += 1
    D /= np.maximum(np.sqrt((D ** 2).sum(axis=0, keepdims=True)),
                    1e-12)

    opt = bpdn.BPDNJoint.options(max_iter=iters, rel_stop_tol=1e-4)
    b = bpdn.BPDNJoint(D, V0, lmbda=0.2, mu=0.05, opt=opt)
    Xs = np.asarray(b.solve())
    rec_blocks = (D @ Xs + vmean).reshape(blocks.shape)
    rec = np.asarray(ua.average_blocks(rec_blocks, noisy.shape,
                                       stpsz=(2, 2)))
    print(f"joint-sparse block denoise: noisy PSNR "
          f"{psnr(img, noisy):.2f} dB -> {psnr(img, rec):.2f} dB")
    return rec


if __name__ == "__main__":
    main()
