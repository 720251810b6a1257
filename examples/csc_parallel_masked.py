#!/usr/bin/env python
"""Masked filter-parallel convolutional sparse coding.

ParConvBPDN with a fidelity mask: filter groups are a batched leading
axis (shardable over a device-mesh "filter" axis) and the mask enters
through the impulse-filter mechanism (equivalent of the reference's
examples/scripts/csc/parcbpdn_md_gry.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from sporco_tpu.models.parcbpdn import ParConvBPDN
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
from sporco_tpu.utils.signal import rndmask, tikhonov_filter


def main(N=64, frc=0.25, iters=60):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = np.asarray(ei.image(ei.images()[0], idxexp=np.s_[:N, :N]),
                     np.float32)
    mask = np.asarray(rndmask(jax.random.PRNGKey(0), img.shape, frc),
                      np.float32)
    corrupted = mask * img
    sl, sh = tikhonov_filter(corrupted, 5.0)
    sl, sh = np.asarray(sl), np.asarray(sh)

    D = util.convdicts()["G:8x8x32"].astype(np.float32)
    b = ParConvBPDN(D, sh, lmbda=0.05, W=mask, ngrp=4,
                    opt=ParConvBPDN.options(max_iter=iters))
    b.solve()
    Sr = np.asarray(b.reconstruct()).squeeze() + sl
    print(f"masked ParConvBPDN: PSNR corrupted "
          f"{psnr(img, corrupted):.2f} dB -> {psnr(img, Sr):.2f} dB")
    assert psnr(img, Sr) > psnr(img, corrupted)
    return Sr


if __name__ == "__main__":
    main(iters=150)
