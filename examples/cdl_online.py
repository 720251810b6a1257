#!/usr/bin/env python
"""Online convolutional dictionary learning.

Streams training images one at a time through
OnlineConvBPDNDictLearn (full CSC solve per sample, SGD dictionary
step with decaying rate, constraint projection) — equivalent of the
reference's examples/scripts/cdl/onlinecdl_gry.py.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import cbpdn, dictlrn
from sporco_tpu.utils import util, signal


def main():
    ei = util.ExampleImages(scaled=True, gray=True)
    names = ei.images()
    imgs = [ei.image(names[k % len(names)],
                     idxexp=np.s_[:128, :128]).astype(np.float32)
            for k in range(8)]
    # highpass components
    shs = [np.asarray(signal.tikhonov_filter(jnp.asarray(im), 5.0)[1])
           for im in imgs]

    rng = np.random.default_rng(0)
    D0 = rng.standard_normal((8, 8, 32)).astype(np.float32)

    copt = cbpdn.ConvBPDN.options(max_iter=50, rel_stop_tol=5e-3)
    d = dictlrn.OnlineConvBPDNDictLearn(D0, lmbda=0.1, eta_a=10.0,
                                        eta_b=5.0, cbpdn_opt=copt)
    for k, sh in enumerate(shs):
        d.solve(sh)
        print(f"sample {k} done (eta {10.0 / (d.j + 5.0):.3f})")
    D1 = np.asarray(d.getdict())
    print(f"learned dictionary {D1.shape}; filter norms "
          f"{np.sqrt((D1 ** 2).sum(axis=(0, 1))).round(3)[:4]} ...")


if __name__ == "__main__":
    main()
