#!/usr/bin/env python
"""Standard (non-convolutional) dictionary learning on image patches.

BPDN sparse coding alternated with constrained-MOD dictionary updates
(equivalent of the reference's examples/scripts/dl/bpdndl.py).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models import dictlrn
from sporco_tpu.utils import util, array


def main():
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0], idxexp=np.s_[:256, :256])

    # extract 8x8 patches, remove the per-patch mean
    blocks = np.asarray(array.extract_blocks(img, (8, 8), stpsz=(4, 4)))
    S = blocks.reshape(64, -1).astype(np.float32)
    S -= S.mean(axis=0, keepdims=True)

    rng = np.random.default_rng(0)
    M = 64
    D0 = rng.standard_normal((S.shape[0], M)).astype(np.float32)

    import jax.numpy as jnp
    d = dictlrn.BPDNDictLearn(D0, S, lmbda=0.1, max_iter=50,
                              dtype=jnp.float32)
    d.solve()
    obj = d.getitstat()["XObjFun"]
    print(f"BPDN dictionary learning: {len(obj)} outer iters, "
          f"objective {obj[0]:.2f} -> {obj[-1]:.2f}")
    D = np.asarray(d.getdict())
    print(f"learned dictionary {D.shape}, atom norms "
          f"{np.sqrt((D ** 2).sum(axis=0)).round(3)[:4]} ...")


if __name__ == "__main__":
    main()
