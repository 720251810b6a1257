#!/usr/bin/env python
"""Sharded consensus convolutional dictionary learning demo
(equivalent of the reference's examples/scripts/cdl/
cbpdndl_parcns_gry.py): learn a dictionary from an image batch with the
signal axis sharded across all available devices.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.parallel import consensus
from sporco_tpu.parallel.mesh import make_mesh
from sporco_tpu.utils import util, signal


def main():
    ei = util.ExampleImages(scaled=True, gray=True)
    rng = np.random.default_rng(0)
    # training batch: random crops
    base = ei.image(ei.images()[0])
    K = 16
    S = np.stack([base[i % 4 * 32:(i % 4) * 32 + 128,
                       i // 4 % 4 * 32:(i // 4 % 4) * 32 + 128]
                  for i in range(K)], axis=-1)
    sh = np.stack([np.asarray(signal.tikhonov_filter(
        jnp.asarray(S[..., k], jnp.float32), 5.0)[1])
        for k in range(K)], axis=-1)

    D0 = rng.standard_normal((8, 8, 32)).astype(np.float32)

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    print(f"devices: {n_dev}  (mesh: {'yes' if mesh else 'single'})")

    d = consensus.ConvBPDNDictLearn_Consensus(
        D0, sh, lmbda=0.1, max_iter=50, mesh=mesh)
    D = d.solve()
    obj, dfd, reg = d.evaluate()
    print(f"solve {d.timer.elapsed('solve'):.2f}s  "
          f"objective {obj:.2f} (dfd {dfd:.2f}, l1 {reg:.2f})")
    print("learned dictionary:", D.shape)


if __name__ == "__main__":
    main()
