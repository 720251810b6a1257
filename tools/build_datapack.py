"""Build the standalone example-data pack (``sporco_tpu/data/``).

The reference ships test images and pre-learned convolutional
dictionaries inside the package (``sporco/data/``, loaders
``sporco/util.py:356-430``).  This builder produces an equivalent pack
from freely redistributable sources available offline and from this
framework's OWN dictionary learning -- no files are copied from the
reference:

- ``portrait.png``: the classic public-domain Grace Hopper portrait
  (bundled with matplotlib), centre-cropped to 512x512 RGB.
- ``terrain.png``: real topography/bathymetry elevation data
  (matplotlib's ``topobathy.npz``), shaded and normalised to a 512x512
  grayscale image.
- ``fault_dem.png``: the Jacksboro fault digital elevation model
  (matplotlib's ``jacksboro_fault_dem.npz``), 512x512 grayscale.
- ``convdict.npz``: convolutional dictionaries (``G:8x8x64``,
  ``G:12x12x36``, ``G:8x8x32``, ``RGB:8x8x3x64``, and the multi-scale
  ``G:4x4x8,8x8x12,12x12x16``) trained on the grayscale images (and
  the RGB portrait) with this framework's own dictionary learning
  (consensus CDL; multi-scale via ``ConvBPDNDictLearn(dsz=...)``).

Run from the repo root: ``python tools/build_datapack.py`` (about a
minute on a TPU chip; runs on CPU too).  The outputs are committed, so
this only needs re-running to change the pack.
"""

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, "..", "sporco_tpu", "data")


def _center_crop(img, size):
    h, w = img.shape[:2]
    if h < size or w < size:
        from scipy.ndimage import zoom
        f = size / min(h, w)
        if img.ndim == 3:
            img = zoom(img, (f, f, 1), order=1)
        else:
            img = zoom(img, (f, f), order=1)
        h, w = img.shape[:2]
    r0, c0 = (h - size) // 2, (w - size) // 2
    return img[r0:r0 + size, c0:c0 + size]


def _to_u8(x):
    x = x - np.nanmin(x)
    x = x / max(np.nanmax(x), 1e-12)
    return (255 * x).astype(np.uint8)


def build_images():
    import imageio.v2 as imageio
    import matplotlib
    mpl_data = os.path.join(matplotlib.get_data_path(), "sample_data")
    os.makedirs(_OUT, exist_ok=True)

    hopper = imageio.imread(os.path.join(mpl_data, "grace_hopper.jpg"))
    imageio.imwrite(os.path.join(_OUT, "portrait.png"),
                    _center_crop(hopper, 512))

    topo = np.load(os.path.join(mpl_data, "topobathy.npz"))["topo"]
    topo = topo.astype(np.float64)
    # shaded relief: elevation + a touch of gradient for texture
    gy, gx = np.gradient(topo)
    shade = topo + 0.5 * np.hypot(gx, gy)
    imageio.imwrite(os.path.join(_OUT, "terrain.png"),
                    _to_u8(_center_crop(shade, 512)))

    dem = np.load(os.path.join(mpl_data,
                               "jacksboro_fault_dem.npz"))["elevation"]
    imageio.imwrite(os.path.join(_OUT, "fault_dem.png"),
                    _to_u8(_center_crop(dem.astype(np.float64), 512)))


def _highpass(img, lmbda=5.0):
    from sporco_tpu.utils.signal import tikhonov_filter
    sl, sh = tikhonov_filter(img, lmbda)
    return np.asarray(sh)


def _train(shape, S, iters=60, lmbda=0.1):
    from sporco_tpu.parallel import consensus
    rng = np.random.default_rng(0)
    D0 = rng.standard_normal(shape).astype(np.float32)
    d = consensus.ConvBPDNDictLearn_Consensus(D0, S, lmbda=lmbda,
                                              max_iter=iters,
                                              dtype=np.float32)
    d.solve()
    return np.asarray(d.getdict()).astype(np.float32)


def build_dicts():
    import imageio.v2 as imageio
    gray = []
    for f in ("portrait.png", "terrain.png", "fault_dem.png"):
        img = imageio.imread(os.path.join(_OUT, f))
        img = img.astype(np.float32) / 255.0
        if img.ndim == 3:
            img = img @ np.array([0.299, 0.587, 0.114], np.float32)
        gray.append(img)
    # 16 training patches of 128^2 across the three images
    patches = []
    rng = np.random.default_rng(1)
    for _ in range(16):
        img = gray[rng.integers(len(gray))]
        r = rng.integers(img.shape[0] - 128)
        c = rng.integers(img.shape[1] - 128)
        patches.append(_highpass(img[r:r + 128, c:c + 128]))
    S = np.stack(patches, axis=-1).astype(np.float32)

    out = {}
    for key, shape in [("G:8x8x32", (8, 8, 32)),
                       ("G:8x8x64", (8, 8, 64)),
                       ("G:12x12x36", (12, 12, 36))]:
        print("training", key, flush=True)
        out[key] = _train(shape, S)

    # colour dictionary on RGB portrait patches
    import imageio.v2 as iio
    rgb = iio.imread(os.path.join(_OUT, "portrait.png")) \
        .astype(np.float32) / 255.0
    pr = []
    for _ in range(8):
        r = rng.integers(rgb.shape[0] - 128)
        c = rng.integers(rgb.shape[1] - 128)
        pr.append(_highpass(rgb[r:r + 128, c:c + 128]))
    Sc = np.stack(pr, axis=-1)                         # (N, N, C, K)
    print("training RGB:8x8x3x64", flush=True)
    from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
    rngd = np.random.default_rng(0)
    D0 = rngd.standard_normal((8, 8, 3, 64)).astype(np.float32)
    d = ConvBPDNDictLearn(D0, Sc, lmbda=0.1, max_iter=40,
                          dtype=np.float32)
    d.solve()
    out["RGB:8x8x3x64"] = np.asarray(d.getdict()).astype(np.float32)

    # multi-scale dictionary (three supports in one representation)
    print("training G:4x4x8,8x8x12,12x12x16", flush=True)
    from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
    dsz = ((4, 4, 8), (8, 8, 12), (12, 12, 16))
    D0m = np.random.default_rng(1).standard_normal(
        (12, 12, 36)).astype(np.float32)
    dm = ConvBPDNDictLearn(D0m, S[..., :8], lmbda=0.1, max_iter=40,
                           dtype=np.float32, dsz=dsz)
    dm.solve()
    out["G:4x4x8,8x8x12,12x12x16"] = \
        np.asarray(dm.getdict()).astype(np.float32)

    np.savez(os.path.join(_OUT, "convdict.npz"), **out)
    print("wrote", os.path.join(_OUT, "convdict.npz"))


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(_HERE, ".."))
    build_images()
    build_dicts()
