"""Measure the reference implementation (CPU, numpy FFT) on every
benchmark config of ``bench.py all``, writing per-config
iterations/second into ``bench_ref.json`` so each ``bench_all.json``
row can report ``vs_baseline``.

Problem data matches ``bench.py``'s generators exactly (same seeds,
sizes, regularisation).  The reference is run at a truncated iteration
count per config (its per-iteration cost is iteration-independent for
all of these solvers) -- full convergence of e.g. the 512x512x64
ConvBPDN takes ~7 minutes of CPU per *measurement* otherwise.

Reference entry points: sporco/admm/bpdn.py:271, tvl2.py:27,
rpca.py:23, sporco/pgm/cbpdn.py:29, sporco/dictlrn/prlcnscdl.py:275.

Usage: ``python bench_cpuref.py [config ...]`` (default: all).
"""

import json
import multiprocessing
import os
import sys
import time
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF_FILE = os.path.join(_HERE, "bench_ref.json")


def _setup_reference_path():
    import bench
    bench._ensure_shims()
    sys.path.insert(0, "/tmp/shims")
    sys.path.insert(1, "/root/reference")
    warnings.filterwarnings("ignore")


def _time_solve(b, n_iter):
    t0 = time.time()
    b.solve()
    return n_iter / (time.time() - t0)


def bpdn():
    from sporco.admm import bpdn as r
    rng = np.random.default_rng(0)
    N, M = 512, 512
    D = rng.standard_normal((N, M)).astype(np.float32)
    x0 = np.zeros((M, 1), np.float32)
    x0[rng.choice(M, 32, replace=False)] = rng.standard_normal((32, 1))
    S = D @ x0
    n = 50
    opt = r.BPDN.Options({'Verbose': False, 'MaxMainIter': n,
                          'RelStopTol': 0.0})
    return {"iters_per_s": _time_solve(r.BPDN(D, S, 1e-2, opt), n),
            "n_iter_measured": n}


def bpdn_batch():
    from sporco.admm import bpdn as r
    rng = np.random.default_rng(0)
    N, M, K = 512, 512, 256
    D = rng.standard_normal((N, M)).astype(np.float32)
    x0 = np.zeros((M, K), np.float32)
    for k in range(K):
        x0[rng.choice(M, 32, replace=False), k] = \
            rng.standard_normal(32)
    S = (D @ x0).astype(np.float32)
    n = 50
    opt = r.BPDN.Options({'Verbose': False, 'MaxMainIter': n,
                          'RelStopTol': 0.0})
    return {"iters_per_s": _time_solve(r.BPDN(D, S, 1e-2, opt), n),
            "n_iter_measured": n, "K": K}


def tvl2():
    from sporco.admm import tvl2 as r
    rng = np.random.default_rng(0)
    N = 256
    img = np.zeros((N, N), np.float32)
    img[N // 4:3 * N // 4, N // 4:3 * N // 4] = 1.0
    S = img + 0.1 * rng.standard_normal((N, N)).astype(np.float32)
    n = 50
    opt = r.TVL2Denoise.Options({'Verbose': False, 'MaxMainIter': n,
                                 'RelStopTol': 0.0})
    return {"iters_per_s": _time_solve(r.TVL2Denoise(S, 0.05, opt), n),
            "n_iter_measured": n}


def rpca():
    from sporco.admm import rpca as r
    rng = np.random.default_rng(0)
    N, rk = 512, 8
    L = (rng.standard_normal((N, rk)) @ rng.standard_normal((rk, N)))
    Ssp = (rng.random((N, N)) > 0.9) * rng.standard_normal((N, N)) * 5
    S = (L + Ssp).astype(np.float32)
    n = 20
    opt = r.RobustPCA.Options({'Verbose': False, 'MaxMainIter': n,
                               'RelStopTol': 0.0})
    return {"iters_per_s": _time_solve(r.RobustPCA(S, None, opt), n),
            "n_iter_measured": n}


def _headline():
    import bench
    return bench._headline_problem()


def pgm():
    from sporco.pgm import cbpdn as r
    D, S, lmbda = _headline()
    n = 5
    opt = r.ConvBPDN.Options({'Verbose': False, 'MaxMainIter': n,
                              'L': 100.0})
    return {"iters_per_s": _time_solve(r.ConvBPDN(D, S, lmbda, opt), n),
            "n_iter_measured": n}


def cdlcns(K=40, n=5):
    from sporco.dictlrn import prlcnscdl as r
    rng = np.random.default_rng(0)
    N, Nd, M = 128, 8, 32
    S = rng.standard_normal((N, N, K)).astype(np.float32)
    D0 = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
    opt = r.ConvBPDNDictLearn_Consensus.Options(
        {'Verbose': False, 'MaxMainIter': n})
    nproc = min(K, multiprocessing.cpu_count())
    b = r.ConvBPDNDictLearn_Consensus(D0, S, lmbda=0.1, opt=opt,
                                      nproc=nproc)
    out = {"iters_per_s": _time_solve(b, n), "n_iter_measured": n,
           "nproc": nproc}
    return out


def cdlcns_scaling():
    # the weak-scaling single-device baseline uses 8 images
    return cdlcns(K=8, n=10)


def cbpdn_clr():
    from sporco.admm import cbpdn as r
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(0)
    N, Nd, M = 512, 8, 64
    D = rng.standard_normal((Nd, Nd, 3, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=(0, 1, 2), keepdims=True))
    S = np.stack([gaussian_filter(rng.standard_normal((N, N)), 8.0) * 5
                  + 0.1 * rng.standard_normal((N, N))
                  for _ in range(3)], axis=-1).astype(np.float32)
    n = 3
    opt = r.ConvBPDN.Options({'Verbose': False, 'MaxMainIter': n,
                              'RelStopTol': 0.0})
    b = r.ConvBPDN(D, S, 0.05, opt, dimK=0)
    return {"iters_per_s": _time_solve(b, n), "n_iter_measured": n}


def cbpdn_batch():
    from sporco.admm import cbpdn as r
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(0)
    N, Nd, M, K = 512, 8, 64, 8
    D = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=(0, 1), keepdims=True))
    S = np.stack([gaussian_filter(rng.standard_normal((N, N)), 8.0) * 5
                  + 0.1 * rng.standard_normal((N, N))
                  for _ in range(K)], axis=-1).astype(np.float32)
    n = 3
    opt = r.ConvBPDN.Options({'Verbose': False, 'MaxMainIter': n,
                              'RelStopTol': 0.0})
    b = r.ConvBPDN(D, S, 0.05, opt)
    ips = _time_solve(b, n)
    # images/s to tolerance uses the iteration count the stopping rule
    # needs (same algorithm/tolerance as the TPU run; bench.py supplies
    # its measured count when computing vs_baseline)
    return {"iters_per_s": ips, "n_iter_measured": n, "K": K}


CONFIGS = {"bpdn": bpdn, "bpdn_batch": bpdn_batch,
           "tvl2": tvl2, "rpca": rpca, "pgm": pgm,
           "cdlcns": cdlcns, "cdlcns_scaling": cdlcns_scaling,
           "cbpdn_batch": cbpdn_batch, "cbpdn_clr": cbpdn_clr}


def main():
    _setup_reference_path()
    names = sys.argv[1:] or list(CONFIGS)
    try:
        with open(_REF_FILE) as f:
            ref = json.load(f)
    except Exception:
        ref = {}
    cfgs = ref.setdefault("configs", {})
    for name in names:
        t0 = time.time()
        res = CONFIGS[name]()
        res["measured_at"] = time.strftime("%Y-%m-%d")
        cfgs[name] = res
        print(json.dumps({name: res, "wall_s": round(time.time() - t0, 1)}),
              flush=True)
        with open(_REF_FILE, "w") as f:
            json.dump(ref, f, indent=1)
    print("wrote", _REF_FILE)


if __name__ == "__main__":
    main()
