import time
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.ops import prox as sp
from sporco_tpu.ops import fused_csc as fc

N, Nd, M, K = 128, 8, 32, 40
rng = np.random.default_rng(0)
S = jnp.asarray(rng.standard_normal((K, 1, 1, N, N)).astype(np.float32))
ZY = jnp.asarray(rng.standard_normal((K, 1, M, N, N)).astype(np.float32) * .01)
ZU = jnp.asarray(rng.standard_normal((K, 1, M, N, N)).astype(np.float32) * .01)
D = jnp.asarray(rng.standard_normal((M, Nd, Nd)).astype(np.float32))
axes = (-2, -1)
ITERS = 50

def timeit(name, fn, *args):
    f = jax.jit(fn)
    o = f(*args); jax.block_until_ready(o)
    float(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[0])
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        o = f(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[0])
        best = min(best, time.time() - t0)
    print(f"{name:40s} {best/ITERS*1e3:7.3f} ms/iter")

def loop(body):
    def run(args):
        def b(i, c):
            return body(i, c)
        return lax.fori_loop(0, ITERS, b, args)
    return run

# (a) Zf big M-channel FFT round trip
def fft_pair(i, c):
    Z, = c
    Zf = sf.rfftn(Z, axes=axes)
    Z2 = sf.irfftn(Zf * (1.0 + 1e-12 * i), s=(N, N), axes=axes)
    return (Z2,)
timeit("Zf M-chan fft pair (84MB)", loop(fft_pair), (ZY,))

# (b) csc stage (fused_x path as in consensus body)
Wf, Wa, js = fc.xstep_kernels(D, Nd, Nd, fc.PS)
def csc_stage(i, c):
    ZY, ZU = c
    Df = sf.rfftn(D, s=(N, N), axes=axes)
    DHD0 = jnp.sum((Df * jnp.conj(Df)).real, axis=0)
    Sf1 = sf.rfftn(S[:, 0, 0], axes=axes)
    rho_x = 2.0 + 1e-12 * i
    Pyu = fc.pack_state((ZY - ZU).reshape(K, 1, M, N, N))
    Zxp, _, _, _, _ = fc.spatial_xstep(
        Pyu, Wf, Wa, js, DHD0, jnp.real(Sf1), jnp.imag(Sf1), rho_x, 1.0,
        (N, N), lax.Precision.HIGH)
    Zx = fc.unpack_state(Zxp, M).reshape(ZY.shape)
    AX = 1.8 * Zx - 0.8 * ZY
    ZYn = sp.prox_l1(AX + ZU, 0.01)
    ZUn = ZU + AX - ZYn
    return (ZYn, ZUn)
timeit("csc stage (spatial_xstep + tail)", loop(csc_stage), (ZY, ZU))

# (c) d-step freq-domain (current)
DY0 = jnp.asarray(rng.standard_normal((1, 1, M, N, N)).astype(np.float32) * .01)
DUfr = jnp.zeros((K, 1, M, N, N // 2 + 1), jnp.float32)
DUfi = jnp.zeros_like(DUfr)
def dstep(i, c):
    ZY, DY, DUfr, DUfi = c
    Sf = sf.rfftn(S, axes=axes)
    rho_d = 40.0
    DUf = DUfr + 1j * DUfi
    Dyf = sf.rfftn(DY, axes=axes)
    Zf = sf.rfftn(ZY, axes=axes)
    ZSf = jnp.conj(Zf) * Sf
    bD = ZSf + rho_d * (Dyf - DUf)
    DXf = sl.solvedbi_sm(Zf, rho_d, bD, axis=2)
    DAXf = 1.8 * DXf - 0.8 * Dyf
    Dmean = sf.irfftn(jnp.mean(DAXf + DUf, axis=0, keepdims=True),
                      s=(N, N), axes=axes)
    DYn = Dmean / (1.0 + 1e-12 * i)
    DUfn = DUf + DAXf - sf.rfftn(DYn, axes=axes)
    return (ZY, DYn, jnp.real(DUfn), jnp.imag(DUfn))
timeit("d-step freq (incl Zf fft)", loop(dstep), (ZY, DY0, DUfr, DUfi))
