import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.ops import linalg


class TestSMSolvers:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def _rand_c(self, shape):
        return (self.rng.standard_normal(shape)
                + 1j * self.rng.standard_normal(shape))

    def test_inner(self):
        x = self.rng.standard_normal((3, 4, 5))
        y = self.rng.standard_normal((3, 4, 5))
        r = np.asarray(linalg.inner(jnp.array(x), jnp.array(y), axis=1))
        assert np.allclose(r, np.sum(x * y, axis=1, keepdims=True))

    def test_dot(self):
        a = self.rng.standard_normal((4, 3))
        b = self.rng.standard_normal((2, 3, 5))
        r = np.asarray(linalg.dot(jnp.array(a), jnp.array(b), axis=1))
        ref = np.einsum("ij,kjl->kil", a, b)
        assert np.allclose(r, ref)

    def test_solvedbi_sm(self):
        # per-pixel rank-1 systems: (rho I + a a^H) x = b, a = conj(ah)
        N, M = 7, 5
        rho = 0.4
        ah = self._rand_c((N, M))
        b = self._rand_c((N, M))
        x = np.asarray(linalg.solvedbi_sm(jnp.array(ah), rho, jnp.array(b),
                                          axis=-1))
        for n in range(N):
            A = rho * np.eye(M) + np.outer(np.conj(ah[n]), ah[n])
            assert np.allclose(A @ x[n], b[n], atol=1e-10)

    def test_solvedbi_sm_cache(self):
        ah = self._rand_c((4, 6))
        b = self._rand_c((4, 6))
        rho = 1.3
        c = linalg.solvedbi_sm_c(jnp.array(ah), jnp.conj(jnp.array(ah)),
                                 rho, axis=-1)
        x1 = np.asarray(linalg.solvedbi_sm(jnp.array(ah), rho, jnp.array(b),
                                           c=c, axis=-1))
        x2 = np.asarray(linalg.solvedbi_sm(jnp.array(ah), rho, jnp.array(b),
                                           axis=-1))
        assert np.allclose(x1, x2)

    def test_solvedbd_sm(self):
        N, M = 6, 4
        ah = self._rand_c((N, M))
        b = self._rand_c((N, M))
        d = self.rng.uniform(0.5, 2.0, (N, M))
        x = np.asarray(linalg.solvedbd_sm(jnp.array(ah), jnp.array(d),
                                          jnp.array(b), axis=-1))
        for n in range(N):
            A = np.diag(d[n]) + np.outer(np.conj(ah[n]), ah[n])
            assert np.allclose(A @ x[n], b[n], atol=1e-10)

    def _mdbi_ref(self, ah, rho, b):
        # dense solve of (rho I + sum_k a_k a_k^H) x = b per pixel
        N, K, M = ah.shape
        x = np.zeros((N, 1, M), dtype=complex)
        for n in range(N):
            A = rho * np.eye(M, dtype=complex)
            for k in range(K):
                A += np.outer(np.conj(ah[n, k]), ah[n, k])
            x[n, 0] = np.linalg.solve(A, b[n, 0])
        return x

    def test_solvemdbi_ism(self):
        N, K, M = 5, 3, 4
        rho = 0.7
        ah = self._rand_c((N, K, M))
        b = self._rand_c((N, 1, M))
        x = np.asarray(linalg.solvemdbi_ism(jnp.array(ah), rho,
                                            jnp.array(b), axisM=-1,
                                            axisK=-2))
        assert np.allclose(x, self._mdbi_ref(ah, rho, b), atol=1e-8)

    def test_solvemdbi_rsm(self):
        N, K, M = 5, 3, 4
        rho = 0.7
        ah = self._rand_c((N, K, M))
        b = self._rand_c((N, M))
        x = np.asarray(linalg.solvemdbi_rsm(jnp.array(ah), rho,
                                            jnp.array(b), axisK=-2))
        ref = self._mdbi_ref(ah, rho, b[:, None, :])[:, 0]
        assert np.allclose(x, ref, atol=1e-8)

    def test_solvemdbi_cg(self):
        N, K, M = 5, 3, 4
        rho = 0.7
        ah = self._rand_c((N, K, M))
        b = self._rand_c((N, 1, M))
        x, it = linalg.solvemdbi_cg(jnp.array(ah), rho, jnp.array(b),
                                    axisM=-1, axisK=-2, tol=1e-12,
                                    max_iter=500)
        assert np.allclose(np.asarray(x), self._mdbi_ref(ah, rho, b),
                           atol=1e-6)


class TestGramSolvers:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def _check_atai(self, n, m):
        A = jnp.array(self.rng.standard_normal((n, m)))
        b = jnp.array(self.rng.standard_normal((m, 3)))
        rho = 0.3
        f = linalg.gram_eig_factor(A)
        x = np.asarray(linalg.gram_solve_atai(f, rho, b))
        ref = np.linalg.solve(np.asarray(A).T @ np.asarray(A)
                              + rho * np.eye(m), np.asarray(b))
        assert np.allclose(x, ref, atol=1e-8)

    def _check_aati(self, n, m):
        A = jnp.array(self.rng.standard_normal((n, m)))
        b = jnp.array(self.rng.standard_normal((3, n)))
        rho = 0.3
        f = linalg.gram_eig_factor(A)
        x = np.asarray(linalg.gram_solve_aati(f, rho, b))
        ref = np.asarray(b) @ np.linalg.inv(
            np.asarray(A) @ np.asarray(A).T + rho * np.eye(n))
        assert np.allclose(x, ref, atol=1e-8)

    def test_gram_atai_tall(self):
        self._check_atai(16, 8)

    def test_gram_atai_wide(self):
        self._check_atai(8, 16)

    def test_gram_aati_tall(self):
        self._check_aati(16, 8)

    def test_gram_aati_wide(self):
        self._check_aati(8, 16)

    def test_gram_rho_change_no_refactor(self):
        # the whole point: one factor serves every rho
        A = jnp.array(self.rng.standard_normal((12, 6)))
        f = linalg.gram_eig_factor(A)
        for rho in [0.01, 1.0, 100.0]:
            b = jnp.array(self.rng.standard_normal((6, 1)))
            x = np.asarray(linalg.gram_solve_atai(f, rho, b))
            ref = np.linalg.solve(np.asarray(A).T @ np.asarray(A)
                                  + rho * np.eye(6), np.asarray(b))
            assert np.allclose(x, ref, atol=1e-8)

    def test_cho_wrappers(self):
        for (n, m) in [(16, 8), (8, 16)]:
            A = jnp.array(self.rng.standard_normal((n, m)))
            b = jnp.array(self.rng.standard_normal((m, 2)))
            rho = 0.5
            c, _ = linalg.cho_factor(A, rho)
            x = np.asarray(linalg.cho_solve_ATAI(A, rho, b, c))
            ref = np.linalg.solve(np.asarray(A).T @ np.asarray(A)
                                  + rho * np.eye(m), np.asarray(b))
            assert np.allclose(x, ref, atol=1e-8)

    def test_lu_wrappers(self):
        for (n, m) in [(16, 8), (8, 16)]:
            A = jnp.array(self.rng.standard_normal((n, m)))
            b = jnp.array(self.rng.standard_normal((2, n)))
            rho = 0.5
            lp = linalg.lu_factor(A, rho)
            x = np.asarray(linalg.lu_solve_AATI(A, rho, b, lp))
            ref = np.asarray(b) @ np.linalg.inv(
                np.asarray(A) @ np.asarray(A).T + rho * np.eye(n))
            assert np.allclose(x, ref, atol=1e-8)


class TestMisc:

    def setup_method(self):
        self.rng = np.random.default_rng(12345)

    def test_rrs(self):
        assert float(linalg.rrs(jnp.ones(4), jnp.ones(4))) == 0.0
        r = float(linalg.rrs(jnp.ones(4), 2 * jnp.ones(4)))
        assert np.allclose(r, 0.5)

    def test_valid_adjoint(self):
        A = jnp.array(self.rng.standard_normal((6, 4)))
        ok = linalg.valid_adjoint(lambda x: A @ x, lambda y: A.T @ y,
                                  (4,), (6,), eps=1e-10)
        assert bool(ok)
        bad = linalg.valid_adjoint(lambda x: A @ x, lambda y: 2 * A.T @ y,
                                   (4,), (6,), eps=1e-10)
        assert not bool(bad)

    def test_block_circulant(self):
        blocks = [self.rng.standard_normal((2, 2)) for _ in range(3)]
        B = np.asarray(linalg.block_circulant(blocks))
        assert B.shape == (6, 6)
        assert np.allclose(B[0:2, 0:2], blocks[0])
        assert np.allclose(B[2:4, 0:2], blocks[1])
        assert np.allclose(B[0:2, 2:4], blocks[2])

    def test_sylvester(self):
        A = self.rng.standard_normal((4, 4))
        A = A + A.T
        B = self.rng.standard_normal((3, 3))
        B = B + B.T
        C = self.rng.standard_normal((4, 3))
        alpha = 10.0
        X = np.asarray(linalg.solve_symmetric_sylvester(
            jnp.array(A), jnp.array(B), jnp.array(C), alpha))
        assert np.allclose(A @ X @ B + alpha * X, C, atol=1e-8)

    def test_nkp(self):
        B0 = self.rng.standard_normal((3, 2))
        C0 = self.rng.standard_normal((4, 5))
        A = np.kron(B0, C0)
        B, C = linalg.nkp(jnp.array(A), (3, 2), (4, 5))
        assert np.allclose(np.kron(np.asarray(B), np.asarray(C)), A,
                           atol=1e-8)

    def test_kpsvd(self):
        A = self.rng.standard_normal((12, 10))
        S, B, C = linalg.kpsvd(jnp.array(A), (3, 2), (4, 5))
        rec = sum(float(S[k]) * np.kron(np.asarray(B[..., k]),
                                        np.asarray(C[..., k]))
                  for k in range(len(np.asarray(S))))
        assert np.allclose(rec, A, atol=1e-8)

    def test_pca(self):
        u = self.rng.standard_normal((5, 100))
        Bm, S, C = linalg.pca(jnp.array(u), centre=False)
        # basis columns orthonormal, eigenvalues descending
        assert np.allclose(np.asarray(Bm).T @ np.asarray(Bm), np.eye(5),
                           atol=1e-8)
        s = np.asarray(S)
        assert np.all(np.diff(s) <= 1e-12)
