"""Native C++ library tests (skipped when the .so is not built)."""
import numpy as np
import pytest

from gpquad import native

from .test_nufft import dense_F

if not native.available() and not native.build():
    pytest.skip("native library unavailable and build failed",
                allow_module_level=True)


def test_direct_nufft_oracles_match_dense(rng):
    n, mtot, h = 500, 11, 0.37
    x = rng.uniform(-3, 3, (n, 2))
    v = rng.normal(size=n) + 1j * rng.normal(size=n)
    F = dense_F(x, h, mtot)
    got1 = native.direct_nufft1_2d(x, v, h, mtot)
    want1 = (F.conj().T @ v).reshape(mtot, mtot)
    assert np.abs(got1 - want1).max() < 1e-11 * np.abs(want1).max()
    f = rng.normal(size=mtot * mtot) + 1j * rng.normal(size=mtot * mtot)
    got2 = native.direct_nufft2_2d(x, f, h, mtot)
    assert np.abs(got2 - F @ f).max() < 1e-11 * np.abs(F @ f).max()


def test_native_oracle_validates_jax_path(rng):
    """The independent C++ oracle agrees with the JAX MXU path."""
    import jax.numpy as jnp
    from gpquad.ops.nufft import make_nufft
    n, mtot, h = 400, 9, 0.3
    x = rng.uniform(-1, 1, (n, 2))
    v = rng.normal(size=n)
    op = make_nufft(jnp.asarray(x), h, mtot)
    got = np.asarray(op.type1(jnp.asarray(v, dtype=jnp.complex128)
                              if op.phases[0].dtype == jnp.complex128
                              else jnp.asarray(v)))
    want = native.direct_nufft1_2d(x, v.astype(complex), h, mtot)
    assert np.abs(got - want).max() < 1e-8 * np.abs(want).max()


def test_bin_sort(rng):
    n = 5000
    x = rng.uniform(0, 4, (n, 2))
    perm, starts = native.bin_sort_2d(x, lo=(0, 0), bin_size=(1, 1),
                                      nbins=(4, 4))
    assert sorted(perm.tolist()) == list(range(n))
    assert starts[0] == 0 and starts[-1] == n
    xb = x[perm]
    for b0 in range(4):
        for b1 in range(4):
            seg = xb[starts[b0 * 4 + b1]:starts[b0 * 4 + b1 + 1]]
            if len(seg):
                assert np.all((seg[:, 0] >= b0 - 1e-12)
                              & (seg[:, 0] <= b0 + 1 + 1e-12))
                assert np.all((seg[:, 1] >= b1 - 1e-12)
                              & (seg[:, 1] <= b1 + 1 + 1e-12))
